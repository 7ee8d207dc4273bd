package graft.datapipe

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deduplication operators for training-data pipelines:
  * exact (hash-groupBy), MinHash+LSH, SimHash, n-gram Jaccard.
  *
  * Scale notes (100 TB): exact dedup is one shuffle on a 16-byte hash (group
  * keys are tiny regardless of document size — project the hash FIRST so the
  * shuffle moves hashes + ids, never text). MinHash/SimHash candidate
  * generation shuffles on (band, bucket) keys whose fan-in is bounded by design
  * (band width trades recall vs bucket size); verification joins only candidate
  * pairs — quadratic blowup is confined to within-bucket pairs, and buckets are
  * capped (maxBucket) to guard against degenerate hot buckets.
  */
object Dedup {

  // ---------- exact ----------

  /** Exact duplicate groups by content fingerprint. Returns one row per
    * duplicated fingerprint: (fp, dup_count, keep_id = min id). */
  def exactDuplicates(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"), TextQuality.fingerprint(col(textCol)).as("fp"))
      .groupBy("fp")
      .agg(count(lit(1)).as("dup_count"), min("id").as("keep_id"))
      .filter(col("dup_count") > 1)

  /** Keep exactly one representative per fingerprint (min id wins). */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    exactDedupBy(df, idCol, TextQuality.fingerprint(col(textCol)))

  /** Keep-one dedup over an arbitrary fingerprint expression. */
  def exactDedupBy(df: DataFrame, idCol: String, fp: Column): DataFrame = {
    val w = Window.partitionBy(fp).orderBy(col(idCol))
    df.withColumn("rk", row_number().over(w)).filter(col("rk") === 1).drop("rk")
  }

  // ---------- incremental ingest dedup ----------

  /** Incremental ingest dedup — the production shape at 10^12 docs: the
    * corpus is NEVER re-deduped; each ingest batch is admitted against the
    * historical FINGERPRINT store (hashes only, never text). A batch row is
    * admitted iff its fingerprint is (a) first within the batch (min id
    * wins) and (b) absent from `history`. Returns the admitted rows with
    * their `fp` column — exactly the delta to append back to the store, so
    * per-batch cost is O(batch) regardless of corpus size.
    *
    * Scale: the keep-one window shuffles (fp, id, row) per BATCH row only;
    * the anti-join is fp-equi — keep the fingerprint store bucketed on fp
    * (TableFormat) so the sort-merge co-locates without re-shuffling
    * history, or let AQE broadcast the batch side (the small side of an
    * ingest by construction). Composes with the snapshot log: admitted fps
    * append as one new dir per epoch (`Snapshots.commit`). */
  def incrementalDedup(history: DataFrame, batch: DataFrame,
                       idCol: String, fp: Column): DataFrame =
    exactDedupBy(batch.withColumn("fp", fp), idCol, col("fp"))
      .join(history.select(col("fp")).distinct(), Seq("fp"), "left_anti")

  // ---------- winnowing fingerprints (MOSS) ----------

  /** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003
    * §3, the MOSS algorithm): hash every token k-gram, slide a w-wide
    * window over the hash sequence, keep each window's MINIMUM hash
    * (rightmost occurrence on ties), emit the distinct (hash, pos)
    * selections. The winnowing guarantee: any shared run of ≥ w+k-1 tokens
    * yields at least one IDENTICAL selected fingerprint in both documents,
    * while only ~2/(w+1) of all grams are kept — so the partial-overlap
    * index at 10^12 docs is w-fold smaller than an all-grams posting list
    * and the cross-doc join runs on the winnowed set only.
    *
    * Scale: the whole selection is computed PER ROW with Catalyst HOFs —
    * gram hashes become an array attribute, each window's rightmost-min is
    * an `aggregate` over a w-slice of that array — so the gram stream NEVER
    * shuffles (the first Spark cut used Window.partitionBy(doc), which
    * exchanged+sorted every gram row; this form cut d_winnow 3.7 s → narrow
    * scan at sf0.1). Only the winnowed selections (3 longs/row, adjacent
    * duplicates collapsed map-side by the distinct's partial aggregate)
    * reach an exchange. The gram hash is the same md5-fold 48-bit hash as
    * the LSH family — pure Catalyst, DuckDB-replayable. Docs with < w+k-1
    * tokens emit nothing (no full window exists). */
  def winnowFingerprints(df: DataFrame, idCol: String, textCol: String,
                         k: Int = 3, w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1, s"need k, w >= 1, got k=$k w=$w")
    val toks = s"filter(split(lower($textCol), '\\\\s+'), t -> t <> '')"
    // tokens and gram hashes are each PROJECTED to an attribute before the
    // lambda that consumes them (the repo's documented O(len²) Catalyst
    // trap: a lambda referencing the unprojected expression re-derives it
    // per element — see repetitionSignals)
    val hs = s"""transform(sequence(0, size(toks) - $k),
                |  i -> CAST(conv(substring(md5(concat_ws(' ', slice(toks, i + 1, $k))), 1, 12), 16, 10) AS BIGINT))""".stripMargin
    // per window end p: lexicographic min of (h, -pos) over positions
    // p-w+1..p — strictly-better update, so equal hashes keep the LATER
    // position (rightmost tie-break, identical to the MOSS rule)
    val sel =
      s"""transform(sequence(${w - 1}, size(hs) - 1),
         |  p -> aggregate(sequence(p - ${w - 1}, p),
         |         named_struct('h', CAST(9223372036854775807 AS BIGINT), 'np', 1),
         |         (acc, i) -> IF(element_at(hs, i + 1) < acc.h
         |                        OR (element_at(hs, i + 1) = acc.h AND -i < acc.np),
         |                        named_struct('h', element_at(hs, i + 1), 'np', -i),
         |                        acc)))""".stripMargin
    df.selectExpr(idCol, s"$toks AS toks")
      .filter(s"size(toks) >= ${w + k - 1}")
      .selectExpr(idCol, s"$hs AS hs")
      .selectExpr(idCol, s"explode($sel) AS sel")
      .select(col(idCol), col("sel.h").as("fp_hash"), (-col("sel.np")).as("fp_pos"))
      .distinct()
  }

  /** Winnow overlap-pair detection — the workflow the fingerprint index
    * exists for (Schleimer, Wilkerson & Aiken 2003 §4, the MOSS use): join
    * the winnowed selections across documents on the fingerprint HASH,
    * count shared fingerprints per ordered pair, keep pairs sharing at
    * least `minShared`. Every shared selected fingerprint certifies an
    * identical k-gram in both documents (it IS the content hash of that
    * gram), and the winnowing guarantee lifts that to runs: any shared
    * token run of ≥ w+k-1 produces at least one shared selection — so
    * `n_shared_fps` is a verified lower bound on the documents' shared-run
    * structure, and ranking by it is exactly MOSS's report order.
    *
    * Scale: selections are ~2/(w+1) of the gram stream ([[winnowFingerprints]]
    * — per-row HOFs, the gram stream never shuffles); the join here runs on
    * the winnowed (id, hash) pairs only. Hot fingerprints (boilerplate
    * grams every doc shares) are CAPPED at `maxBucket` docs like every LSH
    * path — a stop-gram appearing in 10^9 docs would otherwise emit 10^18
    * pairs; dropping it loses no real pair because near-duplicate documents
    * share many rarer fingerprints too (and `minShared` demands them). The
    * pair aggregate shuffles (id, id) pairs from qualifying buckets only. */
  def winnowOverlapPairs(df: DataFrame, idCol: String, textCol: String,
                         k: Int = 3, w: Int = 4, maxBucket: Int = 64,
                         minShared: Int = 2): DataFrame = {
    val fps = winnowFingerprints(df, idCol, textCol, k, w)
      .select(col(idCol).as("id"), col("fp_hash"))
      .distinct() // a hash selected at several positions is ONE shared gram
      .localCheckpoint(false) // two-pass bucketing reads the selections twice
    val buckets = boundedBuckets(fps, Seq("fp_hash"), maxBucket)
      .agg(collect_list("id").as("ids"))
    bucketPairRows(buckets, "ids")
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_shared_fps"))
      .filter(col("n_shared_fps") >= minShared)
  }

  // ---------- shingling + MinHash ----------

  /** Tokenization shared by every shingling op: lowercase, whitespace split,
    * drop empties. */
  private[datapipe] def shingleToks(text: String): Array[String] =
    if (text == null) Array.empty[String]
    else text.toLowerCase.split("\\s+").filter(_.nonEmpty)

  /** Word n-gram shingle STRINGS of normalized text (distinct). Fewer than n
    * tokens → the whole joined text as one shingle; no tokens → empty. */
  private[datapipe] def shingleStrings(text: String, n: Int): Array[String] = {
    val toks = shingleToks(text)
    if (toks.length < n) {
      if (toks.isEmpty) Array.empty[String] else Array(toks.mkString(" "))
    } else
      (0 to toks.length - n).map(i => toks.slice(i, i + n).mkString(" ")).toArray.distinct
  }

  /** 48-bit universal shingle/token hash: the first 6 md5 bytes (= first 12
    * hex chars). Chosen over a bespoke 64-bit polynomial hash because every
    * engine speaks md5 — the DuckDB oracle recomputes the exact same values
    * with `md5(s)` + a hex fold, so MinHash/SimHash results are verifiable
    * end-to-end, and 48 bits keeps all downstream affine arithmetic inside
    * exact signed-64 range (no wraparound semantics to replicate). */
  def hash48(s: String): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) | ((d(2) & 0xffL) << 24) |
      ((d(3) & 0xffL) << 16) | ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
  }

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Word n-gram shingle hashes (48-bit) of normalized text. UDF: a single
    * pass over the tokens; output is the SMALL set of longs that all
    * downstream similarity ops run on (text never shuffles). */
  def shingleUdf(n: Int) = udf { (text: String) =>
    shingleStrings(text, n).map(hash48)
  }

  /** Delegates to the native expression's fold — ONE hash definition, so the
    * codegen'd PolyHash64 and the dedup operators cannot silently diverge. */
  def polyHash(s: String): Long = graft.functions.PolyHash64.hashString(s)

  /** MinHash signature of a shingle set: m affine permutations
    * h_i(x) = (a_i·x + b_i) mod 2^64 with odd a_i (a bijection on 64-bit
    * space — well-mixed minima; a small multiplier would leave the
    * permutations order-correlated and the estimator biased), minimum under
    * UNSIGNED comparison. The oracle replays the identical arithmetic: mod-2^64
    * products via 32-bit split multiplication in INT128, min over UBIGINT.
    * Empty input → all unsigned-max (callers exclude empty docs from banding).
    */
  def minhashUdf(m: Int, seed: Long = 42L) = {
    val coefs = minhashCoefs(m, seed)
    udf { (shingles: Seq[Long]) =>
      if (shingles == null || shingles.isEmpty) Array.fill(m)(-1L)
      else coefs.map { case (a, b) =>
        var mn = -1L // unsigned max
        for (s <- shingles) {
          val v = a * s + b // natural mod-2^64 overflow
          if (java.lang.Long.compareUnsigned(v, mn) < 0) mn = v
        }
        mn
      }
    }
  }

  /** Splitmix-seeded permutation coefficients: a odd 62-bit, b 63-bit — both
    * non-negative as signed longs so the aux parquet round-trips into DuckDB's
    * UBIGINT/HUGEINT arithmetic without sign reinterpretation. Dumped as an
    * aux parquet by Verify so the oracle replays the exact permutation family. */
  def minhashCoefs(m: Int, seed: Long = 42L): Array[(Long, Long)] = {
    var z = seed
    def next(): Long = {
      z += 0x9E3779B97F4A7C15L
      var x = z
      x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
      x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
      x ^ (x >>> 31)
    }
    Array.fill(m)(((next() & ((1L << 62) - 1)) | 1L, next() & ((1L << 63) - 1)))
  }

  /** Exact Jaccard of two shingle arrays (verification step). */
  val jaccardUdf = udf { (a: Seq[Long], b: Seq[Long]) =>
    if (a == null || b == null || a.isEmpty || b.isEmpty) 0.0
    else {
      val sa = a.toSet; val sb = b.toSet
      sa.intersect(sb).size.toDouble / sa.union(sb).size
    }
  }

  /** MinHash+LSH near-duplicate pairs.
    * bands × rowsPerBand = m; two docs collide if any band's row-slice matches.
    * Pipeline: shingle → minhash → explode bands → groupBy (band, sig-slice)
    * bucket join → within-bucket pairs → exact-Jaccard verify ≥ threshold.
    * Returns (id_a, id_b, jaccard_bp) with id_a < id_b; jaccard_bp is exact
    * integer basis points (⌊10000·|∩|/|∪|⌋ — engine-stable, no float dust) and
    * the threshold compare is the exact integer inequality
    * |∩|·10000 ≥ bp·|∪|. Docs with no shingles are excluded (an empty doc is
    * not a near-duplicate of another empty doc).
    */
  def minhashNearDuplicates(
      df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, bands: Int = 8, rowsPerBand: Int = 4,
      threshold: Double = 0.7, maxBucket: Int = 64): DataFrame = {
    val m = bands * rowsPerBand
    val thresholdBp = math.round(threshold * 10000).toInt
    val sh = df.select(col(idCol).as("id"), shingleUdf(shingleN)(col(textCol)).as("shingles"))
      .filter(size(col("shingles")) > 0)
      .withColumn("sig", minhashUdf(m)(col("shingles")))
      .localCheckpoint(false) // shingles reused by verify; don't recompute
    val banded = sh.select(
      col("id"),
      posexplode(expr(s"transform(sequence(0, ${bands - 1}), b -> slice(sig, b * $rowsPerBand + 1, $rowsPerBand))")))
      .select(col("id"), col("pos").as("band"), col("col").as("slice"))
    // the band slice itself is the bucket key (arrays group fine; no extra
    // hash layer to replicate in the oracle)
    val buckets = boundedBuckets(banded, Seq("band", "slice"), maxBucket)
      .agg(collect_list("id").as("ids"))
    val pairs = bucketPairRows(buckets, "ids").distinct()
    pairs
      .join(sh.select(col("id").as("id_a"), col("shingles").as("sh_a")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("shingles").as("sh_b")), "id_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn("uni", size(array_union(col("sh_a"), col("sh_b"))).cast("long"))
      .filter(col("inter") * 10000L >= col("uni") * thresholdBp)
      .select(col("id_a"), col("id_b"), expr("inter * 10000 div uni").as("jaccard_bp"))
  }

  /** TWO-PASS bounded bucket build — the hot-key guard shared by every LSH
    * banding path (winnow / MinHash / Hamming): count members per bucket key
    * first (constant aggregation state per key, map-side combined — a
    * corpus-scale hot key is a few count rows per map task), keep only keys
    * with `[2, maxBucket]` members, then LEFT-SEMI join the member stream
    * against the surviving keys BEFORE any `collect_list`. The returned
    * [[org.apache.spark.sql.RelationalGroupedDataset]] is ready for the
    * caller's collect aggregate, whose per-key buffer is now ≤ maxBucket by
    * construction.
    *
    * Why not filter AFTER collect_list (the previous shape): the filter
    * bounds pair EMISSION but not aggregation STATE — a stop-gram
    * fingerprint shared by 10⁹ docs materializes the full membership array
    * in one aggregation buffer before the size filter drops it (the
    * sort-based fallback spills the build, but the finalized array row must
    * still assemble → executor OOM at corpus scale). Here hot-key member
    * rows never reach the collect exchange at all. Bucket membership is
    * IDENTICAL: count-per-key equals the old list size (members are distinct
    * per key upstream), so the surviving key set and their collected members
    * are row-for-row the same, and every downstream consumer sorts the
    * bucket, so collect order is immaterial. */
  private[datapipe] def boundedBuckets(members: DataFrame, keyCols: Seq[String],
                                       maxBucket: Int) = {
    val keep = members.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("_bb_n"))
      .filter(col("_bb_n").between(2, maxBucket))
      .select(keyCols.map(col): _*)
    members.join(keep, keyCols, "left_semi")
      .groupBy(keyCols.map(col): _*)
  }

  /** Within-bucket ordered pairs (id_a < id_b) as ROWS, pure Catalyst and
    * type-GENERIC over the id (long, string, …). The sorted bucket is
    * PROJECTED to a real attribute first, then two Generate stages
    * enumerate i<j: posexplode picks id_a, a slice-explode emits every
    * later element as id_b. Peak memory per bucket row is ONE O(k) slice —
    * never an O(k²) nested pair array — and the sort runs once per bucket.
    * (The previous single nested-transform expression inlined
    * `sort_array(ids)` at every element_at site, so Catalyst re-sorted the
    * bucket per PAIR — the same non-attribute re-evaluation trap
    * ngramShinglesFromToks documents; at maxBucket=512 that made
    * d_cosine_neardup 8× slower at sf0.1.) Bounded by the maxBucket cap
    * upstream. */
  private[datapipe] def bucketPairRows(buckets: DataFrame, idsCol: String): DataFrame =
    buckets.select(sort_array(col(idsCol)).as("_bp_sids"))
      .select(posexplode(col("_bp_sids")).as(Seq("_bp_i", "id_a")), col("_bp_sids"))
      .select(col("id_a"),
        explode(slice(col("_bp_sids"), col("_bp_i") + lit(2), size(col("_bp_sids")))).as("id_b"))

  /** Exact n-gram Jaccard for ALL pairs of a (small) candidate set — the
    * brute-force baseline the LSH path is validated against in tests. */
  def ngramJaccardAllPairs(df: DataFrame, idCol: String, textCol: String,
                           shingleN: Int = 3, threshold: Double = 0.0): DataFrame = {
    // exact integer threshold (inter·10000 ≥ bp·union) — identical boundary
    // semantics to minhashNearDuplicates' verify step, no rounding admission
    val thresholdBp = math.round(threshold * 10000).toInt
    val sh = df.select(col(idCol).as("id"), shingleUdf(shingleN)(col(textCol)).as("sh"))
    val a = sh.select(col("id").as("id_a"), col("sh").as("sh_a"))
    val b = sh.select(col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn("uni", size(array_union(col("sh_a"), col("sh_b"))).cast("long"))
      .filter(col("uni") > 0 && col("inter") * 10000L >= col("uni") * thresholdBp)
      .withColumn("jaccard", round(col("inter").cast("double") / col("uni"), 4))
      .select("id_a", "id_b", "jaccard")
  }

  // ---------- pure-Catalyst n-gram shingles (oracle-expressible variant) ----------

  /** Word n-gram shingle STRINGS as a Catalyst expression (codegen; the HOF
    * analog of shingleStrings) — used where the downstream math must be
    * SQL-replicable end-to-end (exact Jaccard over string sets). */
  def ngramShinglesCol(text: Column, n: Int): Column =
    ngramShinglesFromToks(filter(split(lower(text), "\\s+"), t => t =!= ""), n)

  /** Shingles over an already-tokenized column. PROJECT the tokens to a real
    * column before calling when the input is an expression: a non-attribute
    * `toks` is re-evaluated once per transform() index — O(len²) splits per
    * doc (measured 4× wall on the repetition op at sf0.1). */
  def ngramShinglesFromToks(toks: Column, n: Int): Column =
    when(size(toks) === 0, array().cast("array<string>"))
      .when(size(toks) < n, array(array_join(toks, " ")))
      .otherwise(array_distinct(
        transform(sequence(lit(0), size(toks) - n), i => array_join(slice(toks, i + 1, lit(n)), " "))))

  /** Catalyst analog of [[hash48]]: first 12 md5 hex chars as a 48-bit long.
    * Codegen'd (md5 + conv, no UDF boundary) and bit-identical to the UDF
    * path, so the DuckDB oracle's hex-fold replay covers both. */
  def hash48Col(s: Column): Column =
    conv(substring(md5(s), 1, 12), 16, 10).cast("long")

  /** Exact n-gram Jaccard pairs with integer basis-point output — fully
    * Catalyst (no UDF), fully SQL-replicable. String shingles are hashed to
    * 48-bit longs (hash48Col) BEFORE the all-pairs intersect: set sizes are
    * preserved (both engines hash identically, collisions deterministic), and
    * intersecting longs instead of strings halved this query's wall time at
    * sf0.1 (the round-2 string-array rewrite had regressed it 1.9×).
    * All-pairs by design: a bounded validation baseline, not the scale path. */
  def ngramJaccardPairsBp(df: DataFrame, idCol: String, textCol: String,
                          shingleN: Int, thresholdBp: Int): DataFrame = {
    // hashed shingle sets materialized ONCE (localCheckpoint, as in the
    // minhash path) — the self-join would otherwise recompute the md5 chain
    // on both sides; array_distinct after hashing so |a| is a true SET size
    val sh = df
      .select(col(idCol).as("id"),
        filter(split(lower(col(textCol)), "\\s+"), t => t =!= "").as("toks"))
      .select(col("id"),
        array_distinct(transform(ngramShinglesFromToks(col("toks"), shingleN), s => hash48Col(s))).as("sh"))
      .filter(size(col("sh")) > 0)
      .localCheckpoint(false)
    val a = sh.select(col("id").as("id_a"), col("sh").as("sh_a"), size(col("sh")).cast("long").as("na"))
    val b = sh.select(col("id").as("id_b"), col("sh").as("sh_b"), size(col("sh")).cast("long").as("nb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      // per-pair union never materialized: |a ∪ b| = |a| + |b| − |a ∩ b|
      .withColumn("uni", col("na") + col("nb") - col("inter"))
      .filter(col("inter") * 10000L >= col("uni") * thresholdBp)
      .select(col("id_a"), col("id_b"), expr("inter * 10000 div uni").as("jaccard_bp"))
  }

  // ---------- SimHash ----------

  /** 48-bit SimHash over md5-derived token hashes: sign-sum of per-token bit
    * vectors. 48 bits (hash48) keeps every intermediate SQL-replicable; docs
    * with no tokens hash to 0. */
  val simhashUdf = udf { (text: String) =>
    val toks = shingleToks(text)
    val acc = new Array[Int](48)
    for (t <- toks) {
      val h = hash48(t)
      var b = 0
      while (b < 48) { if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1; b += 1 }
    }
    var out = 0L
    var b = 0
    while (b < 48) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  val hammingUdf = udf { (a: Long, b: Long) => java.lang.Long.bitCount(a ^ b) }

  /** SimHash near-duplicates with Hamming distance ≤ maxDist, candidate
    * generation by banding the 48 bits into 4 × 12-bit chunks (any chunk equal
    * → candidate; guarantees recall for maxDist ≤ 3). Docs with no tokens are
    * excluded from candidate generation. */
  def simhashNearDuplicates(df: DataFrame, idCol: String, textCol: String,
                            maxDist: Int = 3, maxBucket: Int = 64): DataFrame =
    hamming48Pairs(
      df.filter(size(filter(split(lower(col(textCol)), "\\s+"), t => t =!= "")) > 0)
        .select(col(idCol).as("id"), simhashUdf(col(textCol)).as("sim")),
      maxDist, maxBucket)

  /** Hamming-banded near-duplicate pairs over ANY 48-bit signature table
    * `(id, sim)` — the candidate-generation + verify machinery shared by
    * text SimHash and media perceptual hashes ([[Multimodal]] aHash):
    * banding into 4 × 12-bit chunks (any chunk equal → candidate, recall
    * guaranteed for maxDist ≤ 3 by pigeonhole), capped buckets, exact
    * bit_count verify on the full signature. Returns (id_a, id_b, dist)
    * with id_a < id_b. */
  private[datapipe] def hamming48Pairs(sh: DataFrame,
                                       maxDist: Int, maxBucket: Int): DataFrame = {
    val banded = sh.select(col("id"), col("sim"),
      posexplode(expr("transform(sequence(0,3), b -> (sim >> (b*12)) & 4095)")))
      .select(col("id"), col("sim"), col("pos").as("band"), col("col").as("chunk"))
      // lazy cut: the two-pass bucketing below reads the banded stream twice,
      // and the upstream signature build (simhashUdf / media decode+aHash) is
      // the expensive part — it must run once, not once per pass
      .localCheckpoint(false)
    val buckets = boundedBuckets(banded, Seq("band", "chunk"), maxBucket)
      .agg(collect_list(struct(col("id"), col("sim"))).as("xs"))
    // ordered within-bucket pairs + Hamming distance, pure Catalyst (struct
    // sort_array orders by id first — generic over the id type, no UDF).
    // The sorted bucket is PROJECTED to an attribute and two Generate stages
    // enumerate i<j (posexplode → slice-explode), same shape as
    // bucketPairRows: the earlier single nested-transform expression inlined
    // sort_array at every element_at site, so Catalyst re-sorted the bucket
    // once per PAIR — O(k³ log k) work per bucket instead of O(k² + k log k).
    // Hamming distance is filtered BEFORE the dedup exchange so only
    // qualifying pairs shuffle.
    val pairs = buckets.select(sort_array(col("xs")).as("_sx"))
      .select(posexplode(col("_sx")).as(Seq("_i", "a")), col("_sx"))
      .select(col("a"),
        explode(slice(col("_sx"), col("_i") + lit(2), size(col("_sx")))).as("b"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.sim").bitwiseXOR(col("b.sim"))).as("dist"))
      .filter(col("dist") <= maxDist)
      .distinct()
    pairs
  }

  /** Fuzzy-dedup clustering — the full near-duplicate REMOVAL shape real
    * pipelines run (SlimPajama / NeMo-Curator style): LSH candidate pairs →
    * connected components → one representative per cluster. SimHash pairs
    * (cheap, banding-capped) feed the same pointer-jumped min-label CC loop the KG
    * canonicalizer uses; the component min is the kept doc. Output: one row
    * per CLUSTERED doc (cluster_size ≥ 2) — (doc_id, cluster_rep,
    * cluster_size); a caller drops rows where doc_id ≠ cluster_rep.
    * Scale: the CC iterates over the near-dup EDGE set (≪ corpus), each
    * iteration one small shuffle, lineage cut per iteration. */
  def nearDupClusters(spark: org.apache.spark.sql.SparkSession,
                      df: DataFrame, idCol: String, textCol: String,
                      maxDist: Int = 3, maxBucket: Int = 64): DataFrame = {
    // pairs materialized ONCE: connectedComponents symmetrizes via a
    // two-sided union of this frame — without the checkpoint the whole LSH
    // chain (tokenize → simhash → band → self-join) would execute twice
    val edges = simhashNearDuplicates(df, idCol, textCol, maxDist, maxBucket)
      .select(col("id_a").as("src"), col("id_b").as("dst"))
      .localCheckpoint(false)
    val comp = graft.kg.Canonicalize.connectedComponents(spark, edges)
    val sizes = comp.groupBy("component").agg(count(lit(1)).as("cluster_size"))
    comp.join(sizes, "component")
      .select(col("node").as("doc_id"), col("component").as("cluster_rep"),
        col("cluster_size"))
  }

  /** Cross-document duplicated n-grams — the corpus-level repetition signal
    * behind exact-substring dedup (Lee et al. 2021, "Deduplicating Training
    * Data Makes Language Models Better"): for each doc, how much of its
    * distinct n-gram set also occurs in other documents. Output:
    * (doc_id, n_grams, shared_grams, shared_bp) where shared = n-grams seen
    * in ≥ minDocs distinct docs; docs with no n-grams are excluded.
    *
    * Distributed shape: distinct (doc, 48-bit gram hash) pairs are
    * materialized ONCE (localCheckpoint — both sides of the frequency join
    * derive from them); the gram-frequency table is a groupBy on the hash
    * with map-side partial agg (the shuffle carries (long, count) rows, one
    * per distinct gram per partition, never text); the join back is a
    * long=long shuffle join. No step is quadratic in corpus size. */
  def crossDocDupNgrams(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 5, minDocs: Int = 2): DataFrame = {
    val sh = df
      .select(col(idCol).as("doc_id"),
        filter(split(lower(col(textCol)), "\\s+"), t => t =!= "").as("toks"))
      .select(col("doc_id"), explode(ngramShinglesFromToks(col("toks"), n)).as("g"))
      .select(col("doc_id"), hash48Col(col("g")).as("h"))
      .localCheckpoint(false)
    val freq = sh.groupBy("h").agg(count(lit(1)).as("ndocs"))
    sh.join(freq, "h")
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_grams"),
        sum(when(col("ndocs") >= minDocs, 1L).otherwise(0L)).as("shared_grams"))
      .select(col("doc_id"), col("n_grams"), col("shared_grams"),
        expr("shared_grams * 10000 div n_grams").as("shared_bp"))
  }

  /** Decontamination (benchmark-overlap) check: for each candidate doc, the
    * fraction of its distinct n-grams that also occur in a REFERENCE corpus
    * (held-out eval sets, test benchmarks) — the standard pre-training
    * hygiene step (GPT-3 §C "decontamination"; Dodge et al. 2021). Output:
    * (doc_id, n_grams, contaminated_grams, contaminated_bp, flagged).
    *
    * Shape: the reference's distinct gram-hash set is typically benchmark-
    * sized (≪ corpus) — Catalyst broadcasts it under the threshold and AQE
    * flips to SMJ above; candidate grams are hashed 48-bit longs, one
    * distinct-project + one join + one groupBy, all partial-agged. */
  def contaminationCheck(df: DataFrame, refDf: DataFrame,
                         idCol: String, textCol: String,
                         n: Int = 3, flagBp: Int = 1000): DataFrame = {
    def grams(d: DataFrame, id: Column) = d
      .select(id.as("doc_id"),
        filter(split(lower(col(textCol)), "\\s+"), t => t =!= "").as("toks"))
      .select(col("doc_id"), explode(ngramShinglesFromToks(col("toks"), n)).as("g"))
      .select(col("doc_id"), hash48Col(col("g")).as("h"))
    val refGrams = grams(refDf, col(idCol)).select("h").distinct()
      .withColumn("in_ref", lit(1L))
    grams(df, col(idCol))
      .join(refGrams, Seq("h"), "left")
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_grams"),
        sum(coalesce(col("in_ref"), lit(0L))).as("contaminated_grams"))
      .select(col("doc_id"), col("n_grams"), col("contaminated_grams"),
        expr("contaminated_grams * 10000 div n_grams").as("contaminated_bp"))
      .withColumn("flagged", (col("contaminated_bp") >= flagBp).cast("int"))
  }

  /** Exact-substring span REMOVAL (the second half of Lee et al. 2021): cut
    * every token covered by an n-gram that occurs in ≥ minDocs distinct
    * documents. Returns (doc_id, clean_text, n_tokens, n_removed) where
    * clean_text is over the NORMALIZED token stream (lowercased,
    * whitespace-collapsed — the same normalization every shingling op uses).
    * Docs with fewer than n tokens carry no n-gram evidence and pass through
    * untouched; strict n-grams only (no whole-text fallback — a short doc is
    * not a "span").
    *
    * Shape: positional gram hashes (doc, start, h) and the distinct doc-gram
    * set are built from one projected token column; the corpus frequency
    * table is a partial-agged groupBy on the 48-bit hash; duplicated START
    * positions come back per doc as a collect_set (bounded by doc length),
    * and the cut itself is a per-row Catalyst lambda (exists over the starts
    * array) — no step shuffles text except the final clean_text build. */
  def removeDuplicateSpans(df: DataFrame, idCol: String, textCol: String,
                           n: Int = 5, minDocs: Int = 2): DataFrame = {
    // null-text docs are excluded (they have no token stream to cut; keeping
    // them would emit a NULL clean_text row whose semantics differ per engine)
    val toks = df.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        filter(split(lower(col(textCol)), "\\s+"), t => t =!= "").as("toks"))
      .localCheckpoint(false) // three consumers below; tokenize once
    val positional = toks
      .select(col("doc_id"), posexplode(
        when(size(col("toks")) < n, array().cast("array<string>"))
          .otherwise(transform(sequence(lit(0), size(col("toks")) - n),
            i => array_join(slice(col("toks"), i + 1, lit(n)), " ")))))
      .select(col("doc_id"), col("pos").as("start"), hash48Col(col("col")).as("h"))
    val freq = positional.select("doc_id", "h").distinct()
      .groupBy("h").agg(count(lit(1)).as("ndocs"))
    val dupStarts = positional
      .join(freq.filter(col("ndocs") >= minDocs).select("h"), Seq("h"), "left_semi")
      .groupBy("doc_id").agg(collect_set("start").as("starts"))
    toks.join(dupStarts, Seq("doc_id"), "left")
      .select(col("doc_id"), col("toks"),
        coalesce(col("starts"), array().cast("array<int>")).as("starts"))
      .select(col("doc_id"),
        array_join(filter(col("toks"), (t, p) =>
          !exists(col("starts"), s => s <= p && p < s + n)), " ").as("clean_text"),
        size(col("toks")).as("n_tokens"),
        size(filter(col("toks"), (t, p) =>
          exists(col("starts"), s => s <= p && p < s + n))).as("n_removed"))
  }

}
