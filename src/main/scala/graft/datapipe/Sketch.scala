package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, mergeable cardinality / frequency sketches — the
  * "novel sketch" slot of the beyond-reference operator set (the reference
  * has no approximate aggregates at all, SURVEY §2 H; its only counting is
  * exact `len`/`value_counts`). At 100 TB these are the standard substitutes
  * for exact `COUNT(DISTINCT …)` (a full shuffle of every key) and exact
  * per-key frequency tables (a groupBy whose result set is itself huge):
  * both sketches reduce to a FIXED-SIZE register/counter table with an
  * associative, commutative merge, so Spark's map-side partial aggregation
  * IS the sketch merge — each task folds its partition into ≤ a few KB of
  * state and the exchange moves sketch rows, never keys.
  *
  * Everything is exact integer arithmetic over the md5-derived
  * [[Dedup.hash48Col]] hash (the repo-wide SQL-replayable hash): two engines
  * produce bit-identical registers AND bit-identical estimates, so the
  * driver's DuckDB oracle hard-verifies the whole pipeline (`d_hll_distinct`,
  * `d_cms_freq`) — the same randomness-freezing discipline as the
  * MinHash/SimHash/IVF family.
  *
  * HyperLogLog here uses the TRAILING-zero rank ρ(w) = tz(w)+1 (the original
  * Flajolet–Martin bit-pattern observable; geometric with p=1/2 exactly like
  * the leading-zero form). Chosen deliberately: the register update becomes
  * `max(w & −w)` — the isolated lowest set bit is 2^tz, and max over
  * powers of two is max over ranks — so a register is ONE codegen'd bitwise
  * expression with a LongType `max` merge, and the estimator's 2^−rank terms
  * are exact divisions of a power-of-two scale constant. No log2, no
  * floating point anywhere.
  */
object Sketch {

  /** α_m for the raw HLL estimator, scaled to an exact integer in units of
    * 1e−7 (`alphaDen`). Both the engine and the generated oracle SQL
    * interpolate THIS value, so the constant cannot drift between engines.
    * (Standard approximation α_m = 0.7213/(1 + 1.079/m), valid for m ≥ 128.) */
  def alphaScaled(p: Int): Long = {
    val m = 1 << p
    math.round(0.7213 / (1.0 + 1.079 / m) * 1e7)
  }
  val alphaDen = 10000000L

  /** HLL register table: one row per (group, non-empty register).
    * `maxl` = max over keys of the isolated lowest set bit of the 48−p
    * rank window (a power of two; 2^(48−p) marks the all-zero window, i.e.
    * rank = 48−p+1). Mergeable: union register tables and re-`max` —
    * exactly what a second partial-aggregation pass does, so sketches built
    * per-partition / per-day / per-epoch combine without touching raw keys.
    *
    * The key is hashed with [[Dedup.hash48Col]]; register index = low p bits,
    * rank window = the remaining 48−p bits with a sentinel bit ORed above
    * them (`w | 2^(48−p)`) so the all-zero window needs no special case. */
  def hllRegisters(df: DataFrame, key: Column, groupCols: Seq[String], p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 16, "p in [4,16]")
    val m = 1L << p
    val sentinel = 1L << (48 - p)
    val h = Dedup.hash48Col(key)
    val w = expr(s"CAST(_hll_h div $m AS BIGINT)").bitwiseOR(lit(sentinel))
    df.select((groupCols.map(col) :+ h.as("_hll_h")): _*)
      .withColumn("_hll_w", w)
      .select((groupCols.map(col)
        :+ pmod(col("_hll_h"), lit(m)).as("reg")
        :+ col("_hll_w").bitwiseAND(-col("_hll_w")).as("_hll_l")): _*)
      .groupBy((groupCols :+ "reg").map(col): _*)
      .agg(max("_hll_l").as("maxl"))
  }

  /** Raw-HLL estimate from a register table (integer-exact):
    * est = ⌊α·m²·2^A / Σ_j 2^(A−ρ_j)⌋ with A = 45 — every 2^(A−ρ) term is
    * the exact integer 2^(A−1)/maxl (maxl ≤ 2^44 divides 2^44), empty
    * registers contribute 2^A, and the final division runs in DECIMAL(38,0)
    * (the numerator α·m²·2^45 overflows a long; HUGEINT on the oracle side).
    * Raw estimator only — valid for n ≳ 2.5·m (callers size p to the
    * expected cardinality); the small-range linear-counting correction needs
    * ln() and is deliberately omitted to keep the arithmetic engine-exact. */
  def hllEstimate(registers: DataFrame, groupCols: Seq[String], p: Int = 8,
                  estCol: String = "hll_est"): DataFrame = {
    val m = 1L << p
    val contrib = 1L << 44 // 2^(A-1), A = 45
    val empty = 1L << 45
    val num = (BigInt(alphaScaled(p)) * m * m * (BigInt(1) << 45)).toString
    registers
      .groupBy(groupCols.map(col): _*)
      .agg(sum(expr(s"$contrib div maxl")).as("_hll_sp"),
        count(lit(1)).as("_hll_present"), max(col("reg")).as("_hll_maxreg"))
      .select((groupCols.map(col)
        // fail fast if the register table was built with a larger p than the
        // estimator assumes (reg ≥ m is impossible under matching p; a
        // mismatch would otherwise yield a silently wrong estimate)
        :+ expr(s"IF(_hll_maxreg < $m, CAST(CAST($num AS DECIMAL(38,0)) div " +
          s"(CAST(_hll_sp + ($m - _hll_present) * $empty AS DECIMAL(38,0)) * $alphaDen) AS BIGINT), " +
          s"raise_error(CONCAT('hllEstimate: register index ', CAST(_hll_maxreg AS STRING), " +
          s"' >= m=$m — registers were built with a larger p than the estimator was given')))")
          .as(estCol)): _*)
  }

  /** COUNT(DISTINCT key) ≈ per group, in one pass: registers + estimate. */
  def hllDistinct(df: DataFrame, key: Column, groupCols: Seq[String], p: Int = 8,
                  estCol: String = "hll_est"): DataFrame =
    hllEstimate(hllRegisters(df, key, groupCols, p), groupCols, p, estCol)

  /** Count-Min sketch table: `depth` independent hash rows × `width` counter
    * buckets, as rows (row, bucket, cnt). Row i's hash is
    * hash48("i:" + key) — independent by md5 prefix-seeding, replayable.
    * The explode-by-depth happens BEFORE the shuffle but partial aggregation
    * collapses each partition to ≤ depth·width counter rows, so the exchange
    * carries sketch-sized state regardless of input size. Mergeable: counter
    * tables from disjoint inputs merge by (row, bucket) SUM. */
  def cmsTable(df: DataFrame, key: Column, depth: Int = 4, width: Int = 1024): DataFrame = {
    require(depth >= 1 && width >= 2)
    df.select(key.as("_cms_k"))
      .select(col("_cms_k"), explode(sequence(lit(0), lit(depth - 1))).as("row"))
      .select(col("row"),
        pmod(Dedup.hash48Col(concat(col("row").cast("string"), lit(":"), col("_cms_k").cast("string"))), lit(width)).as("bucket"))
      .groupBy("row", "bucket").agg(count(lit(1)).as("cnt"))
  }

  /** Point-frequency estimates for a set of keys: est(key) = min over rows of
    * the key's counter — the classic CMS upper bound (est ≥ true count
    * always; overshoot bounded by collisions). The counter table is
    * broadcast (≤ depth·width rows by construction), so lookups cost no
    * shuffle on the key side beyond the final per-key min. */
  def cmsLookup(cms: DataFrame, keys: DataFrame, key: Column,
                depth: Int = 4, width: Int = 1024,
                estCol: String = "est_cnt"): DataFrame = {
    val k = keys.select(key.as("_cms_k")).distinct()
      .select(col("_cms_k"), explode(sequence(lit(0), lit(depth - 1))).as("row"))
      .withColumn("bucket",
        pmod(Dedup.hash48Col(concat(col("row").cast("string"), lit(":"), col("_cms_k").cast("string"))), lit(width)))
    k.join(broadcast(cms), Seq("row", "bucket"), "left")
      .groupBy("_cms_k")
      .agg(min(coalesce(col("cnt"), lit(0L))).as(estCol))
      .withColumnRenamed("_cms_k", "key")
  }

  // ---------- mergeable quantile histogram (log-linear bins) ----------
  //
  // The quantile member of the sketch family (HLL = distinct, CMS =
  // frequency, this = rank). Exact per-group percentiles
  // (TextQuality.tokenLenPercentiles) sort every row of a stratum inside one
  // window partition — at 10^12 rows per stratum that shuffle IS the job.
  // This sketch replaces it with HDR-histogram-style log-linear bucketing:
  // a value lands in one of ≤ (64−sub)·2^sub deterministic integer bins
  // (2^sub linear sub-buckets per power-of-two octave → relative bin width
  // ≤ 2^−sub), the per-(group, bin) COUNT is the whole sketch, and map-side
  // partial aggregation IS the merge — the exchange carries sketch rows,
  // never values. Bin tables from disjoint inputs (partitions, days,
  // epochs) merge by SUM without touching raw data.
  //
  // Everything is integer arithmetic shared verbatim by the DuckDB oracle:
  // the bit length that picks the octave is `length(bin(v))` — the minimal
  // binary string both engines print for a positive BIGINT — so bins,
  // cumulative ranks, and the returned bin lower bounds are bit-identical
  // cross-engine (`d_quantile_sketch` hash-matches). No log(), no floats.

  /** Log-linear bin index for non-negative long values, as an expression
    * over a column NAME (the bit-length trick needs the value referenced
    * twice; callers project the value to a real column first). Bins:
    * v+1 < 2^sub → exact bin v+1; else octave msb = ⌊log2(v+1)⌋ and linear
    * sub-bucket = top `sub` bits after the leading one:
    * bin = (msb−sub+1)·2^sub + ((v+1) >> (msb−sub)) − 2^sub.
    * Monotone in v, so cumulative bin counts are cumulative value ranks. */
  private def qhBinExpr(v1: String, sub: Int): String = {
    val m = 1L << sub
    s"""CASE WHEN $v1 <= 0 THEN raise_error('qhBins: value must be >= 0')
       |  WHEN length(bin($v1)) - 1 < $sub THEN $v1
       |  ELSE (length(bin($v1)) - $sub) * $m + shiftright($v1, length(bin($v1)) - 1 - $sub) - $m
       |END""".stripMargin.replace('\n', ' ')
  }

  /** Inverse of [[qhBinExpr]]: smallest ORIGINAL value mapping to `bin`
    * (the estimate a quantile lookup reports — a true corpus value's bin
    * lower bound, under-reporting by < 2^−sub relative). */
  private def qhLowExpr(bin: String, sub: Int): String = {
    val m = 1L << sub
    s"""CASE WHEN $bin < $m THEN $bin - 1
       |  ELSE shiftleft($m + pmod($bin, $m), CAST($bin div $m AS INT) - 1) - 1
       |END""".stripMargin.replace('\n', ' ')
  }

  /** Project the log-linear bin index of a non-negative integer column onto
    * the frame (column `as`) — the per-ROW face of [[qhBins]], for callers
    * that label data rows by bin (e.g. [[TextQuality.pplBucketsSketch]]
    * compares each doc's bin to sketch-derived threshold bins). Same bin
    * arithmetic, so a row's bin always matches the sketch row it counted
    * into. */
  def qhBinOf(df: DataFrame, value: Column, sub: Int = 5,
              as: String = "bin"): DataFrame = {
    require(sub >= 1 && sub <= 10, "sub in [1,10]")
    df.withColumn("_qh_v1", value.cast("long") + lit(1L))
      .withColumn(as, expr(qhBinExpr("_qh_v1", sub)))
      .drop("_qh_v1")
  }

  /** Quantile-histogram sketch table: one row per (group, non-empty bin)
    * with its count — fixed-size, mergeable by (group, bin) SUM. `value`
    * must be a non-negative integer expression (fails fast otherwise). */
  def qhBins(df: DataFrame, value: Column, groupCols: Seq[String],
             sub: Int = 5): DataFrame = {
    require(sub >= 1 && sub <= 10, "sub in [1,10]")
    df.select((groupCols.map(col) :+ (value.cast("long") + lit(1L)).as("_qh_v1")): _*)
      .withColumn("bin", expr(qhBinExpr("_qh_v1", sub)))
      .groupBy((groupCols :+ "bin").map(col): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Quantile estimates from a bin table, percentile_disc semantics on the
    * binned distribution: for each q (basis points) the reported value is
    * the lower bound of the first bin whose cumulative count reaches
    * rank = ⌈n·q/10⁴⌉ — always ≤ the true q-th value, short by < 2^−sub
    * relative. The cumsum window runs over SKETCH rows (≤ bins per group),
    * not data rows — the one data-sized pass is the groupBy in qhBins. */
  def qhQuantiles(bins: DataFrame, groupCols: Seq[String], qBp: Seq[Int],
                  sub: Int = 5, estCol: String = "est"): DataFrame = {
    require(qBp.nonEmpty && qBp.forall(q => q >= 0 && q <= 10000), "qBp in [0,10000]")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*).orderBy(col("bin"))
    val cum = bins.withColumn("_qh_cum", sum("cnt").over(w))
    val n = bins.groupBy(groupCols.map(col): _*).agg(sum("cnt").as("n"))
    cum.join(broadcast(n), groupCols)
      .withColumn("q_bp", explode(array(qBp.distinct.sorted.map(q => lit(q)): _*)))
      .filter(col("_qh_cum") * 10000L >= col("n") * col("q_bp"))
      .groupBy((groupCols :+ "q_bp").map(col): _*)
      .agg(min("bin").as("_qh_bin"), first("n").as("n"))
      .withColumn(estCol, expr(qhLowExpr("_qh_bin", sub)))
      .select((groupCols.map(col) :+ col("q_bp") :+ col("n") :+ col(estCol)): _*)
  }

  /** Per-group approximate percentiles in one pass: bins + quantiles. */
  def qhPercentiles(df: DataFrame, value: Column, groupCols: Seq[String],
                    qBp: Seq[Int], sub: Int = 5, estCol: String = "est"): DataFrame =
    qhQuantiles(qhBins(df, value, groupCols, sub), groupCols, qBp, sub, estCol)

  // ---- KMV (k-minimum-values / bottom-k) sketch — distinct counts AND set
  // overlap (Bar-Yossef et al. 2002; intersection protocol Beyer et al.,
  // SIGMOD 2007). HLL cannot estimate |A∩B|; KMV can, because the k
  // smallest hashes of A∪B are computable from the two sketches alone and
  // form a uniform sample of the union. ----

  /** KMV sketch per group: the sorted array of the k smallest DISTINCT
    * [[Dedup.hash48Col]] hashes of `key` — via the custom
    * [[graft.functions.KMinValues]] TypedImperativeAggregate, so each task
    * folds its partition into ≤ k longs per group and the exchange carries
    * serialized sketch buffers, never keys (the same contract as the
    * HLL/CMS register tables; this one needs a custom aggregate because
    * bounded top-k state is not a built-in `max`/`sum` register). */
  def kmvSketch(df: DataFrame, key: Column, groupCols: Seq[String],
                k: Int = 128): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(graft.functions.KMinValues.column(Dedup.hash48Col(key), k).as("kmv"))

  /** Distinct-count estimate from a KMV array: EXACT when the sketch is
    * unsaturated (size < k ⇒ it holds every distinct hash), else the
    * classic (k−1)·2^48 / h_(k) — exact integer division over the 48-bit
    * hash space, bit-stable across engines. */
  def kmvDistinctCol(kmv: String, k: Int): Column =
    expr(s"IF(size($kmv) < $k, CAST(size($kmv) AS BIGINT), " +
      s"CAST(${1L << 48} AS BIGINT) * ${k - 1} div element_at($kmv, $k))")

  /** Pairwise set-overlap estimates between per-group KMV sketches
    * (`sketches` = [[kmvSketch]] output): for each group pair, the k
    * smallest hashes of the UNION are reconstructed from the two arrays
    * alone (merge + sort + cap — pure Catalyst array ops on ≤ 2k elements),
    * `shared` counts union-sketch members present in BOTH sides, and
    *   |A∩B| ≈ shared · union_est / k′,  J ≈ shared / k′
    * — all exact-integer. The pair join is sketch×sketch (group-count
    * sized), never data-sized: estimating overlap between two 10^11-doc
    * corpora costs two sketch scans + a |groups|² join of k-long arrays —
    * the sketch-space form of benchmark decontamination / corpus-mixture
    * overlap auditing. */
  def kmvOverlap(sketches: DataFrame, groupCol: String, k: Int): DataFrame = {
    val a = sketches.select(col(groupCol).as("grp_a"), col("kmv").as("kmv_a"))
    val b = sketches.select(col(groupCol).as("grp_b"), col("kmv").as("kmv_b"))
    a.join(b, col("grp_a") < col("grp_b"))
      .withColumn("u", expr(s"slice(array_sort(array_union(kmv_a, kmv_b)), 1, $k)"))
      .withColumn("k2", size(col("u")).cast("long"))
      .withColumn("union_est", expr(s"IF(k2 < $k, k2, " +
        s"CAST(${1L << 48} AS BIGINT) * ${k - 1} div element_at(u, $k))"))
      .withColumn("shared",
        expr("CAST(size(array_intersect(array_intersect(u, kmv_a), kmv_b)) AS BIGINT)"))
      .withColumn("inter_est", expr("shared * union_est div k2"))
      .withColumn("jaccard_bp", expr("shared * 10000 div k2"))
      .select(col("grp_a"), col("grp_b"), col("union_est"), col("shared"),
        col("inter_est"), col("jaccard_bp"))
  }
}
