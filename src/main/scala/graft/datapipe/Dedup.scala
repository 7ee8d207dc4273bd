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
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(TextQuality.fingerprint(col(textCol))).orderBy(col(idCol))
    df.withColumn("rk", row_number().over(w)).filter(col("rk") === 1).drop("rk")
  }

  // ---------- shingling + MinHash ----------

  /** Word n-gram shingle hashes (64-bit) of normalized text. UDF: a single
    * pass over the tokens; output is the SMALL set of longs that all
    * downstream similarity ops run on (text never shuffles). */
  def shingleUdf(n: Int) = udf { (text: String) =>
    if (text == null) Array.empty[Long]
    else {
      val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      if (toks.length < n) {
        if (toks.isEmpty) Array.empty[Long]
        else Array(polyHash(toks.mkString(" ")))
      } else
        (0 to toks.length - n).map(i => polyHash(toks.slice(i, i + n).mkString(" "))).toArray.distinct
    }
  }

  def polyHash(s: String): Long = {
    var h = 1125899906842597L
    var i = 0
    while (i < s.length) { h = 31 * h + s.charAt(i); i += 1 }
    // finalize (splitmix64) so sequential strings spread
    var z = h + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** MinHash signature of a shingle set: m permutations h_i(x) = a_i*x + b_i
    * (odd a_i, splitmix-seeded), min over the set. */
  def minhashUdf(m: Int, seed: Long = 42L) = {
    val coefs = minhashCoefs(m, seed)
    udf { (shingles: Seq[Long]) =>
      if (shingles == null || shingles.isEmpty) Array.fill(m)(Long.MaxValue)
      else coefs.map { case (a, b) =>
        var mn = Long.MaxValue
        for (s <- shingles) { val v = a * s + b; if (v < mn) mn = v }
        mn
      }
    }
  }

  private[datapipe] def minhashCoefs(m: Int, seed: Long): Array[(Long, Long)] = {
    var z = seed
    def next(): Long = {
      z += 0x9E3779B97F4A7C15L
      var x = z
      x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
      x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
      x ^ (x >>> 31)
    }
    Array.fill(m)((next() | 1L, next()))
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
    * Returns (id_a, id_b, jaccard) with id_a < id_b.
    */
  def minhashNearDuplicates(
      df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, bands: Int = 8, rowsPerBand: Int = 4,
      threshold: Double = 0.7, maxBucket: Int = 64): DataFrame = {
    val m = bands * rowsPerBand
    val sh = df.select(col(idCol).as("id"), shingleUdf(shingleN)(col(textCol)).as("shingles"))
      .withColumn("sig", minhashUdf(m)(col("shingles")))
      .localCheckpoint() // shingles reused by verify; don't recompute
    val banded = sh.select(
      col("id"),
      posexplode(expr(s"transform(sequence(0, ${bands - 1}), b -> slice(sig, b * $rowsPerBand + 1, $rowsPerBand))")))
      .select(col("id"), col("pos").as("band"), col("col").as("slice"))
      .withColumn("bucket", xxhash64(col("band"), col("slice")))
    val buckets = banded.groupBy("band", "bucket")
      .agg(collect_list("id").as("ids"))
      .filter(size(col("ids")).between(2, maxBucket))
    val pairs = buckets
      .select(explode(pairUdf(col("ids"))).as("p"))
      .select(col("p._1").as("id_a"), col("p._2").as("id_b"))
      .distinct()
    val withSh = pairs
      .join(sh.select(col("id").as("id_a"), col("shingles").as("sh_a")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("shingles").as("sh_b")), "id_b")
      .withColumn("jaccard", round(jaccardUdf(col("sh_a"), col("sh_b")), 4))
    withSh.filter(col("jaccard") >= threshold).select("id_a", "id_b", "jaccard")
  }

  private val pairUdf = udf { (ids: Seq[Long]) =>
    val s = ids.sorted
    for (i <- s.indices; j <- i + 1 until s.length) yield (s(i), s(j))
  }

  /** Exact n-gram Jaccard for ALL pairs of a (small) candidate set — the
    * brute-force baseline the LSH path is validated against in tests. */
  def ngramJaccardAllPairs(df: DataFrame, idCol: String, textCol: String,
                           shingleN: Int = 3, threshold: Double = 0.0): DataFrame = {
    val sh = df.select(col(idCol).as("id"), shingleUdf(shingleN)(col(textCol)).as("sh"))
    val a = sh.select(col("id").as("id_a"), col("sh").as("sh_a"))
    val b = sh.select(col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("jaccard", round(jaccardUdf(col("sh_a"), col("sh_b")), 4))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  // ---------- SimHash ----------

  /** 64-bit SimHash over token hashes: sign-sum of per-token bit vectors. */
  val simhashUdf = udf { (text: String) =>
    if (text == null) 0L
    else {
      val acc = new Array[Int](64)
      for (t <- text.toLowerCase.split("\\s+") if t.nonEmpty) {
        val h = polyHash(t)
        var b = 0
        while (b < 64) { if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1; b += 1 }
      }
      var out = 0L
      var b = 0
      while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
      out
    }
  }

  val hammingUdf = udf { (a: Long, b: Long) => java.lang.Long.bitCount(a ^ b) }

  /** SimHash near-duplicates with Hamming distance ≤ maxDist, candidate
    * generation by banding the 64 bits into 4 × 16-bit chunks (any chunk equal
    * → candidate; guarantees recall for maxDist ≤ 3). */
  def simhashNearDuplicates(df: DataFrame, idCol: String, textCol: String,
                            maxDist: Int = 3, maxBucket: Int = 64): DataFrame = {
    val sh = df.select(col(idCol).as("id"), simhashUdf(col(textCol)).as("sim"))
    val banded = sh.select(col("id"), col("sim"),
      posexplode(expr("transform(sequence(0,3), b -> (sim >> (b*16)) & 65535)")))
      .select(col("id"), col("sim"), col("pos").as("band"), col("col").as("chunk"))
    val buckets = banded.groupBy("band", "chunk")
      .agg(collect_list(struct(col("id"), col("sim"))).as("xs"))
      .filter(size(col("xs")).between(2, maxBucket))
    val pairs = buckets.select(explode(simPairUdf(col("xs"))).as("p"))
      .select(col("p._1").as("id_a"), col("p._2").as("id_b"), col("p._3").as("dist"))
      .distinct()
    pairs.filter(col("dist") <= maxDist)
  }

  private val simPairUdf = udf { (xs: Seq[org.apache.spark.sql.Row]) =>
    val s = xs.map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    for (i <- s.indices; j <- i + 1 until s.length)
      yield (s(i)._1, s(j)._1, java.lang.Long.bitCount(s(i)._2 ^ s(j)._2))
  }
}
