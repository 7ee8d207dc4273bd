package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join — every (point, interval) pair on the same
  * key with lo ≤ point ≤ hi. Spark plans a raw `p.ts BETWEEN i.lo AND i.hi`
  * predicate as BroadcastNestedLoopJoin (or a per-key cartesian under an
  * equi-key), which is O(n·m) work per key and the classic 100 TB
  * cliff-edge; the reference has no non-equi joins at all (SURVEY §2 H), so
  * like AsOfJoin this is a beyond-reference operator composed from
  * built-ins (extension preference (a), SURVEY §7.4).
  *
  * Technique — bucketized equi-join: pick a bucket width W, replicate each
  * interval into the ⌈span/W⌉+1 buckets it touches (`sequence` + `explode`),
  * map each point to its single bucket, equi-join on (key…, bucket), then
  * apply the exact BETWEEN filter. Each qualifying pair is produced EXACTLY
  * once (a point lives in one bucket; an interval appears once per bucket),
  * so no dedup pass is needed. Cost: one hash shuffle on (key…, bucket) and
  * an interval blow-up factor of span/W+1 — with the default auto width
  * (W = max span, one cheap aggregate over the build side) the factor is
  * ≤ 2, i.e. O(n + 2m) shuffled rows instead of O(n·m) compared pairs.
  * Bucketing also DEFUSES key skew: a hot key's rows spread over its time
  * buckets instead of landing in one reducer.
  *
  * All range columns are LongType (callers convert timestamps via
  * unix_micros) — bucket ids use exact integer floor-division, never
  * double arithmetic, so epoch-microsecond magnitudes cannot lose bits.
  */
object RangeJoin {

  /** Exact floor-division over the full long domain: (c − pmod(c, w)) is
    * the largest multiple of w ≤ c (pmod is nonnegative), computed in
    * DECIMAL(38,0) so neither the subtraction (which would wrap for c
    * within pmod of Long.MinValue) nor the division (long÷long promotes to
    * double, which silently rounds above 2⁵³) can lose bits; the quotient
    * of two exact decimals at an integral value is exact. */
  private def floorDiv(c: org.apache.spark.sql.Column, w: Long) =
    (c.cast("decimal(38,0)") - pmod(c, lit(w)).cast("decimal(38,0)"))
      .divide(lit(w)).cast("long")

  /** @param points      rows carrying `pointCol` (LongType)
    * @param intervals   rows carrying `loCol`/`hiCol` (LongType, lo ≤ hi;
    *                    violations and null bounds are dropped, matching
    *                    SQL BETWEEN which cannot match them)
    * @param key         equi-key columns present on both sides
    * @param payload     interval columns to carry onto matches (prefixed
    *                    `range_`)
    * @param bucketWidth bucket width in the range column's units; None →
    *                    auto = max interval span (one aggregate over
    *                    `intervals`, replication factor ≤ 2)
    * @return one row per qualifying (point, interval) pair: all `points`
    *         columns + `range_<payload>` columns */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      key: Seq[String],
      pointCol: String,
      loCol: String,
      hiCol: String,
      payload: Seq[String],
      bucketWidth: Option[Long] = None): DataFrame = {
    bucketWidth.foreach(w => require(w > 0, s"bucketWidth must be positive, got $w"))
    val iv = intervals.filter(
      col(loCol).isNotNull && col(hiCol).isNotNull && col(loCol) <= col(hiCol))
    val w = bucketWidth.getOrElse {
      // driver-side scalar: ONE number off an aggregate, not a collect of data
      val m = iv.agg(max(col(hiCol) - col(loCol))).head()
      if (m.isNullAt(0)) 1L else math.max(1L, m.getLong(0))
    }
    val p = points
      .filter(col(pointCol).isNotNull)
      .withColumn("_rj_b", floorDiv(col(pointCol), w))
    val ivExp = iv
      .select((key.map(col) :+ col(loCol).as("_rj_lo") :+ col(hiCol).as("_rj_hi"))
        ++ payload.map(c => col(c).as(s"range_$c")): _*)
      .withColumn("_rj_b",
        explode(sequence(floorDiv(col("_rj_lo"), w), floorDiv(col("_rj_hi"), w))))
    p.join(ivExp, key :+ "_rj_b")
      .filter(col(pointCol) >= col("_rj_lo") && col(pointCol) <= col("_rj_hi"))
      .select(points.columns.map(col) ++ payload.map(c => col(s"range_$c")): _*)
  }

  /** Interval-overlap join — every (left, right) interval pair on the same
    * key with lLo ≤ rHi AND rLo ≤ lHi (closed-interval overlap). Same
    * bucketization; both sides replicate. A pair can now meet in SEVERAL
    * shared buckets, so each side keeps its bucket list and the pair is
    * kept only in the FIRST shared bucket (max of the two interval start
    * buckets) — dedup by arithmetic, not by an extra distinct shuffle. */
  def intervalOverlap(
      left: DataFrame,
      right: DataFrame,
      key: Seq[String],
      lLo: String,
      lHi: String,
      rLo: String,
      rHi: String,
      rightPayload: Seq[String],
      bucketWidth: Option[Long] = None): DataFrame = {
    bucketWidth.foreach(w => require(w > 0, s"bucketWidth must be positive, got $w"))
    val lf = left.filter(
      col(lLo).isNotNull && col(lHi).isNotNull && col(lLo) <= col(lHi))
    val rf = right.filter(
      col(rLo).isNotNull && col(rHi).isNotNull && col(rLo) <= col(rHi))
    val w = bucketWidth.getOrElse {
      // auto width = max span across BOTH sides (any positive w is correct;
      // the max bounds EACH side's replication at ≤ 2 — a one-sided max
      // would leave the other side's blow-up unbounded)
      val m = lf.select((col(lHi) - col(lLo)).as("s"))
        .union(rf.select((col(rHi) - col(rLo)).as("s")))
        .agg(max(col("s"))).head()
      if (m.isNullAt(0)) 1L else math.max(1L, m.getLong(0))
    }
    val le = lf
      .withColumn("_rj_lb", floorDiv(col(lLo), w))
      .withColumn("_rj_b", explode(sequence(floorDiv(col(lLo), w), floorDiv(col(lHi), w))))
    val re = rf
      .select((key.map(col) :+ col(rLo).as("_rj_rlo") :+ col(rHi).as("_rj_rhi"))
        ++ rightPayload.map(c => col(c).as(s"range_$c")): _*)
      .withColumn("_rj_rb", floorDiv(col("_rj_rlo"), w))
      .withColumn("_rj_b", explode(sequence(floorDiv(col("_rj_rlo"), w), floorDiv(col("_rj_rhi"), w))))
    le.join(re, key :+ "_rj_b")
      .filter(col(lLo) <= col("_rj_rhi") && col("_rj_rlo") <= col(lHi))
      // first shared bucket = max(start buckets): emit there and only there
      .filter(col("_rj_b") === greatest(col("_rj_lb"), col("_rj_rb")))
      .select(left.columns.map(col) ++ rightPayload.map(c => col(s"range_$c")): _*)
  }
}
