package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random
import graft.operators.RangeJoin

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("point-in-interval: containment, boundaries inclusive, keys separate") {
    val points = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "a", 31L), (4L, "b", 10L))
      .toDF("pid", "k", "t")
    val ivs = Seq((100L, "a", 10L, 20L), (101L, "a", 15L, 30L), (102L, "b", 50L, 60L))
      .toDF("iid", "k", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, ivs, Seq("k"), "t", "lo", "hi", Seq("iid"))
      .select("pid", "range_iid").as[(Long, Long)].collect().toSet
    // pid 1 hits [10,20] at its lo boundary; pid 2 hits both (20 = hi of one,
    // inside the other); pid 3 is past every hi; pid 4's key has no cover
    assert(got === Set((1L, 100L), (2L, 100L), (2L, 101L)))
  }

  test("null and inverted bounds never match; null points never match") {
    val points = Seq((1L, "a", Some(10L)), (2L, "a", Option.empty[Long]))
      .toDF("pid", "k", "t")
    val ivs = Seq(
      (100L, "a", Some(5L), Some(15L)),
      (101L, "a", Some(20L), Some(8L)),          // inverted
      (102L, "a", Option.empty[Long], Some(99L)) // null lo
    ).toDF("iid", "k", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, ivs, Seq("k"), "t", "lo", "hi", Seq("iid"))
      .select("pid", "range_iid").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 100L)))
  }

  test("property: bucketized equals brute-force theta join (several widths)") {
    val r = new Random(41)
    val points = (0 until 300).map(i =>
      (i.toLong, s"k${r.nextInt(5)}", r.nextInt(1000).toLong)).toDF("pid", "k", "t")
    val spans = (0 until 120).map { i =>
      val lo = r.nextInt(1000).toLong
      (i.toLong, s"k${r.nextInt(5)}", lo, lo + r.nextInt(200).toLong)
    }.toDF("iid", "k", "lo", "hi")
    val brute = points.join(spans, Seq("k"))
      .filter(col("t") >= col("lo") && col("t") <= col("hi"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    for (w <- Seq(None, Some(1L), Some(7L), Some(512L), Some(100000L))) {
      val got = RangeJoin.pointInInterval(points, spans, Seq("k"), "t", "lo", "hi", Seq("iid"), w)
        .select("pid", "range_iid").as[(Long, Long)].collect()
      assert(got.length === got.toSet.size, s"duplicate pairs at width $w")
      assert(got.toSet === brute, s"mismatch at width $w")
    }
  }

  test("property: interval overlap equals brute force, exactly once (several widths)") {
    val r = new Random(42)
    def gen(n: Int, tag: Long) = (0 until n).map { i =>
      val lo = r.nextInt(1000).toLong
      (tag + i, s"k${r.nextInt(4)}", lo, lo + r.nextInt(150).toLong)
    }
    val left = gen(150, 0L).toDF("lid", "k", "lo", "hi")
    val right = gen(100, 1000L).toDF("rid", "k", "rlo", "rhi")
    val brute = left.join(right, Seq("k"))
      .filter(col("lo") <= col("rhi") && col("rlo") <= col("hi"))
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    for (w <- Seq(None, Some(1L), Some(13L), Some(400L), Some(100000L))) {
      val got = RangeJoin.intervalOverlap(
        left, right, Seq("k"), "lo", "hi", "rlo", "rhi", Seq("rid"), w)
        .select("lid", "range_rid").as[(Long, Long)].collect()
      assert(got.length === got.toSet.size, s"pair emitted twice at width $w")
      assert(got.toSet === brute, s"mismatch at width $w")
    }
  }

  test("negative coordinates bucket correctly (floor, not truncate-toward-zero)") {
    val points = Seq((1L, "a", -5L), (2L, "a", -14L)).toDF("pid", "k", "t")
    val ivs = Seq((100L, "a", -10L, -1L)).toDF("iid", "k", "lo", "hi")
    val got = RangeJoin.pointInInterval(
      points, ivs, Seq("k"), "t", "lo", "hi", Seq("iid"), Some(7L))
      .select("pid", "range_iid").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 100L)))
  }

  test("exact bucketing beyond 2^53 (double floor-div would misplace the point)") {
    val big = 1L << 60
    // width 3: bucket ids ~3.8e17, far above double's exact-integer range —
    // a double-rounded quotient puts the point and its interval copy in
    // DIFFERENT buckets and silently loses the match
    val points = Seq((1L, "a", big), (2L, "a", big + 40L)).toDF("pid", "k", "t")
    val ivs = Seq((100L, "a", big - 1L, big + 1L)).toDF("iid", "k", "lo", "hi")
    val got = RangeJoin.pointInInterval(
      points, ivs, Seq("k"), "t", "lo", "hi", Seq("iid"), Some(3L))
      .select("pid", "range_iid").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 100L)))
  }

  test("exact bucketing at the Long.MinValue boundary (subtraction must not wrap)") {
    val points = Seq((1L, "a", Long.MinValue)).toDF("pid", "k", "t")
    val ivs = Seq((100L, "a", Long.MinValue, Long.MinValue + 10L)).toDF("iid", "k", "lo", "hi")
    val got = RangeJoin.pointInInterval(
      points, ivs, Seq("k"), "t", "lo", "hi", Seq("iid"), Some(1000L))
      .select("pid", "range_iid").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 100L)))
  }

  test("non-positive explicit bucket widths are rejected, not silently wrong") {
    val points = Seq((1L, "a", 10L)).toDF("pid", "k", "t")
    val ivs = Seq((100L, "a", 5L, 15L)).toDF("iid", "k", "lo", "hi")
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points, ivs, Seq("k"), "t", "lo", "hi", Seq("iid"), Some(0L))
    }
    intercept[IllegalArgumentException] {
      RangeJoin.intervalOverlap(points.withColumnRenamed("t", "lo").withColumn("hi", col("lo")),
        ivs, Seq("k"), "lo", "hi", "lo", "hi", Seq("iid"), Some(-5L))
    }
  }

  test("overlap auto width covers BOTH sides' spans (long-left / short-right)") {
    // left spans ~1000, right spans ~2: a right-only max span (w=2) would
    // explode each left interval into ~500 buckets; both-sides max keeps
    // replication <= 2 per side. Correctness must hold either way.
    val left = (0 until 50).map(i => (i.toLong, "k", i * 37L, i * 37L + 1000L))
      .toDF("lid", "k", "lo", "hi")
    val right = (0 until 200).map(i => (1000L + i, "k", i * 11L, i * 11L + 2L))
      .toDF("rid", "k", "rlo", "rhi")
    val brute = left.join(right, Seq("k"))
      .filter(col("lo") <= col("rhi") && col("rlo") <= col("hi"))
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val got = RangeJoin.intervalOverlap(
      left, right, Seq("k"), "lo", "hi", "rlo", "rhi", Seq("rid"))
      .select("lid", "range_rid").as[(Long, Long)].collect()
    assert(got.length === got.toSet.size)
    assert(got.toSet === brute)
  }

  test("plan: equi-join on (key, bucket), not BroadcastNestedLoopJoin") {
    val points = Seq((1L, "a", 10L)).toDF("pid", "k", "t")
    val ivs = Seq((100L, "a", 5L, 15L)).toDF("iid", "k", "lo", "hi")
    val plan = RangeJoin.pointInInterval(points, ivs, Seq("k"), "t", "lo", "hi", Seq("iid"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested loop in plan:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in plan:\n$plan")
  }
}
