package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("as-of backward: latest right row at or before each left timestamp") {
    val left = Seq((1L, "u", 10L), (2L, "u", 20L), (3L, "u", 5L), (4L, "v", 50L))
      .toDF("event_id", "user", "t")
    val right = Seq((100L, "u", 10L), (101L, "u", 15L), (102L, "w", 1L))
      .toDF("rid", "user", "rt")
    val out = AsOfJoin.asofBackward(left, right, Seq("user"), "t", "rt", Seq("rid"))
      .select("event_id", "asof_rid").as[(Long, Long)].collect().toMap
    assert(out(1L) === 100L)   // tie: rt == t matches (inclusive)
    assert(out(2L) === 101L)   // latest of the two priors
    assert(!out.contains(3L))  // nothing at or before t=5
    assert(!out.contains(4L))  // no right rows for key v
  }

  test("as-of forward: earliest right row at or after each left timestamp") {
    val left = Seq((1L, "u", 10L), (2L, "u", 20L), (3L, "u", 5L), (4L, "v", 50L))
      .toDF("event_id", "user", "t")
    val right = Seq((100L, "u", 10L), (101L, "u", 15L), (102L, "w", 1L))
      .toDF("rid", "user", "rt")
    val out = AsOfJoin.asofForward(left, right, Seq("user"), "t", "rt", Seq("rid"))
      .select("event_id", "asof_rid").as[(Long, Long)].collect().toMap
    assert(out(1L) === 100L)   // tie: rt == t matches (inclusive)
    assert(out(3L) === 100L)   // earliest of the two at-or-afters
    assert(!out.contains(2L))  // nothing at or after t=20
    assert(!out.contains(4L))  // no right rows for key v
  }

  test("null timestamps never match (neither as left probes nor as right candidates)") {
    val left = Seq((1L, "u", Some(10L)), (2L, "u", Option.empty[Long]))
      .toDF("event_id", "user", "t")
    val right = Seq((100L, "u", Some(5L)), (101L, "u", Option.empty[Long]))
      .toDF("rid", "user", "rt")
    val back = AsOfJoin.asofBackward(left, right, Seq("user"), "t", "rt", Seq("rid"))
      .select("event_id", "asof_rid").as[(Long, Long)].collect().toMap
    assert(back === Map(1L -> 100L), s"null-ts rows leaked into backward: $back")
    val fwd = AsOfJoin.asofForward(
      Seq((1L, "u", Some(1L)), (2L, "u", Option.empty[Long])).toDF("event_id", "user", "t"),
      right, Seq("user"), "t", "rt", Seq("rid"))
      .select("event_id", "asof_rid").as[(Long, Long)].collect().toMap
    assert(fwd === Map(1L -> 100L), s"null-ts rows leaked into forward: $fwd")
  }

  test("property: forward as-of equals brute-force min-later on 200 random rows") {
    val r = new Random(23)
    val lrows = (0 until 200).map(i => (i.toLong, s"k${r.nextInt(6)}", r.nextInt(1000).toLong))
    val rrows = (0 until 80).map(i => (1000L + i, s"k${r.nextInt(6)}", r.nextInt(1000).toLong))
    val got = AsOfJoin.asofForward(
      lrows.toDF("event_id", "key", "t"), rrows.toDF("rid", "key", "rt"),
      Seq("key"), "t", "rt", Seq("rid"))
      .select("event_id", "asof_rid").as[(Long, Long)].collect().toMap
    for ((id, k, t) <- lrows) {
      val cands = rrows.filter(x => x._2 == k && x._3 >= t)
      if (cands.isEmpty) assert(!got.contains(id))
      else {
        val bestTs = cands.map(_._3).min
        // ties on rt: window orders by payload struct → max rid among ties
        val expect = cands.filter(_._3 == bestTs).map(_._1).max
        assert(got(id) === expect, s"left $id")
      }
    }
  }

  test("property: as-of join equals brute-force max-prior on 200 random rows") {
    val r = new Random(19)
    val lrows = (0 until 200).map(i => (i.toLong, s"k${r.nextInt(6)}", r.nextInt(1000).toLong))
    val rrows = (0 until 80).map(i => (1000L + i, s"k${r.nextInt(6)}", r.nextInt(1000).toLong))
    val got = AsOfJoin.asofBackward(
      lrows.toDF("event_id", "key", "t"), rrows.toDF("rid", "key", "rt"),
      Seq("key"), "t", "rt", Seq("rid"))
      .select("event_id", "asof_rid").as[(Long, Long)].collect().toMap
    for ((id, k, t) <- lrows) {
      val cands = rrows.filter(x => x._2 == k && x._3 <= t)
      if (cands.isEmpty) assert(!got.contains(id))
      else {
        val bestTs = cands.map(_._3).max
        // ties on rt: window orders by payload struct → max rid among ties
        val expect = cands.filter(_._3 == bestTs).map(_._1).max
        assert(got(id) === expect, s"left $id")
      }
    }
  }
}
