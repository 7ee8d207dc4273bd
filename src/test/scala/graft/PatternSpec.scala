package graft

import graft.kg.Pattern
import graft.kg.Pattern.{C, Tp, V}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BGP matching over a (subj, pred, obj) triple table: SPARQL set semantics
  * replayed against a hand-enumerated oracle on a tiny store. */
class PatternSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private lazy val trip = Seq(
    // (subj, pred, obj, doc_id) — doc_id is provenance, not matched on
    ("ent:1", "category", "PER", "d1"),
    ("ent:2", "category", "ORG", "d1"),
    ("ent:3", "category", "PER", "d2"),
    ("ent:1", "inDoc", "d1", "d1"),
    ("ent:2", "inDoc", "d1", "d1"),
    ("ent:1", "inDoc", "d2", "d2"),
    ("ent:3", "inDoc", "d2", "d2"),
    ("ent:1", "label", "alpha", "d1"),
    ("ent:1", "label", "alpha", "d2"), // provenance dup — must collapse
    ("ent:4", "sameAs", "ent:4", "d1") // self-loop for the repeated-var case
  ).toDF("subj", "pred", "obj", "doc_id")

  test("single pattern: constant filters + variable projection, distinct bindings") {
    val r = Pattern.matchBgp(trip, Seq(Tp(V("e"), C("label"), V("l"))))
      .as[(String, String)].collect().toSet
    assert(r === Set(("ent:1", "alpha"))) // the two provenance rows collapse
  }

  test("shared-variable chain joins like SPARQL") {
    // ?e category PER . ?e inDoc ?d
    val r = Pattern.matchBgp(trip, Seq(
        Tp(V("e"), C("category"), C("PER")),
        Tp(V("e"), C("inDoc"), V("d"))))
      .as[(String, String)].collect().toSet
    assert(r === Set(("ent:1", "d1"), ("ent:1", "d2"), ("ent:3", "d2")))
  }

  test("two-hop co-occurrence pattern matches the hand oracle") {
    val r = Pattern.matchBgp(trip, Seq(
        Tp(V("a"), C("category"), C("PER")),
        Tp(V("a"), C("inDoc"), V("d")),
        Tp(V("b"), C("inDoc"), V("d"))))
      .filter(col("a") =!= col("b"))
      .as[(String, String, String)].collect().toSet
    assert(r === Set(
      ("ent:1", "d1", "ent:2"),
      ("ent:1", "d2", "ent:3"),
      ("ent:3", "d2", "ent:1")))
  }

  test("repeated variable inside one pattern becomes in-row equality") {
    val r = Pattern.matchBgp(trip, Seq(Tp(V("x"), C("sameAs"), V("x"))))
      .as[String].collect().toSeq
    assert(r === Seq("ent:4"))
  }

  test("all-constant pattern is an existence gate") {
    val some = Pattern.matchBgp(trip, Seq(
      Tp(C("ent:1"), C("category"), C("PER")), Tp(V("e"), C("inDoc"), C("d2"))))
    assert(some.select("e").as[String].collect().toSet === Set("ent:1", "ent:3"))
    val none = Pattern.matchBgp(trip, Seq(
      Tp(C("ent:9"), C("category"), C("PER")), Tp(V("e"), C("inDoc"), C("d2"))))
    assert(none.count() === 0)
  }

  test("disjoint patterns cross-join (BGP cartesian semantics)") {
    val r = Pattern.matchBgp(trip, Seq(
        Tp(V("p"), C("category"), C("PER")),
        Tp(V("o"), C("category"), C("ORG"))))
      .as[(String, String)].collect().toSet
    assert(r === Set(("ent:1", "ent:2"), ("ent:3", "ent:2")))
  }

  test("variable column order follows first appearance") {
    val cols = Pattern.matchBgp(trip, Seq(
      Tp(V("z"), C("inDoc"), V("a")))).columns.toSeq
    assert(cols === Seq("z", "a"))
  }
}
