package graft

import graft.kg.Pattern
import graft.kg.Pattern.{C, Tp, V}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

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

  test("pred-partitioned store: round-trip, BGP equality, directory pruning, lineage") {
    import graft.io.TableFormat
    val store = java.nio.file.Files.createTempDirectory("graft-patstore").toString + "/triples"
    TableFormat.savePartitioned(trip, store, partCol = "pred", keyCol = "subj",
      buckets = 4, stage = "triples")
    val loaded = TableFormat.load(spark, store)

    // round-trip: same multiset of rows (pred comes back from directory names)
    assert(loaded.select("subj", "pred", "obj", "doc_id").as[(String, String, String, String)]
      .collect().sorted.toSeq ===
      trip.as[(String, String, String, String)].collect().sorted.toSeq)

    // the SAME BGP over the loaded store binds identically to the in-memory run
    val bgp = Seq(
      Tp(V("a"), C("category"), C("PER")),
      Tp(V("a"), C("inDoc"), V("d")),
      Tp(V("b"), C("inDoc"), V("d")))
    assert(Pattern.matchBgp(loaded, bgp).as[(String, String, String)].collect().toSet ===
      Pattern.matchBgp(trip, bgp).as[(String, String, String)].collect().toSet)

    // directory-level pruning: a constant-pred scan reads ONLY that
    // predicate's files (behavioral check via input_file_name — stronger
    // than grepping the plan string) and the plan carries it as a
    // PartitionFilter, i.e. the prune happens before IO, not post-scan
    val perFiles = loaded.filter(col("pred") === "category")
      .select(input_file_name()).as[String].collect().toSet
    assert(perFiles.nonEmpty && perFiles.forall(_.contains("pred=category")))
    assert(Pattern.matchBgp(loaded, Seq(Tp(V("e"), C("category"), V("c"))))
      .queryExecution.executedPlan.toString.contains("PartitionFilters"))

    // subj-key bucket pruning still composes inside a predicate directory
    val oneKey = spark.read.parquet(store)
      .filter(col("pred") === "inDoc" &&
        col(TableFormat.BucketCol) === TableFormat.bucketOf(spark, "ent:1", 4) &&
        col("subj") === "ent:1")
      .select(input_file_name()).as[String].collect().toSet
    assert(oneKey.forall(f => f.contains("pred=inDoc") && f.contains("part_bucket=")))

    // manifest: two-level lineage keys, counts sum to the row count, one
    // file per leaf directory (the small-files discipline)
    val mf = java.nio.file.Files.readString(java.nio.file.Paths.get(store, "_manifest.json"))
    assert(mf.contains("\"part_col\": \"pred\"") && mf.contains("\"complete\": true"))
    val lineage = """"(pred=[^"]+/part_bucket=\d+)": (\d+)""".r
      .findAllMatchIn(mf).map(m => m.group(1) -> m.group(2).toLong).toSeq
    assert(lineage.map(_._2).sum === trip.count())
    val leafFiles = java.nio.file.Files.walk(java.nio.file.Paths.get(store))
      .iterator().asScala
      .filter(p => java.nio.file.Files.isRegularFile(p) && p.getFileName.toString.endsWith(".parquet"))
      .toSeq
    assert(leafFiles.map(_.getParent.toString).distinct.size === leafFiles.size)
    assert(lineage.size === leafFiles.size) // every leaf dir appears in lineage
  }
}
