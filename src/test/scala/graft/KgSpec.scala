package graft

import graft.kg.Canonicalize
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

class KgSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** Union-find oracle. */
  private def ufComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.HashMap[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: Long, b: Long): Unit = { val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) }
    edges.foreach { case (a, b) => union(a, b) }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    // min-id labeling
    val byRoot = nodes.groupBy(find)
    byRoot.flatMap { case (_, ns) => val m = ns.min; ns.map(_ -> m) }.toMap
  }

  test("property: connected components equal union-find oracle on 20 random graphs") {
    val r = new Random(31)
    for (_ <- 0 until 20) {
      val n = 5 + r.nextInt(30)
      val nEdges = r.nextInt(40)
      val edges = (0 until nEdges).map(_ => (r.nextInt(n).toLong, r.nextInt(n).toLong)).distinct
      if (edges.nonEmpty) {
        val df = edges.toDF("src", "dst")
        val got = Canonicalize.connectedComponents(spark, df)
          .as[(Long, Long)].collect().toMap
        val expect = ufComponents(edges)
        assert(got === expect)
      }
    }
  }

  test("connected components on a long chain and an empty edge set (pointer-jump paths)") {
    // 120-node chain: diameter 119 — plain min-propagation would need 120
    // rounds and hit maxIter=50; pointer jumping closes in ~log2(119)+1
    val chain = (0L until 119L).map(i => (i, i + 1)).toDF("src", "dst")
    val got = Canonicalize.connectedComponents(spark, chain)
      .as[(Long, Long)].collect().toMap
    assert(got.size === 120 && got.values.forall(_ === 0L))
    // empty edge set (clean corpus): converges immediately, returns no rows
    val none = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(Canonicalize.connectedComponents(spark, none).count() === 0L)
  }

  test("connected components over STRING ids: chain converges via the generic detector") {
    // decimal-cast of a string id is NULL (non-ANSI), so the numeric sum
    // detector would read Σ=0 every round and declare convergence after one
    // iteration — this chain needs several rounds, catching exactly that
    val chain = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("e", "f"))
      .toDF("src", "dst")
    val got = Canonicalize.connectedComponents(spark, chain)
      .as[(String, String)].collect().toMap
    assert(got.size === 6 && got.values.forall(_ === "a"))
    // component label is the LEXICOGRAPHIC min for string ids
    val tangled = Seq(("doc-7", "doc-100"), ("doc-100", "doc-07")).toDF("src", "dst")
    val got2 = Canonicalize.connectedComponents(spark, tangled)
      .as[(String, String)].collect().toMap
    assert(got2.values.toSet === Set("doc-07"))
  }

  test("fuzzy linking: near-miss surface reaches its entity through the block") {
    import org.apache.spark.sql.functions._
    val dict = Seq(
      (0L, "acme corporation", Seq("acme corporation"), "ORG"),
      (1L, "zebra park", Seq("zebra park"), "LOC"))
      .toDF("entity_id", "canonical", "aliases", "category")
    val mentions = Seq(
      ("d1", 0L, "acme corporation ltd", "ORG", 1, 0, "token", "t"), // near miss
      ("d1", 0L, "zebra park", "LOC", 1, 1, "token", "t"),           // exact
      ("d1", 0L, "unrelated thing", "ORG", 1, 2, "token", "t"))      // no block hit
      .toDF("doc_id", "sent_id", "surface", "category", "occ", "start", "level", "scenario")
    val linked = graft.kg.Linker.link(mentions, dict)
      .select("surface", "entity_id").as[(String, Long)].collect().toMap
    assert(linked("acme corporation ltd") === 0L) // jaccard 2/3 + cat 0.5 ≥ 0.6
    assert(linked("zebra park") === 1L)
    assert(!linked.contains("unrelated thing"))
  }

  test("canonicalize merges entities sharing an alias") {
    val dict = Seq(
      (0L, "acme corp", Seq("acme corp", "acme"), "ORG"),
      (1L, "acme inc", Seq("acme inc", "acme"), "ORG"),   // shares "acme" with 0
      (2L, "zebra", Seq("zebra"), "ANG"))
      .toDF("entity_id", "canonical", "aliases", "category")
    val out = Canonicalize.canonicalize(spark, dict)
      .select("entity_id", "canonical_id").as[(Long, Long)].collect().toMap
    assert(out(0L) === 0L)
    assert(out(1L) === 0L) // merged into min id
    assert(out(2L) === 2L)
  }
}
