package graft

import graft.datapipe.InvertedIndex
import graft.kg.Triangles
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraphOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def triMap(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Triangles.perNodeCounts(edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap

  test("triangles: K4 — every node in 3 of the 4 triangles") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(triMap(k4) === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangles: square plus one diagonal — diagonal endpoints in 2") {
    val g = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
    assert(triMap(g) === Map(1L -> 2L, 3L -> 2L, 2L -> 1L, 4L -> 1L))
  }

  test("triangles: input normalization — reversed duplicates and self-loops collapse") {
    val messy = Seq((2L, 1L), (1L, 2L), (2L, 3L), (3L, 2L), (3L, 1L), (1L, 1L))
    assert(triMap(messy) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("triangles: triangle-free path graph yields no rows") {
    assert(triMap(Seq((1L, 2L), (2L, 3L), (3L, 4L))).isEmpty)
  }

  test("triangles: null endpoints are dropped, not propagated") {
    val g = Seq((Some(1L), Some(2L)), (Some(2L), Some(3L)), (Some(3L), Some(1L)),
      (Some(7L), None), (None, None)).toDF("src", "dst")
    val out = Triangles.perNodeCounts(g).as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("inverted index: query terms absent from the corpus contribute nothing") {
    val post = InvertedIndex.postings(tinyDocs, "doc_id", "text")
    val qs = Seq(("q", "zzz")).toDF("query_id", "term")
    assert(InvertedIndex.searchTopK(post, qs, nDocs = 3L, k = 5).count() === 0L)
  }

  private def lpSet(edges: Seq[(Long, Long)], minCommon: Long = 2L,
                    cap: Long = Long.MaxValue): Set[(Long, Long, Long, Long, Long, Long)] =
    graft.kg.LinkPredict.commonNeighbors(edges.toDF("src", "dst"), minCommon, cap)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet

  test("link prediction: square — both diagonals predicted with cn=2, jaccard=1") {
    val square = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    // (1,3) share {2,4}; (2,4) share {1,3}; all degrees 2 → 2·10⁴/(2+2−2)
    assert(lpSet(square) === Set((1L, 3L, 2L, 2L, 2L, 10000L),
      (2L, 4L, 2L, 2L, 2L, 10000L)))
  }

  test("link prediction: existing edges are never proposed") {
    // triangle: every wedge endpoint pair is already an edge
    assert(lpSet(Seq((1L, 2L), (2L, 3L), (1L, 3L))).isEmpty)
  }

  test("link prediction: pivot degree cap suppresses hub-mediated wedges") {
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L))
    val uncapped = lpSet(star, minCommon = 1L)
    assert(uncapped.map(t => (t._1, t._2)) === Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(lpSet(star, minCommon = 1L, cap = 2L).isEmpty) // hub deg 3 > cap
  }

  private val tinyDocs = Seq(
    (1L, "a a b"), (2L, "a c"), (3L, "b b c c")).toDF("doc_id", "text")

  test("inverted index: postings carry per-doc term frequency") {
    val post = InvertedIndex.postings(tinyDocs, "doc_id", "text")
      .as[(String, Long, Long)].collect().toSet
    assert(post === Set(("a", 1L, 2L), ("a", 2L, 1L), ("b", 1L, 1L),
      ("b", 3L, 2L), ("c", 2L, 1L), ("c", 3L, 2L)))
  }

  test("inverted index: integer tf·idf scores, rank by (score desc, doc_id), k bound") {
    val post = InvertedIndex.postings(tinyDocs, "doc_id", "text")
    val qs = Seq(("q1", "a"), ("q1", "b")).toDF("query_id", "term")
    // idf_bp(a)=idf_bp(b)=3*10000 div 2 = 15000:
    // doc1 = (2+1)*15000 = 45000; doc3 = 2*15000 = 30000; doc2 = 15000
    val out = InvertedIndex.searchTopK(post, qs, nDocs = 3L, k = 2)
      .as[(String, Long, Long, Int)].collect().toSet
    assert(out === Set(("q1", 1L, 45000L, 1), ("q1", 3L, 30000L, 2)))
  }

  test("inverted index: score ties break on doc_id; duplicate query terms score double") {
    val post = InvertedIndex.postings(
      Seq((1L, "x"), (2L, "x")).toDF("doc_id", "text"), "doc_id", "text")
    val qs = Seq(("t", "x"), ("d", "x"), ("d", "x")).toDF("query_id", "term")
    val out = InvertedIndex.searchTopK(post, qs, nDocs = 2L, k = 10)
      .as[(String, Long, Long, Int)].collect().toSet
    // idf_bp(x) = 2*10000 div 2 = 10000; tie → doc 1 before doc 2
    assert(out === Set(("t", 1L, 10000L, 1), ("t", 2L, 10000L, 2),
      ("d", 1L, 20000L, 1), ("d", 2L, 20000L, 2)))
  }

  test("salience graph shape: PageRank over a symmetrized star concentrates rank at the hub") {
    // star 0–{1,2,3,4}: hub salience must exceed every leaf, leaves equal
    val e = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)).toDF("src", "dst")
    val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
    val pr = kg.PageRank.run(spark, sym, iterations = 5, allReceive = true)
      .as[(Long, Long)].collect().toMap
    assert(pr.keySet === Set(0L, 1L, 2L, 3L, 4L))
    val leaves = (1L to 4L).map(pr)
    assert(leaves.distinct.size === 1 && pr(0L) > leaves.head)
  }

  // in-memory reference LPA: synchronous, most-frequent neighbor label,
  // ties to the smallest label — the exact semantics LabelProp.run claims
  private def lpaRef(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val sym = (edges ++ edges.map(_.swap)).filter(e => e._1 != e._2).distinct
    val adj = sym.groupBy(_._1).map { case (v, es) => v -> es.map(_._2) }
    var lab = adj.keys.map(v => v -> v).toMap
    for (_ <- 1 to iters)
      lab = adj.map { case (v, ns) =>
        val best = ns.map(lab).groupBy(identity).view
          .map { case (l, xs) => (l, xs.size) }.toSeq
          .minBy { case (l, c) => (-c, l) }._1
        v -> best
      }
    lab
  }

  private def lpaRun(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    kg.LabelProp.run(spark, edges.toDF("src", "dst"), iterations = iters)
      .as[(Long, Long)].collect().toMap

  test("LPA: two triangles with a bridge resolve to one community per triangle") {
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L))
    val out = lpaRun(g, 3)
    assert(out.keySet === (1L to 6L).toSet)
    assert(out === lpaRef(g, 3))
    // each triangle internally agrees
    assert(Set(out(1L), out(2L)).size === 1 && Set(out(5L), out(6L)).size === 1)
  }

  test("LPA: equals the in-memory reference on a seeded random graph, every iteration depth") {
    val r = new scala.util.Random(13)
    val edges = Seq.fill(160)((r.nextInt(60).toLong, r.nextInt(60).toLong))
      .filter(e => e._1 != e._2).distinct
    for (iters <- Seq(1, 2, 3))
      assert(lpaRun(edges, iters) === lpaRef(edges, iters), s"iters=$iters")
  }

  test("LPA: input normalization — reversed duplicates, self-loops, nulls dropped") {
    val g = Seq((Some(1L), Some(2L)), (Some(2L), Some(1L)), (Some(2L), Some(2L)),
      (Some(2L), Some(3L)), (Some(9L), None), (None, None)).toDF("src", "dst")
    val out = kg.LabelProp.run(spark, g, iterations = 2)
      .as[(Long, Long)].collect().toMap
    assert(out.keySet === Set(1L, 2L, 3L))
    assert(out === lpaRef(Seq((1L, 2L), (2L, 3L)), 2))
  }

  test("LPA: deterministic — two runs produce identical labelings") {
    val r = new scala.util.Random(29)
    val edges = Seq.fill(120)((r.nextInt(40).toLong, r.nextInt(40).toLong))
      .filter(e => e._1 != e._2)
    assert(lpaRun(edges, 3) === lpaRun(edges, 3))
  }

  private def kcoreRun(edges: Seq[(Long, Long)], k: Int, rounds: Int): Map[Long, Long] =
    graft.kg.KCore.run(spark, edges.toDF("src", "dst"), k, rounds)
      .as[(Long, Long)].collect().toMap

  /** In-memory reference peeling with the same fixed-round contract. */
  private def kcoreRef(edges: Seq[(Long, Long)], k: Int, rounds: Int): Map[Long, Long] = {
    val sym = edges.filter(e => e._1 != e._2)
      .flatMap(e => Seq(e, e.swap)).distinct
    var alive = sym.map(_._1).toSet
    for (_ <- 1 to rounds) {
      val deg = sym.filter(e => alive(e._1) && alive(e._2))
        .groupBy(_._1).view.mapValues(_.size.toLong).toMap
      alive = deg.filter(_._2 >= k).keySet
    }
    sym.filter(e => alive(e._1) && alive(e._2))
      .groupBy(_._1).view.mapValues(_.size.toLong).toMap
  }

  test("k-core: clique survives, pendant tail peels away round by round") {
    // K4 (a 3-core) with a tail 4–5–6: 6 peels in round 1, 5 in round 2,
    // and by round 3 only the clique remains with degree 3 each
    val g = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L))
    assert(kcoreRun(g, 3, 3) === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // one round already peels 5 and 6 (degree < 3 in the full graph), and
    // the reported degrees are INDUCED degrees — node 4 drops to 3
    assert(kcoreRun(g, 3, 1) === kcoreRef(g, 3, 1))
    assert(kcoreRef(g, 3, 1)(4L) === 3L)
  }

  test("k-core: equals the in-memory reference on a seeded random graph, every depth") {
    val r = new scala.util.Random(31)
    val edges = Seq.fill(260)((r.nextInt(40).toLong, r.nextInt(40).toLong))
      .filter(e => e._1 != e._2)
    for (rounds <- 1 to 4; k <- Seq(2, 4, 6))
      assert(kcoreRun(edges, k, rounds) === kcoreRef(edges, k, rounds),
        s"k=$k rounds=$rounds")
  }

  test("k-core: everything below k everywhere yields an empty result") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)) // max degree 2
    assert(kcoreRun(path, 3, 2) === Map.empty)
  }

  private def bfsRun(edges: Seq[(Long, Long)], seeds: Seq[Long],
                     maxRounds: Int = 8): Map[Long, Int] =
    graft.kg.Bfs.levels(spark, edges.toDF("src", "dst"), seeds.toDF("id"),
        maxRounds)
      .as[(Long, Int)].collect().toMap

  test("bfs: chain distances, isolated seed at level 0, early exit past the far end") {
    val g = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L))
    assert(bfsRun(g, Seq(1L, 9L)) ===
      Map(1L -> 0, 9L -> 0, 2L -> 1, 3L -> 2, 4L -> 3))
  }

  test("bfs: reversed edges traverse (symmetrized), cap bounds discovery, nearest seed wins") {
    val rev = Seq((2L, 1L), (3L, 2L), (4L, 3L), (5L, 4L)) // chain 1–5, all reversed
    assert(bfsRun(rev, Seq(1L), maxRounds = 2) === Map(1L -> 0, 2L -> 1, 3L -> 2))
    assert(bfsRun(rev, Seq(1L, 5L)) ===
      Map(1L -> 0, 5L -> 0, 2L -> 1, 4L -> 1, 3L -> 2))
  }

  test("bfs: a seed reachable from another seed stays level 0; cycles terminate") {
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    assert(bfsRun(cyc, Seq(1L, 2L)) === Map(1L -> 0, 2L -> 0, 3L -> 1))
  }
}
