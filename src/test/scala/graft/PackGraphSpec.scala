package graft

import graft.datapipe.Pack
import graft.kg.PageRank
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sequence packing (concat-and-chunk) and fixed-point PageRank. */
class PackGraphSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("packing manifest: offsets are the exact prefix sum across bucket boundaries") {
    // doc_ids straddle several 4-wide buckets, with gaps and an empty doc
    val docs = Seq(
      (0L, "a b c"), (1L, "d e"), (3L, "f"),
      (4L, "g h i j"), (6L, "   "), (7L, "k l m"),
      (11L, "n"), (12L, "o p")).toDF("doc_id", "text")
    val m = Pack.concatChunks(spark, docs, "doc_id", "text",
      capacity = 4L, bucketWidth = 4L)
      .orderBy("doc_id").collect()

    // whitespace-only doc 6 tokenizes to one empty token? No: trim+split of
    // "   " is [""], size 1 — it packs as one token, like the oracle does
    val ids = m.map(_.getLong(0))
    assert(ids.toSeq === Seq(0L, 1L, 3L, 4L, 6L, 7L, 11L, 12L))
    // offsets = running sum of preceding n_tokens, across buckets {0,1,3}
    val n = m.map(_.getLong(1))
    val off = m.map(_.getLong(2))
    assert(off.head === 0L)
    (1 until m.length).foreach { i =>
      assert(off(i) === off(i - 1) + n(i - 1), s"offset chain broken at $i")
    }
    // chunk math: doc 4 has 4 tokens at offset 6 → spans chunks 1..2
    val d4 = m.find(_.getLong(0) == 4L).get
    assert(d4.getLong(3) === 1L && d4.getLong(4) === 2L && d4.getLong(5) === 2L)
  }

  test("string doc ids pack in native string order — no silent numeric cast") {
    // string order: doc-07 < doc-100 < doc-7 (a numeric cast would instead
    // null these out and crash, or collapse '07' and '7')
    val docs = Seq(("doc-07", "a b c"), ("doc-7", "d e"), ("doc-100", "f g h i"))
      .toDF("doc_id", "text")
    val m = Pack.concatChunks(spark, docs, "doc_id", "text", capacity = 4L)
      .orderBy("tok_offset").collect()
    assert(m.map(_.getString(0)).toSeq === Seq("doc-07", "doc-100", "doc-7"))
    assert(m.map(_.getLong(2)).toSeq === Seq(0L, 3L, 7L))
  }

  test("string-id packing matches a single-window replay at every rangeBuckets") {
    // ASCII ids with deliberately tangled lexicographic vs numeric order;
    // enough rows that frozenBounds actually samples and strides
    val docs = (0 until 500).map { i =>
      (s"k${i % 7}-$i", (0 until 1 + (i % 9)).map(j => s"w$j").mkString(" "))
    }.toDF("doc_id", "text")
    val sorted = docs.collect()
      .map(r => (r.getString(0), r.getString(1).split("\\s+").count(_.nonEmpty).toLong))
      .sortBy(_._1) // ASCII ids: JVM string order == Spark UTF8 binary order
    var acc = 0L
    val expected = sorted.map { case (id, n) => val o = acc; acc += n; (id, o) }.toMap
    for (rb <- Seq(1, 4, 64)) {
      val got = Pack.concatChunks(spark, docs, "doc_id", "text",
        capacity = 8L, rangeBuckets = rb).collect()
        .map(r => (r.getString(0), r.getLong(2))).toMap
      assert(got === expected, s"offsets diverge at rangeBuckets=$rb")
    }
  }

  test("integral bucket width is widened to cap the driver cumsum at maxBuckets") {
    // sparse huge-range ids: with the default width 4096 the id range
    // 0..10^12 implies ~2.4×10^8 candidate buckets — the guardrail must
    // widen the effective width so ≤ maxBuckets buckets cover the range
    val docs = Seq(0L, 999999999999L, 123456789L, 42L)
      .map(i => (i, "a b c")).toDF("doc_id", "text")
    val w = Pack.effectiveBucketWidth(docs, "doc_id", 4096L, maxBuckets = 1000L)
    assert(w === 1000000000L, "width must be ceil(range / maxBuckets)")
    // a caller width already coarse enough is respected verbatim
    val dense = (0L until 100L).map(i => (i, "a")).toDF("doc_id", "text")
    assert(Pack.effectiveBucketWidth(dense, "doc_id", 4096L, 1L << 20) === 4096L)
    // and the guardrailed path still produces exact offsets
    val m = Pack.concatChunks(spark, docs, "doc_id", "text",
      capacity = 4L, maxBuckets = 1000L)
      .orderBy("doc_id").collect()
    assert(m.map(_.getLong(2)).toSeq === Seq(0L, 3L, 6L, 9L))
  }

  test("a null doc_id fails loudly instead of corrupting the packing order") {
    val docs = Seq((Some("a"), "x y"), (None, "z")) // None → null id
      .toDF("doc_id", "text")
    val e = intercept[Exception] {
      Pack.concatChunks(spark, docs, "doc_id", "text").collect()
    }
    assert(e.getMessage.contains("non-null"))
  }

  test("packing chunk summary conserves tokens and fills every non-final chunk") {
    val docs = (0L until 50L).map(i =>
      (i, (0 until (3 + (i % 5)).toInt).map(j => s"t$j").mkString(" ")))
      .toDF("doc_id", "text")
    val manifest = Pack.concatChunks(spark, docs, "doc_id", "text",
      capacity = 16L, bucketWidth = 8L)
    val total = manifest.agg(sum("n_tokens")).head().getLong(0)
    val fill = Pack.chunkSummary(manifest, capacity = 16L)
      .orderBy("chunk_id").collect()
    assert(fill.map(_.getLong(2)).sum === total) // token conservation
    fill.dropRight(1).foreach(r =>
      assert(r.getLong(2) === 16L, s"chunk ${r.getLong(0)} not full"))
    assert(fill.last.getLong(2) <= 16L)
  }

  test("pagerank: uniform rank on a symmetric cycle, hub dominates a star") {
    // 4-cycle (symmetric): perfectly regular → every node keeps rank = scale
    val cyc = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))
    val cycEdges = cyc.toDF("src", "dst")
    val sym = cycEdges.union(cycEdges.select(col("dst").as("src"), col("src").as("dst")))
    val r = PageRank.run(spark, sym, iterations = 5).collect()
    assert(r.length === 4)
    r.foreach(row => assert(row.getLong(1) === 1000000L))

    // star: hub 0 — spokes 1..4 (symmetric): hub rank > spoke rank
    val star = (1L to 4L).flatMap(i => Seq((0L, i), (i, 0L))).toDF("src", "dst")
    val s = PageRank.run(spark, star, iterations = 5)
      .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
    assert(s(0L) > s(1L))
    assert((1L to 4L).map(s).distinct.size === 1) // spokes symmetric
    // the symmetric-graph fast path (skip the teleport-only left join) must
    // be bit-identical to the general path
    val fast = PageRank.run(spark, star, iterations = 5, allReceive = true)
      .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
    assert(fast === s)
  }

  test("packing fuzz: offsets tile the token axis for random corpora and parameters") {
    val r = new scala.util.Random(42)
    for (trial <- 0 until 4) {
      val n = 30 + r.nextInt(120)
      val docs = (0 until n).map { _ =>
        // sparse non-contiguous ids; some whitespace-heavy and empty-ish texts
        val id = r.nextInt(100000).toLong
        val toks = r.nextInt(40)
        (id, (0 until toks).map(j => s"t$j").mkString("  "))
      }.distinct.toDF("doc_id", "text").dropDuplicates("doc_id")
      val cap = 1L + r.nextInt(64)
      val bw = 1L + r.nextInt(5000)
      val m = Pack.concatChunks(spark, docs, "doc_id", "text", cap, bw)
        .orderBy("doc_id").collect()
      // offsets are the exact prefix sum in doc_id order, first offset 0
      var expect = 0L
      m.foreach { row =>
        assert(row.getLong(2) === expect,
          s"trial $trial (cap=$cap bw=$bw): offset broke at doc ${row.getLong(0)}")
        expect += row.getLong(1)
        assert(row.getLong(3) === row.getLong(2) / cap)
        assert(row.getLong(4) === (row.getLong(2) + row.getLong(1) - 1) / cap)
      }
      // chunk summary conserves every token
      val fill = Pack.chunkSummary(
        Pack.concatChunks(spark, docs, "doc_id", "text", cap, bw), cap)
      val filled = fill.agg(sum("tokens_filled")).head().getLong(0)
      assert(filled === expect, s"trial $trial: token conservation")
    }
  }

  test("cooccurrence fuzz: exact agreement with a scalar brute-force recompute") {
    import graft.kg.Cooccur
    val r = new scala.util.Random(7)
    val rows = (0 until 400).map { _ =>
      (r.nextInt(12).toLong, r.nextInt(6).toLong, (1 + r.nextInt(9)).toLong)
    }
    val got = Cooccur.edges(rows.toDF("doc_id", "sent_id", "canonical_id"),
        minLiftBp = 0L, minCount = 1L)
      .collect().map(x => ((x.getLong(0), x.getLong(1)),
        (x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5), x.getLong(6)))).toMap

    val sents = rows.distinct.groupBy(t => (t._1, t._2))
      .view.mapValues(_.map(_._3).toSet).toMap
    val nSent = sents.size.toLong
    val marg = sents.values.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val pairCnt = collection.mutable.Map[(Long, Long), Long]().withDefaultValue(0L)
    sents.values.foreach { es =>
      val v = es.toSeq.sorted
      for (i <- v.indices; j <- i + 1 until v.size) pairCnt((v(i), v(j))) += 1
    }
    val expect = pairCnt.map { case ((a, b), nab) =>
      val lift = (BigInt(nab) * nSent * 10000 / (BigInt(marg(a)) * marg(b))).toLong
      (a, b) -> ((nab, marg(a), marg(b), nSent, lift))
    }.toMap
    assert(got === expect)
  }

  test("empty inputs: packing, pagerank and cooccurrence all return empty, not crash") {
    val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Pack.concatChunks(spark, noDocs, "doc_id", "text").count() === 0)
    assert(Pack.chunkSummary(
      Pack.concatChunks(spark, noDocs, "doc_id", "text")).count() === 0)
    val noEdges = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(PageRank.run(spark, noEdges, iterations = 2).count() === 0)
    val noLinked = Seq.empty[(Long, Long, Long)].toDF("doc_id", "sent_id", "canonical_id")
    assert(graft.kg.Cooccur.edges(noLinked).count() === 0)
  }

  test("cooccurrence edges: exact lift arithmetic, min-count and lift filters") {
    import graft.kg.Cooccur
    // sentences: (d0,s0)={1,2}, (d0,s1)={1,2}, (d1,s0)={3,4}, (d1,s1)={4}
    // entity 2 appears twice in (d0,s0) (duplicate mention) → distinct dedups
    val linked = Seq(
      (0L, 0L, 1L), (0L, 0L, 2L), (0L, 0L, 2L),
      (0L, 1L, 1L), (0L, 1L, 2L),
      (1L, 0L, 3L), (1L, 0L, 4L),
      (1L, 1L, 4L)).toDF("doc_id", "sent_id", "canonical_id")
    val got = Cooccur.edges(linked).collect()
    // N=4; (1,2): n_ab=2, n_1=2, n_2=2 → lift = 2·4/(2·2) = 2.0 → 20000 bp
    // (3,4): n_ab=1 → dropped by minCount=2
    assert(got.length === 1)
    val r = got.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === (1L, 2L, 2L))
    assert((r.getLong(3), r.getLong(4), r.getLong(5)) === (2L, 2L, 4L))
    assert(r.getLong(6) === 20000L)
    // with minCount=1, (3,4) appears: lift = 1·4/(1·2) = 2.0 → 20000 bp
    val loose = Cooccur.edges(linked, minCount = 1L).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(6))).toSet
    assert(loose === Set((1L, 2L, 20000L), (3L, 4L, 20000L)))
    // raising the lift bar filters everything
    assert(Cooccur.edges(linked, minLiftBp = 20001L).collect().isEmpty)
  }

  test("pagerank: exact integer values match a scalar reference implementation") {
    // small irregular graph, directed — compare against a plain Scala replay
    // of the same integer recurrence
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 0L), (3L, 2L))
    val got = PageRank.run(spark, edges.toDF("src", "dst"), iterations = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val scale = 1000000L
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val out = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var rank = nodes.map(_ -> scale).toMap
    (1 to 5).foreach { _ =>
      val inc = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      edges.foreach { case (s, d) => inc(d) += rank(s) / out(s) }
      rank = nodes.map(v => v -> (150000L + 85L * inc(v) / 100L)).toMap
    }
    assert(got === rank)
  }

  test("overlap chunks: coverage, clipping, stride math vs scalar loop") {
    import org.apache.spark.sql.functions.col
    // sizes straddling every edge: 0 toks (drop), < size (one clipped chunk),
    // exactly size, size+1 (two chunks), long multi-chunk
    val docs = Seq(
      (0L, ""),
      (1L, (1 to 5).map(i => s"t$i").mkString(" ")),
      (2L, (1 to 8).map(i => s"t$i").mkString(" ")),
      (3L, (1 to 9).map(i => s"t$i").mkString(" ")),
      (4L, (1 to 50).map(i => s"t$i").mkString(" "))
    ).toDF("doc_id", "text")
    val (size, stride) = (8, 6)
    val got = Pack.overlapChunks(docs, "doc_id", "text", size, stride)
      .select("doc_id", "chunk_id", "start_tok", "end_tok", "n_toks")
      .as[(Long, Int, Int, Int, Int)].collect().toSet
    def scalar(id: Long, n: Int): Set[(Long, Int, Int, Int, Int)] = {
      if (n == 0) return Set.empty
      val lastIdx = math.max(0, (n - size + stride - 1) / stride)
      (0 to lastIdx).map { c =>
        val st = c * stride; val en = math.min(st + size, n)
        (id, c, st, en, en - st)
      }.toSet
    }
    val expected = Seq((0L, 0), (1L, 5), (2L, 8), (3L, 9), (4L, 50))
      .flatMap { case (id, n) => scalar(id, n) }.toSet
    assert(got === expected)
    // invariants: every token covered; last chunk ends at doc end; no start past end
    Seq((1L, 5), (2L, 8), (3L, 9), (4L, 50)).foreach { case (id, n) =>
      val cs = got.filter(_._1 == id).toSeq.sortBy(_._2)
      assert(cs.head._3 === 0 && cs.last._4 === n)
      assert(cs.forall(c => c._3 < n))
      val covered = cs.flatMap(c => c._3 until c._4).toSet
      assert(covered === (0 until n).toSet)
    }
    // doc 3 (size+1): exactly two chunks, second clipped to stride overlap
    assert(got.count(_._1 == 3L) === 2)
  }
}
