package graft

import graft.datapipe.{Dedup, InvertedIndex, Similarity, TextQuality, Multimodal}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

class DatapipeSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** Synthetic doc set with planted near-duplicates. */
  lazy val docs = {
    val r = new Random(5)
    val vocab = (0 until 50).map(i => s"w$i")
    val base = (0 until 40).map { i =>
      (i.toLong, (0 until 30).map(_ => vocab(r.nextInt(vocab.length))).mkString(" "))
    }
    // plant near-dups: docs 100+i = doc i with one word changed
    val dups = (0 until 10).map { i =>
      val words = base(i)._2.split(" "); words(5) = "CHANGED"
      ((100 + i).toLong, words.mkString(" "))
    }
    (base ++ dups).toDF("doc_id", "text").cache()
  }

  test("exact dedup keeps one representative per fingerprint") {
    val withDup = docs.union(docs.limit(5)) // 5 exact duplicates
    val groups = Dedup.exactDuplicates(withDup, "doc_id", "text")
    assert(groups.count() === 5)
    val dedup = Dedup.exactDedup(withDup, "doc_id", "text")
    assert(dedup.count() === docs.count())
  }

  test("minhash LSH finds every planted near-dup pair that exact Jaccard confirms") {
    val exact = Dedup.ngramJaccardAllPairs(docs, "doc_id", "text", shingleN = 3, threshold = 0.6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.size >= 10) // the planted pairs
    val lsh = Dedup.minhashNearDuplicates(docs, "doc_id", "text",
      shingleN = 3, bands = 16, rowsPerBand = 2, threshold = 0.6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // LSH at 16 bands × 2 rows has >99.9% recall at j≥0.6; candidates are
    // verified with exact Jaccard so precision is exact
    assert(lsh === exact)
  }

  test("minhash signature similarity approximates Jaccard") {
    val a = "the quick brown fox jumps over the lazy dog again and again"
    val b = "the quick brown fox jumps over the lazy cat again and again"
    val sh = Dedup.shingleUdf(2)
    val mh = Dedup.minhashUdf(128)
    val df = Seq((1L, a), (2L, b)).toDF("id", "text")
      .withColumn("sh", sh(col("text"))).withColumn("sig", mh(col("sh")))
    val rows = df.select("sh", "sig").collect()
    val jac = {
      val sa = rows(0).getSeq[Long](0).toSet; val sb = rows(1).getSeq[Long](0).toSet
      sa.intersect(sb).size.toDouble / sa.union(sb).size
    }
    val est = {
      val s1 = rows(0).getSeq[Long](1); val s2 = rows(1).getSeq[Long](1)
      s1.zip(s2).count { case (x, y) => x == y }.toDouble / s1.length
    }
    assert(math.abs(jac - est) < 0.15, s"jaccard=$jac minhash-est=$est")
  }

  test("simhash banding guarantees recall for hamming distance ≤ 3") {
    // exact duplicates (distance 0) planted to make the guarantee zone non-empty
    val withExact = docs.union(
      docs.filter(col("doc_id") < 3).withColumn("doc_id", col("doc_id") + 200))
    val sims = withExact.select(col("doc_id"), Dedup.simhashUdf(col("text")).as("sim"))
      .as[(Long, Long)].collect()
    val closePairs = (for {
      i <- sims.indices; j <- i + 1 until sims.length
      if java.lang.Long.bitCount(sims(i)._2 ^ sims(j)._2) <= 3
    } yield (math.min(sims(i)._1, sims(j)._1), math.max(sims(i)._1, sims(j)._1))).toSet
    assert(closePairs.nonEmpty)
    val lsh = Dedup.simhashNearDuplicates(withExact, "doc_id", "text", maxDist = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // 4 bands × 16 bits: any pair within distance 3 shares at least one clean
    // band (pigeonhole) → LSH output must equal the exact close-pair set
    assert(lsh === closePairs)
  }

  test("brute-force cosine top-k equals naive scala computation") {
    val r = new Random(9)
    val vecs = (0 until 30).map(i => (i.toLong, Array.fill(8)(r.nextFloat() * 2 - 1)))
    val corpus = vecs.toDF("vec_id", "embedding")
    val queries = vecs.take(3).map { case (i, v) => (i, v) }.toDF("qid", "qvec")
    val got = Similarity.bruteForceTopK(corpus, "vec_id", "embedding", queries, "qid", "qvec", 5)
      .select("qid", "id", "rk").as[(Long, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      dot / (math.sqrt(a.map(x => x.toDouble * x).sum) * math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    for ((qid, qv) <- vecs.take(3)) {
      val expect = vecs.map { case (id, v) => (id, cos(qv, v)) }
        .sortBy { case (id, c) => (-c, id) }.take(5).map(_._1)
      assert(got(qid) === expect, s"qid=$qid")
    }
  }

  test("IVF top-k recall vs brute force ≥ 0.8 with nProbe=4/16 cells") {
    val r = new Random(13)
    val vecs = (0 until 200).map(i => (i.toLong, Array.fill(16)(r.nextFloat() * 2 - 1)))
    val corpus = vecs.toDF("vec_id", "embedding")
    val queries = vecs.take(5).toDF("qid", "qvec")
    val bf = Similarity.bruteForceTopK(corpus, "vec_id", "embedding", queries, "qid", "qvec", 10)
      .select("qid", "id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(corpus, "vec_id", "embedding", queries, "qid", "qvec", 10,
      nCells = 16, nProbe = 4)
      .select("qid", "id").as[(Long, Long)].collect().toSet
    val recall = bf.intersect(ivf).size.toDouble / bf.size
    assert(recall >= 0.8, s"IVF recall $recall")
  }

  test("IVF write-time artifact: cell-partitioned store serves probes via partition pruning") {
    val r = new Random(13)
    val vecs = (0 until 200).map(i => (i.toLong, Array.fill(16)(r.nextFloat() * 2 - 1)))
    val corpus = vecs.toDF("vec_id", "embedding")
    val cents = Similarity.centroids(corpus, "vec_id", "embedding", nCells = 8)
    val assigned = Similarity.assignCells(corpus, "embedding", cents)
    val store = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    assigned.write.mode("overwrite").partitionBy("cell").parquet(store)
    // a probe of 2 cells must read only those partition directories
    val probed = spark.read.parquet(store).filter(col("cell").isin(0, 1))
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan.take(400))
    val onDisk = probed.count()
    val expected = assigned.filter(col("cell").isin(0, 1)).count()
    assert(onDisk === expected && onDisk > 0 && onDisk < 200)
    // ivfTopKAssigned over the pruned store gives the same answer as inline
    val queries = vecs.take(3).toDF("qid", "qvec")
    val fromStore = Similarity.ivfTopKAssigned(
      spark.read.parquet(store), "vec_id", "embedding", queries, "qid", "qvec",
      k = 5, cents, nProbe = 4).select("qid", "id", "rk").as[(Long, Long, Int)].collect().toSet
    val inline = Similarity.ivfTopK(corpus, "vec_id", "embedding", queries, "qid", "qvec",
      k = 5, nCells = 8, nProbe = 4).select("qid", "id", "rk").as[(Long, Long, Int)].collect().toSet
    assert(fromStore === inline)
    def rm(f: java.io.File): Unit = { if (f.isDirectory) f.listFiles.foreach(rm); f.delete() }
    rm(new java.io.File(store))
  }

  test("PQ: codes replay a scalar argmin; ADC top-k recalls exact L2 neighbors") {
    val r = new Random(13)
    val vecs = (0 until 200).map(i => (i.toLong, Array.fill(16)(r.nextFloat() * 2 - 1)))
    val corpus = vecs.toDF("vec_id", "embedding")
    val queries = vecs.take(5).toDF("qid", "qvec")
    val books = Similarity.pqCodebooks(corpus, "vec_id", "embedding", m = 4, kSub = 8)
    assert(books.length === 32 && books.forall(_._3.length === 4))
    val enc = Similarity.pqEncode(corpus, "embedding", books)
    val codes = enc.select("vec_id", "codes").as[(Long, Seq[Int])].collect().toMap
    assert(codes.values.forall(c => c.length == 4 && c.forall(x => x >= 0 && x < 8)))
    // engine codes equal a scalar argmin with the same (dist, code) tie-break
    def sqd(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => (x.toDouble - y.toDouble) * (x.toDouble - y.toDouble) }.sum
    val bySub = books.groupBy(_._1).map { case (s, rows) => (s, rows.sortBy(_._2).map(_._3)) }
    for ((id, v) <- vecs.take(30)) {
      val expect = (0 until 4).map { s =>
        val sub = v.slice(s * 4, s * 4 + 4)
        bySub(s).zipWithIndex.map { case (c, i) => (i, sqd(c, sub)) }
          .minBy { case (i, d) => (d, i) }._1
      }
      assert(codes(id) === expect, s"id=$id")
    }
    // ADC ranking is deterministic and finds most true L2 neighbors
    def run() = Similarity.pqTopKEncoded(enc, "vec_id", queries, "qid", "qvec", 10, books)
      .select("qid", "id").as[(Long, Long)].collect().toSet
    val pq = run()
    assert(pq === run(), "ADC ranking not deterministic")
    val exact = vecs.take(5).flatMap { case (qid, qv) =>
      vecs.map { case (id, v) => (qid, id, sqd(qv, v)) }
        .sortBy { case (_, id, d) => (d, id) }.take(10).map(t => (t._1, t._2))
    }.toSet
    val recall = exact.intersect(pq).size.toDouble / exact.size
    assert(recall >= 0.5, s"PQ recall $recall vs exact L2")
  }

  test("quality features and langId") {
    val df = Seq(
      (1L, "the quick brown fox is on the hill with the dog"),
      (2L, "x x x x x x x x x x"),
      (3L, "der hund ist nicht hier und der mann ist da")).toDF("doc_id", "text")
    val q = TextQuality.withQualityFeatures(df).collect().map(r => r.getLong(0) -> r).toMap
    assert(q(1L).getAs[Double]("q_stopword_ratio") > 0.3)
    assert(q(2L).getAs[Double]("q_distinct_ratio") === 0.1)
    val langs = TextQuality.withLangId(df).select("doc_id", "lang_pred").as[(Long, String)].collect().toMap
    assert(langs(1L) === "en")
    assert(langs(3L) === "de")
  }

  test("repetition signals: top-gram and duplicate-gram fractions") {
    val df = Seq(
      (1L, "a b a b a"),   // 2-grams: ab ba ab ba → n=4, max=2, dist=2
      (2L, "x y z"),       // xy yz → n=2, max=1, dist=2
      (3L, "solo"),        // <2 tokens → excluded
      (4L, "")).toDF("doc_id", "text")
    val r = TextQuality.repetitionSignals(df, "doc_id", "text", n = 2)
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(!r.contains(3L) && !r.contains(4L))
    assert(r(1L).getAs[Long]("n_grams") === 4L)
    assert(r(1L).getAs[Long]("top_gram_bp") === 5000L)  // 2*10000 div 4
    assert(r(1L).getAs[Long]("dup_gram_bp") === 5000L)  // (4-2)*10000 div 4
    assert(r(2L).getAs[Long]("top_gram_bp") === 5000L)  // 1*10000 div 2
    assert(r(2L).getAs[Long]("dup_gram_bp") === 0L)
  }

  test("c4 filter: first-fail reason per rule, integer thresholds") {
    val longToks = (0 until 24).map(_ => "abcdefghijklmnopq").mkString(" ") // mean len 17
    val df = Seq(
      (1L, "too short"),
      (2L, "the " + longToks),                         // long_tokens (len 3 + 24×17 avg > 12)
      (3L, (0 until 25).map(i => s"kw$i").mkString(" ")), // no stopword hit
      (4L, "the " + (0 until 30).map(_ => "dup").mkString(" ")), // distinct 2/31 < 25%
      (5L, "the quick brown fox jumps over a lazy dog and runs to the green hill with its old friend every sunny day")
    ).toDF("doc_id", "text")
    val v = TextQuality.c4Filter(df, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(v(1L).getAs[String]("reason") === "too_short")
    assert(v(2L).getAs[String]("reason") === "long_tokens")
    assert(v(3L).getAs[String]("reason") === "no_stopwords")
    assert(v(4L).getAs[String]("reason") === "repetitive")
    assert(v(5L).getAs[String]("reason") === "ok")
    assert(v(5L).getAs[Int]("keep") === 1 && v(4L).getAs[Int]("keep") === 0)
  }

  test("c4 filter: null text is rejected, not silently kept") {
    // every arithmetic rule is NULL on null text; without the explicit
    // null branch the verdict would fall through to otherwise("ok")
    val df = Seq((1L, Option.empty[String]),
      (2L, Some("the quick brown fox jumps over a lazy dog and runs to the green hill with its old friend every sunny day")))
      .toDF("doc_id", "text")
    val v = TextQuality.c4Filter(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    assert(v(1L) === (("null_text", 0)))
    assert(v(2L)._2 === 1)
  }

  test("stratified hash sample: deterministic, salt-sensitive, near the rate") {
    val df = (0L until 2000L).map(i => (i, if (i % 4 == 0) "en" else "he"))
      .toDF("doc_id", "lang")
    val rate = when(col("lang") === "en", lit(500L)).otherwise(lit(2000L))
    val s1 = TextQuality.stratifiedHashSample(df, "doc_id", rate).select("doc_id").as[Long].collect().toSet
    val s2 = TextQuality.stratifiedHashSample(df, "doc_id", rate).select("doc_id").as[Long].collect().toSet
    assert(s1 === s2) // same salt+key → identical sample across runs
    val other = TextQuality.stratifiedHashSample(df, "doc_id", rate, salt = "other")
      .select("doc_id").as[Long].collect().toSet
    assert(other !== s1) // salt rotates the sample
    val en = s1.count(_ % 4 == 0); val he = s1.size - en
    assert(math.abs(en - 25.0) < 20, s"en sampled $en of 500 at 5%")
    assert(math.abs(he - 300.0) < 80, s"he sampled $he of 1500 at 20%")
  }

  test("exact-k hash sample: k per stratum, scalar replay, stable under growth") {
    val df = (0L until 900L).map(i => (i, if (i % 3 == 0) "en" else "he"))
      .toDF("doc_id", "lang")
    val got = TextQuality.topKByHash(df, "doc_id", Seq("lang"), k = 10)
      .select("lang", "doc_id", "sample_rank").as[(String, Long, Int)].collect()
    assert(got.count(_._1 == "en") === 10 && got.count(_._1 == "he") === 10)
    // scalar replay: rank by (hash48("sample:"+id), id) per stratum
    def expect(ids: Seq[Long]) = ids
      .sortBy(i => (Dedup.hash48(s"sample:$i"), i)).take(10).zipWithIndex
      .map { case (i, r) => (i, r + 1) }.toMap
    val en = expect((0L until 900L).filter(_ % 3 == 0))
    val he = expect((0L until 900L).filterNot(_ % 3 == 0))
    got.foreach { case (l, id, rk) =>
      assert((if (l == "en") en else he).get(id) === Some(rk), s"$l $id")
    }
    // repartition invariance
    val got7 = TextQuality.topKByHash(df.repartition(7), "doc_id", Seq("lang"), 10)
      .select("lang", "doc_id", "sample_rank").as[(String, Long, Int)].collect()
    assert(got7.toSet === got.toSet)
    // growth stability: doubling the corpus only displaces members whose
    // hash loses to a newcomer — the sample never grows past k and retains
    // every incumbent whose hash still ranks
    val grown = (0L until 1800L).map(i => (i, if (i % 3 == 0) "en" else "he"))
      .toDF("doc_id", "lang")
    val g = TextQuality.topKByHash(grown, "doc_id", Seq("lang"), 10)
      .select("lang", "doc_id").as[(String, Long)].collect().toSet
    assert(g.size === 20)
    val enG = expect((0L until 1800L).filter(_ % 3 == 0))
    assert(g.filter(_._1 == "en").map(_._2) === enG.keySet)
    // plan: partial top-k (WindowGroupLimit), not a full per-stratum sort
    val plan = TextQuality.topKByHash(df, "doc_id", Seq("lang"), 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(400))
  }

  test("near-dup clusters: LSH pairs close into components with min-id representative") {
    // plant two exact-duplicate families on top of the random docs
    val fam = docs.filter(col("doc_id") < 2)
    val withDups = docs
      .union(fam.withColumn("doc_id", col("doc_id") + 300))
      .union(fam.withColumn("doc_id", col("doc_id") + 400))
    val cl = Dedup.nearDupClusters(spark, withDups, "doc_id", "text", maxDist = 3)
      .as[(Long, Long, Long)].collect()
    val byDoc = cl.map(x => x._1 -> x).toMap
    // doc 0's family {0, 300, 400} must share cluster_rep 0
    assert(Seq(0L, 300L, 400L).forall(d => byDoc(d)._2 === 0L))
    assert(Seq(1L, 301L, 401L).forall(d => byDoc(d)._2 === 1L))
    assert(byDoc(0L)._3 >= 3L) // cluster_size counts the family
    // only clustered docs appear (every returned cluster has ≥ 2 members)
    assert(cl.groupBy(_._2).forall(_._2.length >= 2))
  }

  test("vocab top-k matches a naive count with deterministic tie-break") {
    val df = Seq((1L, "b a a c b a"), (2L, "c b d")).toDF("doc_id", "text")
    val got = TextQuality.vocabTopK(df, "text", k = 3)
      .select("tok", "n", "rk").as[(String, Long, Int)].collect().toList
    assert(got === List(("a", 3L, 1), ("b", 3L, 2), ("c", 2L, 3)))
  }

  test("cross-doc duplicated n-grams: shared fraction vs a naive count") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"), // 5-grams: [a..e], [b..z]
      (2L, "alpha beta gamma delta epsilon"),      // exactly [a..e] → shared
      (3L, "one two three four five six"),         // 2 grams, unshared
      (4L, "tiny doc"),                            // <5 toks → whole-text shingle
      (5L, "")).toDF("doc_id", "text")             // no tokens → excluded
    val r = Dedup.crossDocDupNgrams(df, "doc_id", "text", n = 5, minDocs = 2)
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(!r.contains(5L))
    assert(r(1L).getAs[Long]("n_grams") === 2L)
    assert(r(1L).getAs[Long]("shared_grams") === 1L)
    assert(r(1L).getAs[Long]("shared_bp") === 5000L)
    assert(r(2L).getAs[Long]("shared_bp") === 10000L)
    assert(r(3L).getAs[Long]("shared_grams") === 0L)
    assert(r(4L).getAs[Long]("n_grams") === 1L && r(4L).getAs[Long]("shared_grams") === 0L)
  }

  test("decontamination: overlap fraction against a reference set") {
    val ref = Seq((100L, "secret eval question one"),
                  (101L, "another held out probe")).toDF("doc_id", "text")
    val cand = Seq(
      (1L, "secret eval question one leaked here"),  // heavy overlap
      (2L, "totally clean original content words"),  // none
      (3L, "hi")).toDF("doc_id", "text")             // <3 toks → whole-text shingle, no match
    val r = Dedup.contaminationCheck(cand, ref, "doc_id", "text", n = 3, flagBp = 1000)
      .collect().map(x => x.getLong(0) -> x).toMap
    // doc1: 4 distinct 3-grams, 2 of them ("secret eval question",
    // "eval question one") are in ref
    assert(r(1L).getAs[Long]("n_grams") === 4L)
    assert(r(1L).getAs[Long]("contaminated_grams") === 2L)
    assert(r(1L).getAs[Long]("contaminated_bp") === 5000L)
    assert(r(1L).getAs[Int]("flagged") === 1)
    assert(r(2L).getAs[Long]("contaminated_grams") === 0L && r(2L).getAs[Int]("flagged") === 0)
    assert(r(3L).getAs[Long]("contaminated_grams") === 0L)
  }

  test("duplicate-span removal cuts exactly the covered tokens") {
    val df = Seq(
      (1L, "aa bb cc dd ee unique1 unique2 unique3"), // shares 5-gram aa..ee with doc 2
      (2L, "prefix0 aa bb cc dd ee suffix9"),
      (3L, "no shared grams in this document at all"),
      (4L, "tiny")).toDF("doc_id", "text")
    val r = Dedup.removeDuplicateSpans(df, "doc_id", "text", n = 5, minDocs = 2)
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getAs[String]("clean_text") === "unique1 unique2 unique3")
    assert(r(1L).getAs[Int]("n_removed") === 5)
    assert(r(2L).getAs[String]("clean_text") === "prefix0 suffix9")
    assert(r(2L).getAs[Int]("n_removed") === 5)
    assert(r(3L).getAs[Int]("n_removed") === 0)
    assert(r(3L).getAs[String]("clean_text") === "no shared grams in this document at all")
    assert(r(4L).getAs[String]("clean_text") === "tiny") // <n tokens untouched
  }

  test("pii: counts, replacement order, and redaction fingerprint") {
    val df = Seq(
      (1L, "mail a.b-c@x.co and 10.0.0.1 acct 123456789 end"),
      (2L, "no pii here 123 1.2 short"),
      (3L, "two mails u@v.org w@z.net")).toDF("doc_id", "text")
    val r = TextQuality.redactPii(df, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getAs[Int]("n_emails") === 1)
    assert(r(1L).getAs[Int]("n_ipv4") === 1)
    assert(r(1L).getAs[Int]("n_long_ids") === 1)
    assert(r(2L).getAs[Int]("n_emails") === 0 && r(2L).getAs[Int]("n_ipv4") === 0
      && r(2L).getAs[Int]("n_long_ids") === 0)
    assert(r(3L).getAs[Int]("n_emails") === 2)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    assert(r(1L).getAs[String]("redacted_fp") ===
      md5hex("mail <EMAIL> and <IP> acct <ID> end"))
    assert(r(2L).getAs[String]("redacted_fp") === md5hex("no pii here 123 1.2 short"))
  }

  test("pii: counts reflect what each pass actually replaced (sequential text)") {
    // the IP has no \b boundary until <EMAIL> is substituted in; a count on
    // the ORIGINAL text would claim n_ipv4 = 0 while the fingerprint shows
    // an <IP> redaction
    val df = Seq((1L, "a@b.com192.168.4.7")).toDF("doc_id", "text")
    val r = TextQuality.redactPii(df, "doc_id", "text").collect().head
    assert(r.getAs[Int]("n_emails") === 1)
    assert(r.getAs[Int]("n_ipv4") === 1)
    assert(r.getAs[Int]("n_long_ids") === 0)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    assert(r.getAs[String]("redacted_fp") === md5hex("<EMAIL><IP>"))
  }

  test("near-dup clusters work with STRING doc ids") {
    val base = "the quick brown fox jumps over a lazy dog and runs far away today"
    val docs = Seq(
      ("d-b", base), ("d-a", base), ("d-c", base + " extra"),
      ("u-1", "completely different words about gardens and rivers flowing north"))
      .toDF("doc_id", "text")
    val r = Dedup.nearDupClusters(spark, docs, "doc_id", "text", maxDist = 3)
      .collect().map(x => x.getString(0) -> (x.getString(1), x.getLong(2))).toMap
    // the three near-identical docs cluster under the lexicographic min id
    assert(r("d-a")._1 === "d-a" && r("d-b")._1 === "d-a")
    assert(r("d-a")._2 >= 2L)
  }

  test("mixture plan: a zero-token stratum keeps all docs with an honest planned_tokens of 0") {
    import graft.datapipe.Mix
    val docs = Seq(
      (1L, "ten little words make up this very ordinary doc here", "a"),
      (2L, null.asInstanceOf[String], "z"),
      (3L, null.asInstanceOf[String], "z")).toDF("doc_id", "text", "lang")
    val p = Mix.plan(docs, "lang", "text", Map("a" -> 5000L, "z" -> 5000L), 100L)
      .collect().map(r => r.getString(0) -> r).toMap
    val z = p("z")
    assert(z.getLong(2) === 0L)     // n_tokens aggregates null texts to 0
    assert(z.getLong(5) === 10000L) // explicit keep-all, not a div-by-zero null
    assert(z.getLong(6) === 0L)     // planned tokens honest, not NULL
    assert(z.getInt(7) === 1)       // flagged capped (desired > supply)
  }

  test("token-length percentiles: rank-select semantics and tie invariance") {
    // group g: counts 1..10 → p50 = 5 (rk*100 >= n*50 at rk=5), p90 = 9, p99 = 10
    val g = (1 to 10).map(i => ("g", (1 to i).map(_ => "w").mkString(" ")))
    // group t: all equal counts (ties) → every percentile is 3
    val t = (1 to 4).map(_ => ("t", "a b c"))
    val df = (g ++ t).toDF("lang", "text")
    val r = TextQuality.tokenLenPercentiles(df, "text", "lang")
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("g").getAs[Long]("p50") === 5L)
    assert(r("g").getAs[Long]("p90") === 9L)
    assert(r("g").getAs[Long]("p99") === 10L)
    assert(r("g").getAs[Long]("n_docs") === 10L)
    assert(Seq("p50", "p90", "p99").forall(p => r("t").getAs[Long](p) === 3L))
  }

  test("token counting: whitespace and BPE-ish") {
    val df = Seq((1L, "hello, world! 42 times")).toDF("doc_id", "text")
    val n = df.select(TextQuality.tokenCount(col("text"))).as[Int].head()
    assert(n === 4)
    val b = df.select(TextQuality.bpeTokenCount("text")).as[Int].head()
    // hello , world ! 42 times → 6
    assert(b === 6)
  }

  test("multimodal: batched feature extraction preserves rows and shapes") {
    val docs = spark.createDataset(graft.fixtures.Fixtures.inputDocs(50)).toDF()
    val media = Multimodal.syntheticMedia(spark, docs)
    val nMedia = media.count()
    assert(nMedia > 0)
    val feats = Multimodal.extractFeatures(spark, media, batchSize = 8).collect()
    assert(feats.length === nMedia)
    feats.foreach { f =>
      assert(f.feature.length === 16)
      assert(math.abs(f.feature.sum - 1.0f) < 1e-3, "histogram should normalize to 1")
    }
  }

  test("multimodal: features are parsed from payload header bytes, not catalog") {
    val docs = spark.createDataset(graft.fixtures.Fixtures.inputDocs(80)).toDF()
    val media = Multimodal.syntheticMedia(spark, docs)
    // catalog LIES below (all fields zeroed/renamed) — parsed output must
    // still match what the payload header encodes
    val catalog = media.collect()
    val lied = spark.createDataset(catalog.map(m =>
      m.copy(modality = "bogus", width = -1, height = -1, durationMs = -1)))(
      media.encoder)
    val feats = Multimodal.extractFeatures(spark, lied).collect()
      .map(f => f.media_ref -> f).toMap
    assert(catalog.length > 0)
    catalog.foreach { m =>
      val f = feats(m.media_ref)
      assert(f.modality === m.modality, s"modality for ${m.media_ref}")
      assert(f.width === m.width); assert(f.height === m.height)
      val expFrames = if (m.modality == "video") Multimodal.framePlan(m.durationMs) else 1
      assert(f.frames === expFrames)
    }
    // the rule emits all three modalities over enough refs
    assert(catalog.map(_.modality).distinct.sorted.toSeq === Seq("audio", "image", "video"))
  }

  test("multimodal: header round-trip and corrupted payloads degrade, not crash") {
    val h = Multimodal.writeHeader("video", 320, 200, 7500)
    assert(Multimodal.parseHeader(h ++ Array[Byte](1, 2, 3)) ===
      Some(Multimodal.MediaHeader("video", 320, 200, 7500)))
    // corrupt: bad magic, truncated, null, unknown modality code
    val badMagic = h.clone(); badMagic(0) = 'X'
    assert(Multimodal.parseHeader(badMagic).isEmpty)
    assert(Multimodal.parseHeader(h.take(10)).isEmpty)
    assert(Multimodal.parseHeader(null).isEmpty)
    val badCode = h.clone(); badCode(5) = 9
    assert(Multimodal.parseHeader(badCode).isEmpty)
    val rows = Seq(
      Multimodal.MediaRow("d1", "r1", "image", 0, 0, 0, badMagic ++ Array[Byte](5, 5)),
      Multimodal.MediaRow("d2", "r2", "image", 0, 0, 0, Array[Byte](1)),
      Multimodal.MediaRow("d3", "r3", "image", 0, 0, 0, null))
    val out = Multimodal.extractFeatures(spark, spark.createDataset(rows)).collect()
      .sortBy(_.doc_id)
    assert(out.length === 3)
    out.foreach { f => assert(f.modality === "unknown"); assert(f.frames === 0) }
    assert(out(0).feature.sum > 0f) // histogram still computed over raw bytes
  }

  test("multimodal: PPM and WAV codecs round-trip and decode exact content") {
    // PPM: hand-built 2×2 RGB raster decodes to its exact byte sum
    val px = Array[Byte](0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
    val ppm = Multimodal.encodePpm(2, 2, px)
    val f = Multimodal.parsePpm(ppm, 0).get
    assert(f.w === 2 && f.h === 2)
    assert(ppm.slice(f.pixelOffset, f.nextOffset).toSeq === px.toSeq)
    // truncated raster / bad magic / bad maxval all reject
    assert(Multimodal.parsePpm(ppm.dropRight(1), 0).isEmpty)
    assert(Multimodal.parsePpm("P5\n2 2\n255\n".getBytes ++ px, 0).isEmpty)
    assert(Multimodal.parsePpm("P6\n2 2\n127\n".getBytes ++ px, 0).isEmpty)
    // WAV: 16-bit samples round-trip through the RIFF chunk walk
    val smp = Array[Short](0, 100, -100, 32767, -32768)
    val wav = Multimodal.encodeWav(smp)
    val w = Multimodal.parseWav(wav, 0).get
    assert(w.sampleRate === 8000 && w.nSamples === 5)
    val bb = java.nio.ByteBuffer.wrap(wav).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert((0 until 5).map(i => bb.getShort(w.sampleOffset + 2 * i)) === smp.toSeq)
    assert(Multimodal.parseWav(wav.dropRight(1), 0).isEmpty) // data chunk short
    assert(Multimodal.parseWav("RIFX".getBytes ++ wav.drop(4), 0).isEmpty)
  }

  test("multimodal: features come from DECODED pixels/samples, exact integers") {
    val docs = spark.createDataset(graft.fixtures.Fixtures.inputDocs(80)).toDF()
    val media = Multimodal.syntheticMedia(spark, docs).collect()
    val feats = Multimodal.extractFeatures(spark,
      spark.createDataset(media.toSeq)(Multimodal.syntheticMedia(spark, docs).encoder))
      .collect().map(f => f.media_ref -> f).toMap
    assert(media.map(_.modality).distinct.sorted.toSeq === Seq("audio", "image", "video"))
    media.foreach { m =>
      val f = feats(m.media_ref)
      assert(f.decoded, s"${m.media_ref} (${m.modality}) must decode")
      // closed-form replay of the synthetic body (same rule as the oracle)
      def hv(k: Int) = math.max(
        "0123456789abcdef".indexOf(m.media_ref.charAt(m.media_ref.length - k)), 0)
      val seed = 16 * hv(2) + hv(3)
      if (m.modality == "audio") {
        val n = math.min(2048, m.durationMs)
        val exp = (0 until n).map(i =>
          math.abs(((i * (7 + hv(3)) + hv(4)) % 65536) - 32768).toLong).sum
        assert(f.samp_abs_sum === exp && f.n_samp === n.toLong && f.px_sum === 0L)
      } else {
        val perFrame = Multimodal.thumbDim(m.width) * Multimodal.thumbDim(m.height) * 3
        val frames = if (m.modality == "video") Multimodal.framePlan(m.durationMs) else 1
        val exp = (0 until frames).map(fr =>
          (0 until perFrame).map(i => ((3 * i + seed + fr) % 256).toLong).sum).sum
        assert(f.px_sum === exp, s"${m.media_ref} px_sum")
        assert(f.n_px === frames.toLong * perFrame && f.frames === frames)
      }
    }
  }

  test("multimodal: corrupt BODY degrades to decoded=false, header intact") {
    // header parses (image) but the body is not a PPM → degrade, not crash
    val hdr = Multimodal.writeHeader("image", 64, 64, 0)
    val junk = Array.tabulate[Byte](100)(i => (i * 37).toByte)
    // and a video whose SECOND frame is truncated → whole decode degrades
    val px = Array.tabulate[Byte](4 * 4 * 3)(_.toByte)
    val goodFrame = Multimodal.encodePpm(4, 4, px)
    val vhdr = Multimodal.writeHeader("video", 32, 32, 2000)
    val rows = Seq(
      Multimodal.MediaRow("d1", "r1", "image", 0, 0, 0, hdr ++ junk),
      Multimodal.MediaRow("d2", "r2", "video", 0, 0, 0,
        vhdr ++ goodFrame ++ goodFrame.dropRight(5)))
    val out = Multimodal.extractFeatures(spark, spark.createDataset(rows))
      .collect().sortBy(_.doc_id)
    assert(out(0).modality === "image" && !out(0).decoded)
    assert(out(0).px_sum === 0L && out(0).feature.sum > 0f) // raw-byte fallback
    assert(out(1).modality === "video" && !out(1).decoded)
  }

  test("multimodal resize: nearest-neighbor scalar kernel is exact") {
    // 4×2 source with pixel value = linear index; downscale to 2×2:
    // dst (r,c) samples src y = r·2//2 = r, x = c·4//2 = 2c
    val px = Array.tabulate[Byte](4 * 2 * 3)(_.toByte)
    val ppm = Multimodal.encodePpm(4, 2, px)
    val f = Multimodal.parsePpm(ppm, 0).get
    val out = Multimodal.resizeFrame(ppm, f, 2, 2)
    def src(y: Int, x: Int) = (0 until 3).map(ch => px((y * 4 + x) * 3 + ch))
    assert(out.toSeq === (for { r <- 0 until 2; c <- 0 until 2; b <- src(r, 2 * c) } yield b))
    // identity resize is byte-exact; upscale replicates nearest pixels
    assert(Multimodal.resizeFrame(ppm, f, 4, 2).toSeq === px.toSeq)
    val up = Multimodal.resizeFrame(ppm, f, 8, 2)
    assert(up.length === 8 * 2 * 3)
    (0 until 8).foreach(c => assert(
      up.slice(c * 3, c * 3 + 3).toSeq === src(0, c * 4 / 8), s"col $c"))
  }

  test("multimodal resize: payload→payload transform re-decodes; degrade passes through") {
    val docs = spark.createDataset(graft.fixtures.Fixtures.inputDocs(80)).toDF()
    val media = Multimodal.syntheticMedia(spark, docs)
    val resized = Multimodal.resizeVisual(spark, media, 16, 12)
    val feats = Multimodal.extractFeatures(spark, resized).collect()
      .map(f => f.media_ref -> f).toMap
    val catalog = media.collect()
    catalog.foreach { m =>
      val f = feats(m.media_ref)
      assert(f.decoded, s"${m.media_ref} must still decode after resize")
      def hv(k: Int) = math.max(
        "0123456789abcdef".indexOf(m.media_ref.charAt(m.media_ref.length - k)), 0)
      val seed = 16 * hv(2) + hv(3)
      if (m.modality == "audio") {
        // audio passes through bit-exact: same samp sum as the direct decode
        assert(f.n_samp === math.min(2048, m.durationMs).toLong && f.px_sum === 0L)
      } else {
        val tw = Multimodal.thumbDim(m.width); val th = Multimodal.thumbDim(m.height)
        val frames = if (m.modality == "video") Multimodal.framePlan(m.durationMs) else 1
        assert(f.width === 16 && f.height === 12 && f.frames === frames)
        // closed form: resized pixel (r,c,ch) = synthetic pixel at the
        // floor-sampled source index — the oracle's replay rule
        val exp = (0 until frames).map { fr =>
          (for { r <- 0 until 12; c <- 0 until 16; ch <- 0 until 3 } yield {
            val j = ((r * th / 12) * tw + (c * tw / 16)) * 3 + ch
            ((3 * j + seed + fr) % 256).toLong
          }).sum
        }.sum
        assert(f.px_sum === exp, s"${m.media_ref} resized px_sum")
        assert(f.n_px === frames.toLong * 16 * 12 * 3)
      }
    }
    // corrupt visual body: resize must pass the payload through BIT-EXACT
    val hdr = Multimodal.writeHeader("image", 64, 64, 0)
    val junk = Array.tabulate[Byte](100)(i => (i * 37).toByte)
    val rows = Seq(Multimodal.MediaRow("d1", "r1", "image", 64, 64, 0, hdr ++ junk))
    val passthrough = Multimodal.resizeVisual(spark,
      spark.createDataset(rows)(media.encoder), 16, 12).collect().head
    assert(passthrough.content.toSeq === (hdr ++ junk).toSeq)
  }

  test("multimodal frame-sample: plan, refs, and sampled payloads re-decode exactly") {
    // the plan: evenly spaced, distinct, never out of range
    assert(Multimodal.sampleIndices(1, 4) === Seq(0))
    assert(Multimodal.sampleIndices(2, 4) === Seq(0, 1))
    assert(Multimodal.sampleIndices(8, 4) === Seq(0, 2, 4, 6))
    assert(Multimodal.sampleIndices(9, 4) === Seq(0, 2, 4, 6))
    assert(Multimodal.sampleIndices(3, 5) === Seq(0, 1, 2))
    val docs = spark.createDataset(graft.fixtures.Fixtures.inputDocs(80)).toDF()
    val media = Multimodal.syntheticMedia(spark, docs)
    val sampled = Multimodal.sampleFrames(spark, media, k = 4)
    val feats = Multimodal.extractFeatures(spark, sampled).collect()
    val catalog = media.collect()
    val byRef = feats.groupBy(f => f.media_ref.takeWhile(_ != '#'))
    catalog.foreach { m =>
      def hv(k: Int) = math.max(
        "0123456789abcdef".indexOf(m.media_ref.charAt(m.media_ref.length - k)), 0)
      val seed = 16 * hv(2) + hv(3)
      if (m.modality == "audio") assert(!byRef.contains(m.media_ref))
      else {
        val frames = if (m.modality == "video") Multimodal.framePlan(m.durationMs) else 1
        val idxs = Multimodal.sampleIndices(frames, 4)
        val got = byRef(m.media_ref)
          .sortBy(f => f.media_ref.drop(f.media_ref.indexOf("#f") + 2).toInt)
        assert(got.map(_.media_ref).toSeq ===
          idxs.sorted.map(i => s"${m.media_ref}#f$i"))
        val perFrame = Multimodal.thumbDim(m.width) * Multimodal.thumbDim(m.height) * 3
        got.foreach { f =>
          val fi = f.media_ref.drop(f.media_ref.indexOf("#f") + 2).toInt
          assert(f.modality === "image" && f.decoded && f.frames === 1)
          val exp = (0 until perFrame).map(i => ((3 * i + seed + fi) % 256).toLong).sum
          assert(f.px_sum === exp, s"${f.media_ref} sampled px_sum")
        }
      }
    }
    // sampled frames COMPOSE with resize: resize the sampled stills and they
    // still decode with the resized geometry
    val rs = Multimodal.extractFeatures(spark,
      Multimodal.resizeVisual(spark, sampled, 8, 6)).collect()
    assert(rs.nonEmpty && rs.forall(f => f.decoded && f.n_px === 8L * 6 * 3))
  }

  test("BPE trainer: iterated merges match a reference implementation, incl. overlap semantics") {
    // 'aaa' stresses both pinned semantics: pair counting includes
    // overlapping adjacents ((a,a) counts twice in aaa) and merge
    // application is left-to-right non-overlapping (aaa -> [aa, a])
    val docs = Seq(("d1", "aaa aaab baaa aa"), ("d2", "aaa aaa xyz"), ("d3", "b aa ab"))
      .toDF("doc_id", "text")
    val merges = TextQuality.bpeTrain(docs, "text", nMerges = 3)
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    // hand-derived (and replayed by the DuckDB oracle in the prototype):
    // (a,a)x12 -> aa; then (aa,a)x5 -> aaa; then the (cnt, a, b) tie-break
    assert(merges.toSeq === Seq(
      (1, "a", "a", "aa", 12L), (2, "aa", "a", "aaa", 5L), (3, "a", "b", "ab", 1L)))
    // merged tokens participate in later merges (step 2 consumes step 1's aa)
    assert(merges(1)._2 === merges(0)._4)
    // segmentation with the trained merges: d1 = [aaa][aaa b][b aaa][aa] = 6,
    // d2 = [aaa][aaa][x y z] = 5, d3 = [b][aa][ab] = 3
    val segs = TextQuality.bpeSegmentCount(docs, "text",
      merges.map(m => (m._2, m._3)).toSeq)
      .orderBy("doc_id").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(segs.toSeq === Seq(("d1", 6L), ("d2", 5L), ("d3", 3L)))
    // fewer-merges stop: corpus fully merged before nMerges rounds ends early
    val tiny = Seq(("t", "ab ab")).toDF("doc_id", "text")
    val m2 = TextQuality.bpeTrain(tiny, "text", nMerges = 5).collect()
    assert(m2.length === 1 && m2(0).getString(3) === "ab")
  }

  test("rolling hash and fingerprint are deterministic and whitespace-insensitive") {
    val df = Seq((1L, "Hello   World"), (2L, "hello world")).toDF("doc_id", "text")
    val fps = df.select(TextQuality.fingerprint(col("text"))).as[String].collect()
    assert(fps(0) === fps(1))
  }

  test("mixture plan: exact rates hit the budget, oversubscribed strata cap") {
    import graft.datapipe.Mix
    // strata: "a" has 10 docs × 10 tokens = 100; "b" has 2 docs × 10 = 20;
    // "c" exists in the corpus but carries no weight → excluded
    def mk(lang: String, n: Int, off: Int) = (0 until n).map(i =>
      ((off + i).toLong, (1 to 10).map(j => s"t$j").mkString(" "), lang))
    val docs = (mk("a", 10, 0) ++ mk("b", 2, 100) ++ mk("c", 3, 200))
      .toDF("doc_id", "text", "lang")
    // budget 80 tokens: a @ 5000bp → 40 desired (rate 4000bp, planned 40);
    // b @ 5000bp → 40 desired > 20 supply → capped at 10000bp
    val p = Mix.plan(docs, "lang", "text", Map("a" -> 5000L, "b" -> 5000L), 80L)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(p.keySet === Set("a", "b"))
    val a = p("a"); val b = p("b")
    assert((a.getLong(2), a.getLong(4), a.getLong(5), a.getLong(6), a.getInt(7))
      === ((100L, 40L, 4000L, 40L, 0)))
    assert((b.getLong(2), b.getLong(4), b.getLong(5), b.getLong(6), b.getInt(7))
      === ((20L, 40L, 10000L, 20L, 1)))
    // apply: capped stratum keeps everything; unplanned stratum drops out
    val kept = Mix.apply(docs, "doc_id", "lang",
      Mix.plan(docs, "lang", "text", Map("a" -> 5000L, "b" -> 5000L), 80L))
      .select("doc_id", "lang").as[(Long, String)].collect()
    assert(kept.filter(_._2 == "b").map(_._1).toSet === Set(100L, 101L))
    assert(!kept.exists(_._2 == "c"))
    val aKept = kept.count(_._2 == "a")
    assert(aKept > 0 && aKept < 10) // the 40% rate actually sampled
  }

  test("semantic dedup: smallest-id domination within cells, oversized cells pass through") {
    // cell 0: ids 1,2,3 where 1~2 (cos=1), 3 orthogonal; cell 1: ids 4,5 near-dups
    val assigned = Seq(
      (1L, Seq(1f, 0f, 0f), 0), (2L, Seq(2f, 0f, 0f), 0), (3L, Seq(0f, 1f, 0f), 0),
      (4L, Seq(0f, 0f, 1f), 1), (5L, Seq(0f, 0f, 3f), 1),
      (6L, Seq(1f, 1f, 0f), 2) // singleton cell: no pairs, kept
    ).toDF("id", "vec", "cell")
    val out = Similarity.semanticDedup(assigned, "id", "vec", threshold = 0.9)
      .select("id", "kept").as[(Long, Boolean)].collect().toMap
    assert(out === Map(1L -> true, 2L -> false, 3L -> true, 4L -> true, 5L -> false, 6L -> true))
    // cap: a 3-row cell with maxCell=2 is skipped entirely — all kept
    val capped = Similarity.semanticDedup(assigned.filter(col("cell") === 0), "id", "vec",
      threshold = 0.9, maxCell = 2)
      .select("id", "kept").as[(Long, Boolean)].collect().toMap
    assert(capped.values.forall(identity) && capped.size === 3)
    // chain semantics: domination is by ANY smaller-id neighbor, including
    // one that was itself dropped — 1~2, 2~3, 1!~3 (35° apart each) drops
    // BOTH 2 and 3 (one-pass rule, more aggressive than sequential greedy)
    val chain = Seq(
      (1L, Seq(1f, 0f), 0),
      (2L, Seq(0.8192f, 0.5736f), 0),  // 35° from 1
      (3L, Seq(0.342f, 0.9397f), 0)    // 70° from 1, 35° from 2
    ).toDF("id", "vec", "cell")
    val chainOut = Similarity.semanticDedup(chain, "id", "vec", threshold = 0.75)
      .select("id", "kept").as[(Long, Boolean)].collect().toMap
    assert(chainOut(1L) && !chainOut(2L) && !chainOut(3L))
  }

  test("recallAtK: per-query integer per-mille against a known overlap") {
    val exact = Seq((1L, 10L), (1L, 11L), (1L, 12L),
                    (2L, 20L), (2L, 21L), (2L, 22L)).toDF("qid", "id")
    val approx = Seq((1L, 10L), (1L, 11L), (1L, 99L),   // 2/3 for qid 1
                     (2L, 30L), (2L, 31L), (2L, 32L)).toDF("qid", "id") // 0/3 for qid 2
    val got = Similarity.recallAtK(approx, exact)
      .select("qid", "hits", "k", "recall_permille")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toList
    assert(got === List((1L, 2L, 3L, 666L), (2L, 0L, 3L, 0L)))
  }

  test("bpe merge pairs: counts weighted by word frequency, deterministic rank") {
    val df = Seq(
      (0L, "ab ab abc"),  // ab:2, abc:1 -> pairs ab:3, bc:1
      (1L, "ab x")        // ab:1 (x is single-char, no pairs) -> ab total 4
    ).toDF("doc_id", "text")
    val out = TextQuality.bpeMergePairs(df, "text", k = 10)
      .select("pair", "cnt", "rk").as[(String, Long, Int)].collect().toList
    assert(out === List(("ab", 4L, 1), ("bc", 1L, 2)))
  }

  test("winnowing: selections match scalar algorithm; shared-run guarantee holds") {
    val r = new Random(23)
    val vocab = (0 until 40).map(i => s"v$i")
    def sentence(n: Int) = (0 until n).map(_ => vocab(r.nextInt(vocab.length))).mkString(" ")
    val shared = sentence(8) // >= w+k-1 = 6 tokens -> guarantee applies
    val docs = Seq(
      (0L, s"${sentence(12)} $shared ${sentence(7)}"),
      (1L, s"${sentence(5)} $shared"),
      (2L, sentence(20)),
      (3L, "a b c d e"),   // 5 toks -> 3 grams < w -> no full window -> empty
      (4L, "x y"))         // < k toks -> empty
      .toDF("doc_id", "text")
    val (k, w) = (3, 4)
    val got = Dedup.winnowFingerprints(docs, "doc_id", "text", k, w)
      .select("doc_id", "fp_hash", "fp_pos").as[(Long, Long, Int)].collect().toSet

    // scalar winnowing: rightmost-min over each w-window of k-gram hashes
    def scalar(id: Long, text: String): Set[(Long, Long, Int)] = {
      val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      if (toks.length < k) return Set.empty
      val hs = (0 to toks.length - k).map(i => Dedup.hash48(toks.slice(i, i + k).mkString(" ")))
      (w - 1 until hs.length).map { j =>
        val win = (j - w + 1 to j).map(i => (hs(i), i))
        val m = win.minBy { case (h, i) => (h, -i) } // min hash, rightmost
        (id, m._1, m._2)
      }.toSet
    }
    val expected = Seq(0L, 1L, 2L, 3L, 4L).flatMap { id =>
      val text = docs.filter(col("doc_id") === id).select("text").as[String].head()
      scalar(id, text)
    }.toSet
    assert(got === expected)
    assert(!got.exists(t => t._1 == 3L || t._1 == 4L)) // short docs emit nothing
    // guarantee: docs 0 and 1 share an 8-token run >= w+k-1 -> at least one
    // common fingerprint HASH
    val h0 = got.filter(_._1 == 0L).map(_._2)
    val h1 = got.filter(_._1 == 1L).map(_._2)
    assert(h0.intersect(h1).nonEmpty)
    // density: ~2/(w+1) of grams selected (loose upper bound: every window
    // can add at most one NEW selection)
    val grams2 = docs.filter(col("doc_id") === 2L).select("text").as[String].head()
      .split("\\s+").length - k + 1
    assert(got.count(_._1 == 2L) <= grams2 - w + 1)
  }

  test("epoch shuffle: permutation is deterministic, complete, epoch-independent") {
    val df = (0L until 200L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val e0 = TextQuality.epochShuffle(df, "doc_id", nShards = 4, epoch = 0)
      .select("doc_id", "shard", "pos").as[(Long, Int, Int)].collect()
    // complete: every doc exactly once; per-shard positions contiguous from 1
    assert(e0.map(_._1).sorted.toSeq === (0L until 200L))
    e0.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (1 to rows.length))
    }
    // matches the scalar re-derivation from the same hash
    val expected = (0L until 200L).map { i =>
      (i, Dedup.hash48(s"epoch0:$i"))
    }.groupBy(_._2 % 4).flatMap { case (sh, rows) =>
      rows.sortBy(r => (r._2, r._1)).zipWithIndex
        .map { case ((id, _), k) => (id, sh.toInt, k + 1) }
    }.toSet
    assert(e0.toSet === expected)
    // re-run identical; a different epoch is a different permutation
    val e0b = TextQuality.epochShuffle(df, "doc_id", nShards = 4, epoch = 0)
      .select("doc_id", "shard", "pos").as[(Long, Int, Int)].collect()
    assert(e0b.toSet === e0.toSet)
    val e1 = TextQuality.epochShuffle(df, "doc_id", nShards = 4, epoch = 1)
      .select("doc_id", "shard", "pos").as[(Long, Int, Int)].collect()
    assert(e1.toSet !== e0.toSet)
    assert(e1.map(_._1).sorted.toSeq === (0L until 200L))
  }

  test("temperature mixture weights: sqrt flattening matches scalar math, feeds plan") {
    import graft.datapipe.Mix
    // head stratum 16x the tail: α=1/2 compresses the ratio to 4x
    val df = Seq(
      (0L, "big", ("w " * 1600).trim),
      (1L, "mid", ("w " * 400).trim),
      (2L, "sml", ("w " * 100).trim)).toDF("doc_id", "lang", "text")
    val got = Mix.temperatureWeightsBp(df, "lang", "text", sqrtIters = 1)
      .select("stratum", "n_tokens", "weight_bp")
      .as[(String, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    // scalar: sqrt sums folded in sorted-stratum order (big, mid, sml)
    val ws = Seq("big" -> 1600L, "mid" -> 400L, "sml" -> 100L)
      .map { case (s, n) => (s, n, math.sqrt(n.toDouble)) }
    val denom = ws.sortBy(_._1).foldLeft(0.0)((a, t) => a + t._3)
    ws.foreach { case (s, n, w) =>
      assert(got(s) === ((n, math.floor(10000.0 * w / denom).toLong)))
    }
    // 40:20:10 -> 5714/2857/1428 bp; ratio head:tail is 4x, not 16x
    assert(got("big")._2 === 5714L && got("mid")._2 === 2857L && got("sml")._2 === 1428L)
    assert(got.values.map(_._2).sum <= 10000L)
    // α=1 (sqrtIters=0) degenerates to proportional weights
    val prop = Mix.temperatureWeightsBp(df, "lang", "text", sqrtIters = 0)
      .select("stratum", "weight_bp").as[(String, Long)].collect().toMap
    assert(prop("big") === 7619L && prop("sml") === 476L) // 1600/2100, 100/2100
    // the output is plan()'s weightsBp input
    val plan = Mix.plan(df, "lang", "text",
      got.map { case (s, (_, bp)) => s -> bp }, budgetTokens = 1000L)
    assert(plan.count() === 3L)
  }

  test("incremental dedup: batch-first wins, history fingerprints block admission") {
    // history texts A,B already ingested; batch has a dup-of-A, an internal
    // dup pair (C,C), and a fresh D
    val history = Seq((0L, "AAAA"), (1L, "BBBB")).toDF("doc_id", "text")
      .select(md5(col("text")).as("fp"))
    val batch = Seq((10L, "AAAA"), (11L, "CCCC"), (12L, "CCCC"), (13L, "DDDD"))
      .toDF("doc_id", "text")
    val got = Dedup.incrementalDedup(history, batch, "doc_id", md5(col("text")))
      .select("doc_id").as[Long].collect().toSet
    assert(got === Set(11L, 13L)) // A blocked by history; 11 beats 12; D fresh
    // the returned fp column is the store delta: re-running the NEXT batch
    // against history + delta blocks re-admission of C and D
    val delta = Dedup.incrementalDedup(history, batch, "doc_id", md5(col("text")))
      .select("fp")
    val batch2 = Seq((20L, "CCCC"), (21L, "DDDD"), (22L, "EEEE")).toDF("doc_id", "text")
    val got2 = Dedup.incrementalDedup(history.union(delta), batch2, "doc_id", md5(col("text")))
      .select("doc_id").as[Long].collect().toSet
    assert(got2 === Set(22L))
  }

  test("sq8: encode bounds, zero-vector guard, top-k matches scalar re-derivation") {
    val r = new Random(17)
    val dim = 16
    val corpus = (10L until 40L).map(i => (i, Array.fill(dim)((r.nextFloat() - 0.5f) * 2f)))
    val zero = Seq((99L, Array.fill(dim)(0f)))
    val queries = (0L until 3L).map(i => (i, Array.fill(dim)((r.nextFloat() - 0.5f) * 2f)))
    val cdf = (corpus ++ zero).toDF("vec_id", "embedding")
    val qdf = queries.toDF("vec_id", "embedding")

    val enc = Similarity.sq8Encode(cdf, "embedding")
      .select("vec_id", "sq8_scale", "sq8_codes")
      .as[(Long, Double, Seq[Int])].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    // scalar encoder (same formula)
    def encode(v: Array[Float]): (Double, Seq[Int]) = {
      val m = v.map(x => math.abs(x.toDouble)).max
      val s = if (m == 0.0) 1.0 else m
      (s, v.toSeq.map(x => BigDecimal(x.toDouble * 127.0 / s)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toInt))
    }
    (corpus ++ zero).foreach { case (id, v) =>
      val (s, codes) = encode(v)
      assert(enc(id)._1 === s)
      assert(enc(id)._2 === codes)
      assert(codes.forall(c => c >= -127 && c <= 127))
    }
    assert(enc(99L) === ((1.0, Seq.fill(dim)(0))))

    val got = Similarity.sq8TopKEncoded(
        Similarity.sq8Encode(cdf, "embedding").select(col("vec_id"), col("sq8_scale"), col("sq8_codes")),
        "vec_id", qdf, "vec_id", "embedding", k = 3)
      .select("qid", "id", "idot", "rk").as[(Long, Long, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._4).map(t => (t._2, t._3)).toList).toMap
    val expected = queries.map { case (qid, qv) =>
      val (qs, qc) = encode(qv)
      val scored = (corpus ++ zero).map { case (id, v) =>
        val (vs, vc) = encode(v)
        val idot = qc.zip(vc).map { case (a, b) => a.toLong * b }.sum
        (id, idot, qs * vs * idot)
      }
      qid -> scored.sortBy { case (id, _, sc) => (-sc, id) }.take(3)
        .map(t => (t._1, t._2)).toList
    }.toMap
    assert(got === expected)
  }

  /** Independent scalar re-derivation of the bigram-LM score: add-one
    * smoothing over `['<s>'] ++ tokens`, µ-log cost per pair. */
  private def naiveLm(rows: Seq[(Long, String)], trainIds: Set[Long])
      : Map[Long, (Long, Long, Long)] = {
    def sq(t: String): Seq[String] =
      "<s>" +: t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    val uni = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val bi = scala.collection.mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
    rows.filter(r => trainIds(r._1)).foreach { case (_, t) =>
      val s = sq(t)
      s.foreach(w => uni(w) += 1)
      s.sliding(2).filter(_.length == 2).foreach(p => bi((p(0), p(1))) += 1)
    }
    val v = uni.size.toLong
    rows.flatMap { case (id, t) =>
      val pairs = sq(t).sliding(2).filter(_.length == 2).toSeq
      if (pairs.isEmpty) None
      else {
        val costs = pairs.map { p =>
          TextQuality.logMicro(uni(p(0)) + v) - TextQuality.logMicro(bi((p(0), p(1))) + 1)
        }
        Some(id -> ((pairs.size.toLong, costs.sum, costs.sum / pairs.size)))
      }
    }.toMap
  }

  /** An id PROVABLY outside the 80% train slice (same hash as the engine),
    * so its doc contributes nothing to the model — pure backoff costs. */
  private lazy val oodId: Long = (300L until 400L)
    .find(i => Dedup.hash48(s"lmtrain:$i") % 10000L >= 8000L).get

  private lazy val lmCorpus: Seq[(Long, String)] = {
    val r = new Random(11)
    val vocab = (0 until 25).map(i => s"t$i")
    (0 until 60).map { i =>
      (i.toLong, (0 until 5 + r.nextInt(20)).map(_ => vocab(r.nextInt(vocab.length))).mkString(" "))
    } ++ Seq(
      (200L, ""),                      // no tokens -> excluded from the output
      (201L, "   "),                   // whitespace-only -> excluded
      (oodId, "zz qq zz"))             // held-out AND fully unseen tokens
  }

  test("lm perplexity matches a scalar re-derivation (counts, backoff, integer div)") {
    val df = lmCorpus.toDF("doc_id", "text")
    val trainIds = df
      .filter(org.apache.spark.sql.functions.pmod(
        Dedup.hash48Col(concat(lit("lmtrain:"), col("doc_id").cast("string"))), lit(10000L)) < 8000)
      .select("doc_id").as[Long].collect().toSet
    assert(trainIds.nonEmpty && trainIds.size < lmCorpus.size) // a real split
    val expected = naiveLm(lmCorpus, trainIds)
    val got = TextQuality.lmPerplexity(df)
      .select("doc_id", "n_bigrams", "nll_micro", "ppl_micro")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got === expected)
    assert(!got.contains(200L) && !got.contains(201L)) // token-free docs drop out
    // held-out OOD doc: unseen prefixes cost exactly the backoff constant L(V)
    val v = trainIds.toSeq.flatMap(id => lmCorpus.find(_._1 == id)).flatMap { case (_, t) =>
      "<s>" +: t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    }.distinct.size.toLong
    val (nb, nll, _) = got(oodId)
    assert(nb === 3L) // <s>-zz, zz-qq, qq-zz
    // pairs 2 and 3 have unseen prefixes (zz, qq): cost = L(0 + V) - L(0 + 1)
    assert(nll >= 2 * TextQuality.logMicro(v))
  }

  test("dsir weights match a scalar re-derivation (hashed buckets, add-one, integer µ-log)") {
    val corpus = Seq(
      (0L, "the cat sat on the mat", "en"),
      (1L, "der hund lief im park", "de"),
      (2L, "the dog ran in the park", "en"),
      (3L, "el gato grande", "es"),
      (4L, "the the the cat", "en"),
      (5L, "   ", "en"), // token-free -> drops out
      (6L, "park cat hund", "de"))
    val df = corpus.toDF("doc_id", "text", "lang")
    val B = 64
    val got = TextQuality.dsirWeights(df, col("lang") === "en", buckets = B)
      .select("doc_id", "n_tok", "logw_micro").as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

    def toks(t: String) = t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    def bkt(w: String) = Dedup.hash48("dsir:" + w) % B
    val all = corpus.flatMap { case (_, t, _) => toks(t).map(bkt) }
    val tgt = corpus.filter(_._3 == "en").flatMap { case (_, t, _) => toks(t).map(bkt) }
    val cr = all.groupBy(identity).map { case (b, xs) => b -> xs.size.toLong }
    val ct = tgt.groupBy(identity).map { case (b, xs) => b -> xs.size.toLong }
      .withDefaultValue(0L)
    val (tr, tt) = (all.size.toLong, tgt.size.toLong)
    val k = TextQuality.logMicro(tt + B) - TextQuality.logMicro(tr + B)
    val expected = corpus.collect { case (id, t, _) if toks(t).nonEmpty =>
      val bs = toks(t).map(bkt)
      val s = bs.map(b => TextQuality.logMicro(ct(b) + 1) - TextQuality.logMicro(cr(b) + 1)).sum
      id -> ((bs.size.toLong, s - bs.size * k))
    }.toMap
    assert(got === expected)
    assert(!got.contains(5L))
    // directional sanity: per-token weight of a target-vocab doc beats a
    // non-target one (target tokens have ct == cr -> λ = 0 plus the positive
    // −k correction; non-target tokens cost −L(cr+1))
    assert(got(4L)._2.toDouble / got(4L)._1 > got(1L)._2.toDouble / got(1L)._1)
  }

  test("lm log table covers every lookup and matches logMicro") {
    val df = lmCorpus.toDF("doc_id", "text")
    val tab = TextQuality.lmLogTable(df).as[(Long, Long)].collect().sortBy(_._1)
    assert(tab.head === ((1L, 0L)))
    tab.foreach { case (n, l) => assert(l === TextQuality.logMicro(n)) }
    // bound: covers max unigram count + V of the same train slice
    val trainIds = df
      .filter(org.apache.spark.sql.functions.pmod(
        Dedup.hash48Col(concat(lit("lmtrain:"), col("doc_id").cast("string"))), lit(10000L)) < 8000)
      .select("doc_id").as[Long].collect().toSet
    val uni = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    lmCorpus.filter(r => trainIds(r._1)).foreach { case (_, t) =>
      ("<s>" +: t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq).foreach(w => uni(w) += 1)
    }
    assert(tab.last._1 === uni.values.max + uni.size)
  }

  test("bm25: scores match a scalar re-derivation (µ-log idf, cleared length norm)") {
    val corpus = Seq(
      (0L, "spark engine join join"),
      (1L, "join"),
      (2L, "hash table scan engine"),
      (3L, "join hash join hash join hash"),
      (4L, "totally unrelated words here"))
    val docs = corpus.toDF("doc_id", "text")
    val post = InvertedIndex.postings(docs, "doc_id", "text")
    val qs = Seq(("q0", "join"), ("q0", "hash"), ("q1", "engine"))
      .toDF("query_id", "term")
    val n = corpus.size.toLong
    val got = InvertedIndex.searchBM25(post, qs, nDocs = n, k = 10)
      .as[(String, Long, Long, Int)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap

    def toks(t: String) = t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    val tf = corpus.flatMap { case (id, t) => toks(t).map(w => (w, id)) }
      .groupBy(identity).map { case ((w, id), xs) => (w, id) -> xs.size.toLong }
    val dl = corpus.map { case (id, t) => id -> toks(t).size.toLong }.toMap
    val s = dl.values.sum
    val ndBp = dl.map { case (id, d) => id -> d * 10000L * n / s }
    val df = tf.keys.groupBy(_._1).map { case (w, ks) => w -> ks.size.toLong }
    def idf(w: String) =
      TextQuality.logMicro(2 * n + 2) - TextQuality.logMicro(2 * df(w) + 1)
    val queries = Seq("q0" -> Seq("join", "hash"), "q1" -> Seq("engine"))
    val expected = (for {
      (qid, terms) <- queries
      id <- corpus.map(_._1)
      ws = terms.flatMap(w => tf.get((w, id)).map(f =>
        idf(w) * 440000L * f / (200000L * f + 60000L + 18L * ndBp(id))))
      if ws.nonEmpty
    } yield (qid, id, ws.sum)).groupBy(_._1).flatMap { case (_, rows) =>
      rows.sortBy(r => (-r._3, r._2)).zipWithIndex
        .map { case ((q, id, sc), i) => (q, id) -> ((sc, i + 1)) }
    }
    assert(got === expected)
    // length-norm ranking property, asserted per-OCCURRENCE: doc 1 ("join",
    // dl 1) must beat doc 0 (tf 2 but dl 4) per join-occurrence — i.e.
    // w1/tf1 > w0/tf0, cross-multiplied to stay in exact integers. The
    // per-term weights come from the scalar model `got` was proven equal to.
    def w(id: Long, term: String): Long = {
      val f = tf((term, id))
      idf(term) * 440000L * f / (200000L * f + 60000L + 18L * ndBp(id))
    }
    assert(w(1L, "join") * tf(("join", 0L)) > w(0L, "join") * tf(("join", 1L)))
    assert(got(("q0", 1L))._1 > 0L)
  }

  test("leakage-safe split: group-atomic, hash-rule exact, degenerate rates") {
    val df = (0 until 40).map(i => (i.toLong, s"site${i % 10}"))
      .toDF("doc_id", "source")
    val got = TextQuality.leakageSafeSplit(df, "source", valBp = 3000, testBp = 3000)
      .select("doc_id", "source", "split")
      .as[(Long, String, String)].collect()
    // every group maps to exactly one split
    assert(got.groupBy(_._2).forall(_._2.map(_._3).distinct.size == 1))
    // the rule is exactly the salted group hash
    def exp(src: String): String = {
      val b = Dedup.hash48("split:" + src) % 10000
      if (b < 3000) "test" else if (b < 6000) "val" else "train"
    }
    got.foreach { case (_, src, sp) => assert(sp === exp(src), src) }
    // this fixture exercises all three labels at 30/30/40 (sites 1 and 3
    // hash under 3000, site 8 lands in [3000, 6000))
    assert(got.map(_._3).distinct.sorted.toSeq === Seq("test", "train", "val"))
    // degenerate rates: everything trains
    val all = TextQuality.leakageSafeSplit(df, "source", valBp = 0, testBp = 0)
      .select("split").distinct().as[String].collect().toSeq
    assert(all === Seq("train"))
  }

  test("rrf fusion: integer contributions sum across systems; ties break on doc_id") {
    val a = Seq(("q0", 1L, 9L, 1), ("q0", 2L, 5L, 2), ("q1", 7L, 3L, 1))
      .toDF("query_id", "doc_id", "score", "rk")
    val b = Seq(("q0", 3L, 99L, 1), ("q0", 2L, 55L, 2))
      .toDF("query_id", "doc_id", "score", "rk")
    val got = InvertedIndex.rrfFuse(Seq(a, b), k = 60, topK = 10)
      .as[(String, Long, Long, Int)].collect().toSet
    // 1000000 div 61 = 16393, div 62 = 16129; doc 2 appears in both systems
    assert(got === Set(
      ("q0", 2L, 32258L, 1), // 16129 + 16129
      ("q0", 1L, 16393L, 2), // tie with doc 3 broken by doc_id
      ("q0", 3L, 16393L, 3),
      ("q1", 7L, 16393L, 1)))
    // score scales never crossed systems: only rk was read
  }

  test("domain stats: corpus-wide dup charging, short/dup fractions, integer means") {
    val df = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "a.com"),
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "b.com"), // mirror of 0
      (2L, "short doc", "a.com"),
      (3L, "short doc", "a.com"), // in-domain dup, also short
      (4L, "one two three four five six seven eight nine ten eleven", "b.com"),
      (5L, "unique little page", "c.com"))
      .toDF("doc_id", "text", "source")
    val got = TextQuality.domainStats(df, "source", md5(col("text")), shortTokens = 10)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // a.com: docs 0,2,3 — doc 0 duplicated cross-domain, 2&3 in-domain; all of 2,3 short
    assert(got("a.com") === (("a.com", 3L, 14L, 4L, 3L, 10000L, 2L, 6666L)))
    // b.com: doc 1 (dup of 0 — charged despite living elsewhere), doc 4 clean
    assert(got("b.com") === (("b.com", 2L, 21L, 10L, 1L, 5000L, 0L, 0L)))
    // c.com: one unique short doc
    assert(got("c.com") === (("c.com", 1L, 3L, 3L, 0L, 0L, 1L, 10000L)))
  }

  test("ppl buckets: tertile thresholds match rank arithmetic; tiers are ordered") {
    val df = lmCorpus.toDF("doc_id", "text")
      .withColumn("lang", when(col("doc_id") % 2 === 0, "en").otherwise("he"))
    val ppl = TextQuality.lmPerplexity(df)
      .join(df.select("doc_id", "lang"), "doc_id")
      .select("doc_id", "lang", "ppl_micro")
      .as[(Long, String, Long)].collect()
    val expected = ppl.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      val vs = rows.map(_._3).sorted
      val n = vs.length
      val t1 = vs.zipWithIndex.collectFirst { case (v, i) if 3 * (i + 1) >= n => v }.get
      val t2 = vs.zipWithIndex.collectFirst { case (v, i) if 3 * (i + 1) >= 2 * n => v }.get
      rows.toSeq.map { case (id, lang, p) =>
        id -> ((lang, p, if (p <= t1) "head" else if (p <= t2) "middle" else "tail"))
      }
    }.toMap
    val got = TextQuality.pplBuckets(df)
      .as[(Long, String, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got === expected)
    // tiers are value-ordered within each language
    got.values.groupBy(_._1).foreach { case (_, rows) =>
      val byTier = rows.groupBy(_._3).map { case (t, rs) => t -> rs.map(_._2) }
      for (h <- byTier.get("head"); m <- byTier.get("middle"))
        assert(h.max <= m.min)
      for (m <- byTier.get("middle"); t <- byTier.get("tail"))
        assert(m.max < t.min)
    }
  }

  /** Scalar replay of [[Sketch.qhBinOf]]'s log-linear bin arithmetic. */
  private def qhBinScalar(v: Long, sub: Int = 5): Long = {
    val v1 = v + 1
    val m = 1L << sub
    val bitLen = 64 - java.lang.Long.numberOfLeadingZeros(v1)
    if (bitLen - 1 < sub) v1
    else (bitLen - sub).toLong * m + (v1 >>> (bitLen - 1 - sub)) - m
  }

  test("ppl buckets sketch: matches scalar bin-rank replay; disagrees with exact only inside threshold bins") {
    val df = lmCorpus.toDF("doc_id", "text")
      .withColumn("lang", when(col("doc_id") % 2 === 0, "en").otherwise("he"))
    val ppl = TextQuality.lmPerplexity(df)
      .join(df.select("doc_id", "lang"), "doc_id")
      .select("doc_id", "lang", "ppl_micro")
      .as[(Long, String, Long)].collect()
    // scalar twin: bin every ppl, pick threshold BINS by the ×3 rank rule
    // over the per-lang bin cumsum, label by bin-vs-threshold-bin
    val thrBins: Map[String, (Long, Long)] = ppl.groupBy(_._2).map { case (lang, rows) =>
      val cnts = rows.groupBy(r => qhBinScalar(r._3)).map { case (b, rs) => b -> rs.length.toLong }
        .toSeq.sortBy(_._1)
      val n = rows.length.toLong
      val cum = cnts.scanLeft(0L)(_ + _._2).tail.zip(cnts.map(_._1))
      val t1 = cum.collectFirst { case (c, b) if 3 * c >= n => b }.get
      val t2 = cum.collectFirst { case (c, b) if 3 * c >= 2 * n => b }.get
      lang -> ((t1, t2))
    }
    val expected = ppl.map { case (id, lang, p) =>
      val (t1, t2) = thrBins(lang)
      val b = qhBinScalar(p)
      id -> ((lang, p, if (b <= t1) "head" else if (b <= t2) "middle" else "tail"))
    }.toMap
    val got = TextQuality.pplBucketsSketch(df)
      .as[(Long, String, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got === expected)
    // exact/sketch agreement: the twins may disagree ONLY on docs whose ppl
    // falls in a threshold's own bin (< 2^-sub relative width)
    val exact = TextQuality.pplBuckets(df)
      .as[(Long, String, Long, String)].collect()
      .map(r => r._1 -> r._4).toMap
    val disagreements = got.collect { case (id, (lang, p, b)) if exact(id) != b => (id, lang, p) }
    disagreements.foreach { case (id, lang, p) =>
      val (t1, t2) = thrBins(lang)
      val b = qhBinScalar(p)
      assert(b == t1 || b == t2,
        s"doc $id disagrees with the exact twin outside a threshold bin (bin $b, thr $t1/$t2)")
    }
  }

  test("winnow overlap pairs: scalar replay; hot-fingerprint cap bites; minShared gates") {
    val r = new Random(41)
    val vocab = (0 until 30).map(i => s"t$i")
    def sent(n: Int) = Seq.fill(n)(vocab(r.nextInt(vocab.length))).mkString(" ")
    val runA = sent(10)
    val runB = sent(8)
    val hot = sent(12) // boilerplate shared by EVERY doc -> its buckets overflow
    val texts = Seq(
      0L -> s"$hot $runA $runB",
      1L -> s"$runA $hot $runB",
      2L -> s"${sent(15)} $runA",
      3L -> s"$hot ${sent(12)}",
      4L -> s"$hot ${sent(12)}",
      5L -> s"$hot ${sent(12)}",
      6L -> s"$hot ${sent(12)}")
    val docs = texts.toDF("doc_id", "text")
    val (k, w, maxBucket, minShared) = (3, 4, 4, 2)
    // scalar winnow selection (distinct hashes per doc), as in the selection test
    def scalarSel(text: String): Set[Long] = {
      val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      if (toks.length < k) return Set.empty
      val hs = (0 to toks.length - k).map(i => Dedup.hash48(toks.slice(i, i + k).mkString(" ")))
      (w - 1 until hs.length).map { j =>
        (j - w + 1 to j).map(i => (hs(i), i)).minBy { case (h, i) => (h, -i) }._1
      }.toSet
    }
    val sel = texts.map { case (id, t) => id -> scalarSel(t) }.toMap
    def expectedPairs(cap: Int): Map[(Long, Long), Long] = {
      val byHash = sel.toSeq.flatMap { case (id, hs) => hs.map(_ -> id) }
        .groupBy(_._1).map { case (h, rows) => h -> rows.map(_._2).sorted }
      val kept = byHash.filter { case (_, ids) => ids.length >= 2 && ids.length <= cap }
      kept.values.flatMap(ids => ids.combinations(2).map(p => (p(0), p(1))))
        .groupBy(identity).map { case (p, os) => p -> os.size.toLong }
        .filter(_._2 >= minShared)
    }
    val expected = expectedPairs(maxBucket)
    val got = Dedup.winnowOverlapPairs(docs, "doc_id", "text", k, w, maxBucket, minShared)
      .as[(Long, Long, Long)].collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(got === expected)
    // the strongly-overlapping pair is reported with several shared fps
    assert(got.getOrElse((0L, 1L), 0L) >= 2L)
    // the cap BITES: uncapped, the hot boilerplate (in all 7 docs > maxBucket)
    // links the otherwise-unrelated docs 3..6; capped, those pairs are gone
    val uncapped = expectedPairs(Int.MaxValue)
    assert(uncapped.keySet.exists { case (a, b) => a >= 3L && b >= 3L })
    assert(!got.keySet.exists { case (a, b) => a >= 3L && b >= 3L })
    // but capping loses NO pair backed by rarer shared runs
    assert(got.keySet === expected.keySet)
  }

  test("LSH bucket builds gate hot keys BEFORE collect_list (two-pass plan shape)") {
    // The scale contract (100 TB): a bucket key shared by 10^9 docs must be
    // dropped by a count filter before any collect_list buffer materializes
    // its membership — the optimized plan therefore shows the collect
    // aggregate ABOVE a left-semi join against the count-filtered key set.
    def assertGated(df: org.apache.spark.sql.DataFrame, what: String): Unit = {
      val plan = df.queryExecution.optimizedPlan.toString
      val collectAt = plan.indexOf("collect_list")
      assert(collectAt >= 0, s"$what: no collect_list in plan")
      val semiAt = plan.indexOf("LeftSemi")
      assert(semiAt >= 0, s"$what: no left-semi key gate in plan:\n$plan")
      // children print below parents: the gate must sit under the collect
      assert(semiAt > collectAt,
        s"$what: left-semi gate not below the collect aggregate:\n$plan")
    }
    assertGated(Dedup.winnowOverlapPairs(docs, "doc_id", "text"), "winnow")
    assertGated(Dedup.minhashNearDuplicates(docs, "doc_id", "text"), "minhash")
    assertGated(Dedup.simhashNearDuplicates(docs, "doc_id", "text"), "simhash")
    val vecs = (0 until 8).map(i => (i.toLong, Array.fill(8)(i / 7.0f)))
    assertGated(Similarity.cosineNearDuplicates(
      vecs.toDF("vec_id", "embedding"), "vec_id", "embedding"), "cosine")
  }

  test("media near-dup: aHash from decoded pixels; identical and rescaled re-encodes collide; banding replay") {
    import Multimodal._
    def img(w: Int, h: Int, px: Array[Byte]): Array[Byte] =
      writeHeader("image", w, h, 0) ++ encodePpm(w, h, px)
    def pattern(w: Int, h: Int, seed: Int): Array[Byte] =
      Array.tabulate(w * h * 3)(i => ((3 * i + seed) % 256).toByte)
    // 2x upscale by pixel replication: grid sampling (y=r*h/6, x=c*w/8) with
    // w%8==0, h%6==0 hits replicated pixels -> hash is resolution-invariant
    def upscale2(w: Int, h: Int, px: Array[Byte]): Array[Byte] =
      Array.tabulate(2 * w * 2 * h * 3) { i =>
        val p = i / 3; val ch = i % 3
        val y = p / (2 * w); val x = p % (2 * w)
        px(((y / 2) * w + x / 2) * 3 + ch)
      }
    val pxA = pattern(8, 6, 17)
    val rows = Seq(
      MediaRow("d1", "a1", "image", 8, 6, 0, img(8, 6, pxA)),
      MediaRow("d2", "a2", "image", 8, 6, 0, img(8, 6, pxA)),            // exact re-encode
      MediaRow("d3", "a3", "image", 16, 12, 0, img(16, 12, upscale2(8, 6, pxA))), // rescale
      MediaRow("d4", "b1", "image", 8, 6, 0, img(8, 6, pattern(8, 6, 201))), // different
      MediaRow("d5", "f1", "image", 8, 6, 0, img(8, 6, Array.fill(8 * 6 * 3)(7.toByte))), // flat
      MediaRow("d6", "w1", "audio", 0, 0, 1000,
        writeHeader("audio", 0, 0, 1000) ++ encodeWav(Array[Short](1, 2, 3))), // non-visual
      MediaRow("d7", "x1", "image", 8, 6, 0, img(8, 6, pxA).dropRight(3))) // corrupt body
    val hashes = perceptualHashes(spark, spark.createDataset(rows)).collect()
      .map(h => s"${h.doc_id}:${h.media_ref}" -> h.ahash).toMap
    // audio and corrupt payloads emit NO hash (cannot poison a bucket)
    assert(hashes.keySet === Set("d1:a1", "d2:a2", "d3:a3", "d4:b1", "d5:f1"))
    // scalar aHash replay over the decoded raster
    def scalarAHash(w: Int, h: Int, px: Array[Byte]): Long = {
      val gs = for (r <- 0 until 6; c <- 0 until 8) yield {
        val p = ((r * h / 6) * w + c * w / 8) * 3
        ((px(p) & 0xFF) + (px(p + 1) & 0xFF) + (px(p + 2) & 0xFF)) / 3
      }
      val tot = gs.map(_.toLong).sum
      gs.zipWithIndex.foldLeft(0L) { case (acc, (g, i)) =>
        if (g.toLong * 48 > tot) acc | (1L << i) else acc }
    }
    assert(hashes("d1:a1") === scalarAHash(8, 6, pxA))
    assert(hashes("d1:a1") === hashes("d2:a2"))           // identical re-encode
    assert(hashes("d1:a1") === hashes("d3:a3"))           // rescaled re-encode
    assert(hashes("d5:f1") === 0L)                        // flat frame -> all-zero hash
    assert(hashes("d4:b1") !== hashes("d1:a1"))
    // e2e pairs match a scalar banding replay (4 x 12-bit bands, cap, verify)
    val (maxDist, maxBucket) = (3, 64)
    val ids = hashes.keys.toSeq.sorted
    val byChunk = (for (id <- ids; b <- 0 until 4)
      yield ((b, (hashes(id) >> (b * 12)) & 4095L), id)).groupBy(_._1)
    val expected = byChunk.values.filter(v => v.length >= 2 && v.length <= maxBucket)
      .flatMap(_.map(_._2).sorted.combinations(2))
      .map(p => (p(0), p(1), java.lang.Long.bitCount(hashes(p(0)) ^ hashes(p(1)))))
      .filter(_._3 <= maxDist).toSet
    val got = mediaNearDuplicates(spark, spark.createDataset(rows), maxDist, maxBucket)
      .as[(String, String, Int)].collect().toSet
    assert(got === expected)
    assert(got.contains(("d1:a1", "d2:a2", 0)))
    assert(got.contains(("d1:a1", "d3:a3", 0)))
  }
}
