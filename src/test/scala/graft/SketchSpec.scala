package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.datapipe.Sketch

class SketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def keysDf(n: Int, dups: Int, prefix: String) =
    (0 until n).flatMap(i => Seq.fill(1 + (i % dups))(s"$prefix$i"))
      .toDF("k").withColumn("g", lit("all"))

  test("HLL: raw estimate within 20% at n >> 2.5m (m=256, deterministic)") {
    for ((n, prefix) <- Seq((5000, "u"), (20000, "v"), (2000, "w"))) {
      val df = keysDf(n, 4, prefix)
      val est = Sketch.hllDistinct(df, col("k"), Seq("g"), p = 8)
        .select("hll_est").as[Long].head()
      val err = math.abs(est.toDouble - n) / n
      assert(err < 0.20, s"n=$n est=$est err=$err")
    }
  }

  test("HLL: register tables merge by max — split == whole, estimate identical") {
    val df = keysDf(3000, 3, "m")
    val (a, b) = (df.filter(length(col("k")) % 2 === 0), df.filter(length(col("k")) % 2 === 1))
    val merged = Sketch.hllRegisters(a, col("k"), Seq("g"))
      .union(Sketch.hllRegisters(b, col("k"), Seq("g")))
      .groupBy("g", "reg").agg(max("maxl").as("maxl"))
    val whole = Sketch.hllRegisters(df, col("k"), Seq("g"))
    assert(merged.except(whole).isEmpty && whole.except(merged).isEmpty)
    val eM = Sketch.hllEstimate(merged, Seq("g")).select("hll_est").as[Long].head()
    val eW = Sketch.hllEstimate(whole, Seq("g")).select("hll_est").as[Long].head()
    assert(eM === eW)
  }

  test("HLL: duplication-insensitive (multiset in, set cardinality out)") {
    val df = keysDf(1500, 2, "d")
    val e1 = Sketch.hllDistinct(df, col("k"), Seq("g")).select("hll_est").as[Long].head()
    val e2 = Sketch.hllDistinct(df.union(df).union(df), col("k"), Seq("g"))
      .select("hll_est").as[Long].head()
    assert(e1 === e2)
  }

  test("HLL: per-group estimates are independent") {
    val big = (0 until 8000).map(i => (s"a$i", "big"))
    val small = (0 until 2000).map(i => (s"b$i", "small"))
    val df = (big ++ small).toDF("k", "g")
    val est = Sketch.hllDistinct(df, col("k"), Seq("g"), p = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(est("big") - 8000.0) / 8000 < 0.20, s"big=${est("big")}")
    assert(math.abs(est("small") - 2000.0) / 2000 < 0.20, s"small=${est("small")}")
    assert(est("big") > est("small") * 2)
  }

  test("HLL: estimator fails fast on registers built with a larger p (no silent wrong answer)") {
    val df = keysDf(2000, 2, "p")
    val regs = Sketch.hllRegisters(df, col("k"), Seq("g"), p = 12)
    val ex = intercept[Exception] {
      Sketch.hllEstimate(regs, Seq("g"), p = 8).collect()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(ex).exists(_.contains("register index")), chain(ex).mkString(" | "))
  }

  test("CMS: estimates never undercount; overshoot within the e*N/w bound; heavy hitter found") {
    // 200 light keys x ~10 + one heavy hitter x 500
    val rows = (0 until 200).flatMap(i => Seq.fill(5 + (i % 10))(s"k$i")) ++ Seq.fill(500)("HEAVY")
    val df = rows.toDF("k")
    val n = rows.size.toLong
    val exact = rows.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val cms = Sketch.cmsTable(df, col("k"), depth = 4, width = 1024)
    val est = Sketch.cmsLookup(cms, df, col("k"), depth = 4, width = 1024)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val bound = math.ceil(math.E * n / 1024).toLong // classic CMS additive bound
    for ((k, ex) <- exact) {
      assert(est(k) >= ex, s"undercount for $k: ${est(k)} < $ex")
      assert(est(k) <= ex + bound, s"overshoot for $k: ${est(k)} > $ex + $bound")
    }
    assert(est.maxBy(_._2)._1 === "HEAVY")
  }

  test("CMS: counter tables from disjoint inputs merge by sum") {
    val rows = (0 until 300).map(i => s"k${i % 40}").toDF("k")
    val (a, b) = (rows.filter(col("k").endsWith("1")), rows.filter(!col("k").endsWith("1")))
    val merged = Sketch.cmsTable(a, col("k")).union(Sketch.cmsTable(b, col("k")))
      .groupBy("row", "bucket").agg(sum("cnt").as("cnt"))
    val whole = Sketch.cmsTable(rows, col("k"))
    assert(merged.except(whole).isEmpty && whole.except(merged).isEmpty)
  }

  test("plan: both sketches are pure Catalyst — partial agg present, no UDF boundary") {
    val df = (0 until 100).map(i => s"k$i").toDF("k").withColumn("g", lit("x"))
    for (plan <- Seq(
      Sketch.hllRegisters(df, col("k"), Seq("g")).queryExecution.executedPlan.toString,
      Sketch.cmsTable(df, col("k")).queryExecution.executedPlan.toString)) {
      assert(plan.contains("HashAggregate"), s"no hash agg:\n$plan")
      assert(!plan.toLowerCase.contains("batchevalpython") && !plan.contains("UDF"),
        s"udf boundary in plan:\n$plan")
    }
  }

  // percentile_disc reference: rank ⌈n·q/10⁴⌉, 1-indexed k-th smallest
  private def discQ(sorted: Seq[Long], qBp: Int): Long = {
    val rank = math.max(1, ((sorted.size.toLong * qBp + 9999) / 10000).toInt)
    sorted(rank - 1)
  }

  test("QH: estimates never overshoot; relative error bounded by 2^-sub") {
    val r = new scala.util.Random(7)
    val vals = Seq.fill(4000)(math.abs(r.nextLong()) % 2000000L) ++
      Seq.fill(500)(r.nextInt(40).toLong) // heavy small-value tail
    val df = vals.toDF("v").withColumn("g", lit("all"))
    val qs = Seq(1000, 2500, 5000, 7500, 9500, 9900)
    val est = Sketch.qhPercentiles(df, col("v"), Seq("g"), qs, sub = 5)
      .select("q_bp", "est").as[(Int, Long)].collect().toMap
    val sorted = vals.sorted
    for (q <- qs) {
      val exact = discQ(sorted, q)
      val e = est(q)
      assert(e <= exact, s"q=$q est=$e > exact=$exact")
      // est is the exact value's bin lower bound: (exact+1) < (est+1)·(1+2^-5)
      assert(exact - e <= (exact + 1) / 32 + 1, s"q=$q est=$e exact=$exact")
    }
  }

  test("QH: exact below 2^sub — small-value bins are singletons") {
    val vals = (0 until 1000).map(i => (i % 31).toLong)
    val df = vals.toDF("v").withColumn("g", lit("all"))
    val qs = Seq(2500, 5000, 7500, 10000)
    val est = Sketch.qhPercentiles(df, col("v"), Seq("g"), qs, sub = 5)
      .select("q_bp", "est").as[(Int, Long)].collect().toMap
    val sorted = vals.sorted
    for (q <- qs) assert(est(q) === discQ(sorted, q), s"q=$q")
  }

  test("QH: bin tables from disjoint inputs merge by sum — quantiles identical") {
    val r = new scala.util.Random(11)
    val df = Seq.fill(3000)(r.nextInt(500000).toLong).toDF("v")
      .withColumn("g", (col("v") % 3).cast("string"))
    val (a, b) = (df.filter(col("v") % 2 === 0), df.filter(col("v") % 2 === 1))
    val merged = Sketch.qhBins(a, col("v"), Seq("g")).union(Sketch.qhBins(b, col("v"), Seq("g")))
      .groupBy("g", "bin").agg(sum("cnt").as("cnt"))
    val whole = Sketch.qhBins(df, col("v"), Seq("g"))
    assert(merged.except(whole).isEmpty && whole.except(merged).isEmpty)
    val qs = Seq(5000, 9900)
    val qM = Sketch.qhQuantiles(merged, Seq("g"), qs).orderBy("g", "q_bp").collect().toSeq
    val qW = Sketch.qhQuantiles(whole, Seq("g"), qs).orderBy("g", "q_bp").collect().toSeq
    assert(qM === qW)
  }

  test("QH: per-group independence and negative-value fail-fast") {
    val df = (Seq.fill(800)(10L).map((_, "small")) ++ Seq.fill(800)(100000L).map((_, "big")))
      .toDF("v", "g")
    val est = Sketch.qhPercentiles(df, col("v"), Seq("g"), Seq(5000), sub = 5)
      .select("g", "est").as[(String, Long)].collect().toMap
    assert(est("small") === 10L)
    assert(est("big") <= 100000L && est("big") > 96000L)
    val ex = intercept[Exception] {
      Seq(-1L).toDF("v").withColumn("g", lit("x"))
        .transform(d => Sketch.qhPercentiles(d, col("v"), Seq("g"), Seq(5000))).collect()
    }
    assert(ex.getMessage.contains("qhBins") || ex.getCause != null)
  }

  test("QH: sketch is pure Catalyst — partial agg, no UDF boundary") {
    val df = (0 until 200).map(_.toLong).toDF("v").withColumn("g", lit("x"))
    val plan = Sketch.qhBins(df, col("v"), Seq("g")).queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), s"no hash agg:\n$plan")
    assert(!plan.toLowerCase.contains("batchevalpython") && !plan.contains("UDF"),
      s"udf boundary in plan:\n$plan")
  }

  test("KMV: custom aggregate equals ORDER-BY-hash-LIMIT-k; estimators replay exactly") {
    import graft.datapipe.Dedup
    val k = 64
    val aWords = (0 until 400).map(i => s"a$i") ++ (0 until 100).map(i => s"s$i")
    val bWords = (0 until 200).map(i => s"b$i") ++ (0 until 100).map(i => s"s$i")
    val cWords = (0 until 10).map(i => s"c$i") // unsaturated: 10 < k
    val rows = aWords.map(("A", _)) ++ bWords.map(("B", _)) ++ cWords.map(("C", _)) ++
      aWords.take(250).map(("A", _)) // duplicates must not change the sketch
    val df = rows.toDF("grp", "w")
    val sk = Sketch.kmvSketch(df, col("w"), Seq("grp"), k)
    val got = sk.as[(String, Seq[Long])].collect().toMap
    def bottomK(ws: Seq[String]) = ws.distinct.map(Dedup.hash48).distinct.sorted.take(k)
    assert(got("A") === bottomK(aWords))
    assert(got("B") === bottomK(bWords))
    assert(got("C") === bottomK(cWords) && got("C").size === 10)
    // partial/merge path independence: a different partitioning, same sketch
    val got7 = Sketch.kmvSketch(df.repartition(7), col("w"), Seq("grp"), k)
      .as[(String, Seq[Long])].collect().toMap
    assert(got7 === got)
    // null keys contribute nothing
    val withNull = df.union(Seq(("A", null.asInstanceOf[String])).toDF("grp", "w"))
    assert(Sketch.kmvSketch(withNull, col("w"), Seq("grp"), k)
      .as[(String, Seq[Long])].collect().toMap === got)
    // distinct estimator: exact when unsaturated, (k−1)·2^48/h_k when not
    val ests = sk.withColumn("est", Sketch.kmvDistinctCol("kmv", k))
      .select("grp", "est").as[(String, Long)].collect().toMap
    assert(ests("C") === 10L)
    val expEstA = (1L << 48) * (k - 1) / bottomK(aWords).last
    assert(ests("A") === expEstA)
    val errA = math.abs(expEstA.toDouble - 500) / 500
    assert(errA < 0.35, s"KMV estimate err $errA at k=$k") // σ ≈ 1/√(k−2) ≈ 0.13
    // overlap protocol replay (A vs B share the 100 s-words)
    val ov = Sketch.kmvOverlap(sk.filter(col("grp").isin("A", "B")), "grp", k)
      .as[(String, String, Long, Long, Long, Long)].collect()
    assert(ov.length === 1 && ov.head._1 === "A" && ov.head._2 === "B")
    val hA = bottomK(aWords).toSet; val hB = bottomK(bWords).toSet
    val u = (hA ++ hB).toSeq.sorted.take(k)
    val k2 = u.size.toLong
    val shared = u.count(h => hA(h) && hB(h)).toLong
    val unionEst = if (k2 < k) k2 else (1L << 48) * (k - 1) / u.last
    assert(ov.head === (("A", "B", unionEst, shared,
      shared * unionEst / k2, shared * 10000L / k2)))
  }
}
