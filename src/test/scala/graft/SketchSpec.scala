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
}
