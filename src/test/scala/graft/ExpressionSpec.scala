package graft

import graft.functions.PolyHash64
import graft.datapipe.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

class ExpressionSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("PolyHash64 expression matches Dedup.polyHash (codegen and interpreted)") {
    val data = Seq("", "a", "שלום עולם", "the quick brown fox", "x" * 500)
    val df = data.toDF("s")
    val viaExpr = df.select(PolyHash64(col("s"))).as[Long].collect()
    val expected = data.map(Dedup.polyHash)
    assert(viaExpr.toSeq === expected)
    // force interpreted path too (eval parity)
    val interp = data.map(s => PolyHash64.hashString(s))
    assert(interp === expected)
  }

  test("PolyHash64 stays inside WholeStageCodegen (no udf boundary)") {
    // a real scan (range), not a LocalTableScan that constant-folds away
    val df = spark.range(100).select(PolyHash64(col("id").cast("string")).as("h"))
    val plan = df.queryExecution.executedPlan.toString
    // the "*(n)" operator prefix marks a WholeStageCodegen span
    assert(plan.contains("*(1) Project [polyhash64"), plan)
    assert(df.as[Long].collect().toSeq === (0L until 100L).map(i => Dedup.polyHash(i.toString)))
  }

  test("GraftExtensions registers polyhash64 for SQL") {
    // same registration path the extension uses, applied to the live session
    spark.sessionState.functionRegistry.registerFunction(
      new org.apache.spark.sql.catalyst.FunctionIdentifier("polyhash64"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[PolyHash64].getName, "polyhash64"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        PolyHash64(children.head))
    val got = spark.sql("SELECT polyhash64('abc') AS h").as[Long].head()
    assert(got === Dedup.polyHash("abc"))
  }

  test("CosineSim expression is bit-identical to the HOF formulation and codegen'd") {
    import graft.datapipe.Similarity
    val r = new Random(41)
    val df = (0 until 200).map(i => (i.toLong, Array.fill(32)(r.nextFloat() * 2 - 1)))
      .toDF("id", "v")
    val pairs = df.as("a").crossJoin(df.as("b"))
      .select(col("a.v").as("va"), col("b.v").as("vb"))
    val viaExpr = pairs.select(Similarity.cosineCol("va", "vb").as("c")).as[Double].collect()
    val viaHof = pairs.select(Similarity.cosineColHof("va", "vb").as("c")).as[Double].collect()
    assert(viaExpr.length === viaHof.length)
    viaExpr.zip(viaHof).foreach { case (a, b) => assert(a === b, s"$a != $b") }
    val plan = pairs.select(Similarity.cosineCol("va", "vb")).queryExecution.executedPlan.toString
    assert(plan.contains("cosine_sim"), plan)
  }

  test("null propagates") {
    val df = Seq(Some("a"), None).toDF("s").select(PolyHash64(col("s")).as("h"))
    val rows = df.collect()
    assert(!rows(0).isNullAt(0))
    assert(rows(1).isNullAt(0))
  }
}
