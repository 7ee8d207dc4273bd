package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-shot plan capture for the triangle-count chain BEFORE the eager
  * localCheckpoint cut (the registry query's final plan is just the
  * post-cut `Scan ExistingRDD`; this rebuilds the same dataflow lazily so
  * PLANS.md can show the executed shape). */
object TriPlan {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .filter(col("l_partkey") < 10000)
      .select(col("l_orderkey"), col("l_partkey"))
    val in = li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
        col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
    // identical to Triangles.perNodeCounts, minus persist/checkpoint
    val e = in.select(
        least(col("src"), col("dst")).cast("long").as("pa"),
        greatest(col("src"), col("dst")).cast("long").as("pb"))
      .filter(col("pa") =!= col("pb") && col("pa").isNotNull)
      .distinct()
    val deg = e.select(explode(array(col("pa"), col("pb"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("d"))
    val fwd = col("da") < col("db") || (col("da") === col("db") && col("pa") < col("pb"))
    val oe = e
      .join(deg.select(col("node").as("pa"), col("d").as("da")), "pa")
      .join(deg.select(col("node").as("pb"), col("d").as("db")), "pb")
      .select(when(fwd, col("pa")).otherwise(col("pb")).as("u"),
              when(fwd, col("pb")).otherwise(col("pa")).as("v"))
    val tri = oe.as("e1")
      .join(oe.as("e2"), col("e1.v") === col("e2.u"))
      .join(oe.as("e3"), col("e3.u") === col("e1.u") && col("e3.v") === col("e2.v"))
      .select(col("e1.u").as("a"), col("e1.v").as("b"), col("e2.v").as("c"))
    val counts = tri
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))
    println(counts.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode))
    spark.stop()
  }
}
