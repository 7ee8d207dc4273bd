package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Plan evidence for the ITERATIVE graph kernels (PageRank / LabelProp /
  * KCore / BFS), whose registered queries end in `localCheckpoint` — their
  * final `explain` is just `Scan ExistingRDD`, so the static-build plan
  * shape must be shown directly. This probe builds the kernels' static edge
  * frames over the real q_pagerank / ppEdges inputs in BOTH shapes —
  * round-5's `distinct → repartition(key)` and round-6's `repartition(key)
  * → distinct` — and prints the formatted plans, making the "2 Exchange →
  * 1" claim checkable without running the fixpoint loops.
  *
  * Usage: `sbt "runMain graft.tools.KernelPlans [sfDir]"`.
  */
object KernelPlans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def show(tag: String, df: DataFrame): Unit = {
      println(s"\n========== $tag ==========")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    // q_pagerank's edge input (SparkEntry registry shape)
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val e = li.select(col("l_orderkey").cast("long").as("src"),
      (col("l_partkey").cast("long") + 100000000L).as("dst"))
    val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))

    val w = org.apache.spark.sql.expressions.Window.partitionBy("src")
    show("pagerank_static_r5_distinct_then_repartition",
      sym.distinct().repartition(col("src"))
        .withColumn("deg", count(lit(1)).over(w)))
    show("pagerank_static_r6_repartition_then_distinct",
      sym.repartition(col("src")).distinct()
        .withColumn("deg", count(lit(1)).over(w)))

    // LabelProp/KCore/BFS share the same sym-build fusion over ppEdges'
    // co-purchase pairs; show it once on the same input
    show("labelprop_sym_r5", sym.distinct().repartition(col("src")))
    show("labelprop_sym_r6", sym.repartition(col("src")).distinct())
    spark.stop()
  }
}
