package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B probe for the link-prediction wedge stage: sort-merge self-join vs
  * collect_list + map-side pair expansion, timed stage-by-stage on the
  * sf0.1 co-purchase graph. */
object LpProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
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
    val e = in.select(
        least(col("src"), col("dst")).cast("long").as("pa"),
        greatest(col("src"), col("dst")).cast("long").as("pb"))
      .filter(col("pa") =!= col("pb") && col("pa").isNotNull)
      .distinct().localCheckpoint()
    val deg = e.select(explode(array(col("pa"), col("pb"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("d"))
    val adj = e.select(col("pa").as("v"), col("pb").as("n"))
      .union(e.select(col("pb").as("v"), col("pa").as("n")))
    val adjCapped = adj
      .join(deg.filter(col("d") <= 100L).select(col("node").as("v")), "v")
      .localCheckpoint()

    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"LPPROBE $tag%-28s rows=$n%-10d ${(System.nanoTime() - t0) / 1e9}%.3fs")
    }

    time("wedges_join") {
      adjCapped.as("a").join(adjCapped.as("b"),
          col("a.v") === col("b.v") && col("a.n") < col("b.n"))
        .select(col("a.n").as("x"), col("b.n").as("y")).count()
    }
    val grouped = adjCapped.groupBy("v")
      .agg(sort_array(collect_list(col("n"))).as("ns")).localCheckpoint()
    time("wedges_explode") {
      grouped.select(explode(expr(
          "flatten(transform(ns, (x, i) -> transform(slice(ns, i + 2, size(ns)), y -> struct(x, y))))")).as("p"))
        .select(col("p.x").as("x"), col("p.y").as("y")).count()
    }
    time("cand_join") {
      adjCapped.as("a").join(adjCapped.as("b"),
          col("a.v") === col("b.v") && col("a.n") < col("b.n"))
        .select(col("a.n").as("x"), col("b.n").as("y"))
        .groupBy("x", "y").agg(count(lit(1)).as("cn"))
        .filter(col("cn") >= 8L).count()
    }
    time("cand_explode") {
      grouped.select(explode(expr(
          "flatten(transform(ns, (x, i) -> transform(slice(ns, i + 2, size(ns)), y -> struct(x, y))))")).as("p"))
        .select(col("p.x").as("x"), col("p.y").as("y"))
        .groupBy("x", "y").agg(count(lit(1)).as("cn"))
        .filter(col("cn") >= 8L).count()
    }
    spark.stop()
  }
}
