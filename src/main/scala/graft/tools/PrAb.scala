package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved A/B of the PageRank static-build variants (groupBy+join deg
  * vs fused window deg) — scratch probe for a perf decision, noise-robust
  * via alternation. */
object PrAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def edges(): DataFrame = {
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      val e = li.select(col("l_orderkey").cast("long").as("src"),
        (col("l_partkey").cast("long") + 100000000L).as("dst"))
      e.union(e.select(col("dst").as("src"), col("src").as("dst")))
    }

    // variant A: old build (distinct → groupBy deg → join → repartition)
    def runA(): Long = {
      val e = edges().select(col("src"), col("dst")).distinct()
      val outdeg = e.groupBy("src").agg(count(lit(1)).as("deg"))
      val e2 = e.join(outdeg, "src").repartition(col("src")).persist()
      val verts = e2.select(col("src").as("node"))
        .union(e2.select(col("dst").as("node"))).distinct()
        .repartition(col("node")).persist()
      val n = iterate(e2, verts)
      e2.unpersist(false); verts.unpersist(false); n
    }

    // variant B: fused build (current PageRank.run with allReceive)
    def runB(): Long =
      graft.kg.PageRank.run(spark, edges(), iterations = 5, allReceive = true).count()

    def iterate(e2: DataFrame, verts: DataFrame): Long = {
      val teleport = 150000L
      var ranks = verts.withColumn("rank", lit(1000000L))
      (0 until 5).foreach { i =>
        val contribs = e2
          .join(ranks.withColumnRenamed("node", "src"), "src")
          .select(col("dst").as("node"), expr("rank div deg").as("contrib"))
          .groupBy("node").agg(sum("contrib").as("inc"))
        ranks = contribs.select(col("node"),
          (lit(teleport) + expr("(85 * coalesce(inc, 0L)) div 100")).as("rank"))
        if (i < 4) ranks = ranks.localCheckpoint()
      }
      ranks.localCheckpoint().count()
    }

    def time(f: () => Long): Double = {
      val t0 = System.nanoTime(); val n = f(); val s = (System.nanoTime() - t0) / 1e9
      require(n > 0); s
    }
    time(() => runA()); time(() => runB()) // warmup both paths
    val rounds = sys.env.getOrElse("PRAB_ROUNDS", "4").toInt
    val (as, bs) = (0 until rounds).map { _ => (time(() => runA()), time(() => runB())) }.unzip
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    println(f"PRAB A(old)=${med(as)}%.3f  B(fused)=${med(bs)}%.3f  " +
      s"a=${as.map(x => f"$x%.2f").mkString(",")}  b=${bs.map(x => f"$x%.2f").mkString(",")}")
    spark.stop()
  }
}
