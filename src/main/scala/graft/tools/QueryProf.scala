package graft.tools

import org.apache.spark.sql.SparkSession

/** Targeted per-query timing: `runMain graft.tools.QueryProf <sfDir> <q...>`
  * times just the named SparkEntry queries (3 passes each, min reported) at
  * SPARK_GRAFT_CPUS — the iteration loop for chasing a single hot query
  * without paying the full Bench sweep (probes, scaling rounds, e2e). */
object QueryProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_QUERY_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (tb <- Seq("lineitem", "orders", "documents", "embeddings", "events"))
      try { spark.read.parquet(s"$sfDir/$tb.parquet").count(); () }
      catch { case _: Throwable => () }
    val qs = graft.SparkEntry.queries.filter(kv => names.isEmpty || names.contains(kv._1))
    qs.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"QPROF $name%-28s min=${times.min}%7.3f  runs=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
