package graft

import org.apache.spark.sql.SparkSession

/** Noop-sink isolation bench (guide §1.4) — SEPARATE from the frozen
  * [[Bench]] harness: times named registered queries with
  * `write.format("noop")` so every column of every row is computed and the
  * sink costs nothing, and reports per-rep walls (cold rep included — the
  * session-artifact builds land there, exactly like Bench's first pass).
  * Used for the round-6 optimization evidence in OPTIMIZATION_r06.md; the
  * driver-comparable numbers stay Bench's own.
  *
  * Usage: `SPARK_GRAFT_CPUS=32 sbt "runMain graft.BenchExtra <sfDir> <query>..."`
  * (BENCH_EXTRA_REPS for the rep count, default 3; no args = every query).
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val reps = sys.env.getOrElse("BENCH_EXTRA_REPS", "3").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      val walls = (1 to reps).map { rep =>
        spark.sparkContext.setJobDescription(s"benchextra: $name rep $rep")
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          System.err.println(s"[benchextra] $name FAILED: ${e.getMessage}"); -1.0
        } finally spark.sparkContext.setJobDescription(null)
      }
      val ok = walls.filter(_ >= 0)
      val best = if (ok.nonEmpty) f"${ok.min}%.3f" else "FAILED"
      println(s"BENCH_EXTRA $name min=$best reps=" +
        walls.map(w => f"$w%.3f").mkString("[", ",", "]"))
    }
    spark.stop()
  }
}
