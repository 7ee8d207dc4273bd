package graft.tools

import org.apache.spark.sql.SparkSession

/** Time individual registered queries in isolation (bench-style warmed
  * second run) — for iterating on one operator without paying the full
  * Bench sweep. Usage:
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.TimeQuery <sfDir> <name>..."
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      def once(): (Long, Double) = {
        val t0 = System.nanoTime()
        val rows = fn(spark, sfDir).count()
        (rows, (System.nanoTime() - t0) / 1e9)
      }
      val (rows, cold) = once()
      val (_, warm) = once()
      println(f"TIMEQ $n%-28s rows=$rows%-8d cold=$cold%.3fs warm=$warm%.3fs")
    }
    spark.stop()
  }
}
