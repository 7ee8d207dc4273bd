package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans for the registered queries — the
  * plan-quality review loop (PushedFilters reaching the scan, broadcast joins
  * where a side is small, WholeStageCodegen spans, no stray shuffles). */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.drop(1).toSet else Set.empty[String]
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
         if names.isEmpty || names.contains(name)) {
      println(s"\n========== $name ==========")
      try println(fn(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      catch { case e: Throwable => println(s"explain failed: $e") }
    }
    spark.stop()
  }
}
