package graft.tools

import graft.io.TableFormat
import graft.fixtures.Fixtures
import org.apache.spark.sql.SparkSession

/** Writes the deterministic fixture corpus as a real bucketed input table —
  * the from-table path of graft.Main, and the shape a production ingest would
  * produce. */
object WriteFixtureTable {
  def main(args: Array[String]): Unit = {
    val path = args(0)
    val n = if (args.length > 1) args(1).toInt else 1000
    val buckets = if (args.length > 2) args(2).toInt else 8
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Fixtures.inputDocsDs(spark, n, 32).toDF()
    TableFormat.save(docs, path, "doc_id", buckets, stage = "input")
    println(s"[graft] fixture table written: $n docs at $path")
    spark.stop()
  }
}
