package graft.tools

import graft.{Pipeline, SparkEntry}
import graft.fixtures.Fixtures
import org.apache.spark.sql.SparkSession

/** Single-level scaling probe (one JVM per level → isolated GC/JIT state). */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val nDocs = args(1).toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val models = spark.sparkContext.broadcast(SparkEntry.fixtureModels)
    def run(n: Int): Double = {
      val t0 = System.nanoTime()
      Pipeline.extractMentions(
        Pipeline.annotate(spark, Fixtures.inputDocsDs(spark, n, 256), models), "morph").count()
      (System.nanoTime() - t0) / 1e9
    }
    run(8000); run(8000) // warm
    val secs = (1 to 3).map(_ => run(nDocs))
    println(f"[scaleprobe] cpus=$cpus best=${secs.min}%.2f s all=${secs.map(s => f"$s%.2f").mkString(",")} docs/s=${nDocs / secs.min}%.0f")
    spark.stop()
  }
}
