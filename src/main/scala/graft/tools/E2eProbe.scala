package graft.tools

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Standalone end-to-end runAll probe with per-stage manifest timings —
  * for isolating e2e stage regressions without paying the full Bench sweep.
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.E2eProbe [nDocs] [rounds]"
  */
object E2eProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(25000)
    val rounds = if (args.length > 1) args(1).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    (1 to rounds).foreach { r =>
      val s = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      import s.implicits._
      val dict = s.createDataset(graft.fixtures.Fixtures.entityDictionary()).toDF()
      val docs = graft.fixtures.Fixtures.inputDocsDs(s, nDocs, cpus * 2)
      val work = Files.createTempDirectory("graft-e2e-probe").toString
      val t0ms = System.currentTimeMillis()
      val t0 = System.nanoTime()
      val nT = graft.Pipeline.runAll(s, docs, dict, work, buckets = cpus, resume = false).count()
      val sec = (System.nanoTime() - t0) / 1e9
      val stages = graft.io.TableFormat.stageWallsSec(work,
        Seq("docs_labeled", "mentions", "linked", "entities", "triples"), t0ms)
      println(f"E2EPROBE round=$r docs=$nDocs triples=$nT wall=$sec%.2fs " +
        stages.map { case (k, v) => f"$k=$v%.2fs" }.mkString(" "))
      s.stop()
    }
  }
}
