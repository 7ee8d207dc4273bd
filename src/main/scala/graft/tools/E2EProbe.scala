package graft.tools
import org.apache.spark.sql.SparkSession
object E2EProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val n = if (args.nonEmpty) args(0).toInt else 25000
    val s = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    import s.implicits._
    s.sparkContext.setLogLevel("WARN")
    val dict = s.createDataset(graft.fixtures.Fixtures.entityDictionary()).toDF()
    // warm
    locally {
      val w = java.nio.file.Files.createTempDirectory("e2e-warm").toString
      graft.Pipeline.runAll(s, graft.fixtures.Fixtures.inputDocsDs(s, 2000, 8 * cpus), dict, w, buckets = cpus, resume = false).count()
    }
    for (_ <- 1 to 2) {
      val work = java.nio.file.Files.createTempDirectory("e2e-probe").toString
      val docs = graft.fixtures.Fixtures.inputDocsDs(s, n, 8 * cpus)
      val t0 = System.nanoTime()
      val nT = graft.Pipeline.runAll(s, docs, dict, work, buckets = cpus, resume = false).count()
      val sec = (System.nanoTime() - t0) / 1e9
      val files = {
        def cnt(f: java.io.File): Int = if (f.isDirectory) f.listFiles.map(cnt).sum else (if (f.getName.endsWith(".parquet")) 1 else 0)
        cnt(new java.io.File(work))
      }
      println(f"[e2eprobe] $n docs -> $nT triples in $sec%.2f s = ${n / sec}%.0f docs/s, $files parquet files")
      def rm(f: java.io.File): Unit = { if (f.isDirectory) f.listFiles.foreach(rm); f.delete() }
      rm(new java.io.File(work))
    }
    s.stop()
  }
}
