package graft.tools

import graft.{Pipeline, SparkEntry}
import graft.fixtures.Fixtures
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level profiling of the bench workload at two parallelism levels —
  * development tool for chasing scaling-efficiency regressions. */
object Profile {
  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Single-thread pure-Scala run of the annotate body (no Spark, no encoder):
    * isolates NLP-inner-loop cost from Dataset serialization overhead. */
  def localLoop(nDocs: Int): (Double, Long) = {
    val m = SparkEntry.fixtureModels
    val lex = m.lexPredicate
    val t0 = System.nanoTime()
    var i = 0
    var acc = 0L
    while (i < nDocs) {
      val fd = Fixtures.doc(i)
      val doc = Pipeline.annotateDoc(m, lex, graft.schema.InputDoc(fd.docId, fd.spans.toArray))
      acc += doc.sents.length
      i += 1
    }
    ((System.nanoTime() - t0) / 1e9, acc)
  }

  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toInt else 40000
    val parts = 256
    localLoop(3000) // JIT warm the pure loop
    val (secLocal, _) = localLoop(20000)
    println(f"[profile] local-loop single-thread: $secLocal%.2f s for 20000 docs = ${20000 / secLocal}%.0f docs/s/thread")
    // full JIT warmup BEFORE any timing, on a throwaway session
    locally {
      val spark = session(32)
      val models = spark.sparkContext.broadcast(SparkEntry.fixtureModels)
      for (_ <- 0 until 3)
        Pipeline.extractMentions(Pipeline.annotate(spark, Fixtures.inputDocsDs(spark, 8000, parts), models), "morph").count()
      spark.stop()
    }
    for (cpus <- Seq(8, 32)) {
      val spark = session(cpus)
      val models = spark.sparkContext.broadcast(SparkEntry.fixtureModels)
      def time(tag: String)(f: => Long): Unit = {
        val t0 = System.nanoTime()
        val n = f
        println(f"[profile] cpus=$cpus $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s (n=$n)")
      }
      Pipeline.extractMentions(Pipeline.annotate(spark, Fixtures.inputDocsDs(spark, 2000, parts), models), "morph").count()
      for (i <- 1 to 3)
        time(s"pipeline-e2e-$i")(Pipeline.extractMentions(Pipeline.annotate(spark, Fixtures.inputDocsDs(spark, nDocs, parts), models), "morph").count())
      time("annotate-only")(Pipeline.annotate(spark, Fixtures.inputDocsDs(spark, nDocs, parts), models).count())
      spark.stop()
    }
  }
}
