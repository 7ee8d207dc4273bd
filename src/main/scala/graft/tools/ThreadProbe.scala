package graft.tools

import java.lang.management.ManagementFactory

/** Pure-JVM thread-scaling probe (no Spark): N worker threads annotate a fixed
  * doc pool; reports wall, summed thread CPU, and CPU-per-doc at each level.
  * Distinguishes the job's intrinsic thread-scaling (allocator / memory
  * bandwidth / SMT effects show up as CPU-per-doc inflation) from Spark
  * scheduling and host-steal artifacts. Measurement kernel shared with
  * Bench.threadProbe and the FleetProbe workers ([[AnnotateKernel]]). */
object ThreadProbe {
  def main(args: Array[String]): Unit = {
    val levels = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(8, 32)
    val docsPerLevel = sys.env.getOrElse("THREADPROBE_DOCS", "60000").toInt
    val genOnly = sys.env.contains("THREADPROBE_GEN_ONLY")
    val annotate: Int => Int =
      if (genOnly) (i: Int) => graft.fixtures.Fixtures.doc(i).sentences.length
      else AnnotateKernel.pooledAnnotator(0, docsPerLevel)
    AnnotateKernel.warm(annotate)
    val gcBeans = ManagementFactory.getGarbageCollectorMXBeans
    def gcMs = { var s = 0L; gcBeans.forEach(b => s += b.getCollectionTime); s }
    for (round <- 1 to 2; n <- levels) {
      val gc0 = gcMs
      val r = AnnotateKernel.run(annotate, n, docsPerLevel)
      val gc = (gcMs - gc0) / 1e3
      println(f"[threadprobe] round=$round n=$n%2d wall=${r.wall}%7.2f s  cpu=${r.cpuSec}%7.2f s  gc=$gc%6.2f s  docs/s=${docsPerLevel / r.wall}%8.0f  cpu-us/doc=${r.cpuSec * 1e6 / docsPerLevel}%7.1f  util=${r.cpuSec / (r.wall * n) * 100}%5.1f%%")
    }
  }
}
