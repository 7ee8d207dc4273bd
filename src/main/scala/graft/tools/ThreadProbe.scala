package graft.tools

import java.lang.management.ManagementFactory
import java.util.concurrent.atomic.AtomicInteger

/** Pure-JVM thread-scaling probe (no Spark): N worker threads annotate a fixed
  * doc pool; reports wall, summed thread CPU, and CPU-per-doc at each level.
  * Distinguishes the job's intrinsic thread-scaling (allocator / memory
  * bandwidth / SMT effects show up as CPU-per-doc inflation) from Spark
  * scheduling and host-steal artifacts. */
object ThreadProbe {
  def main(args: Array[String]): Unit = {
    val levels = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(8, 32)
    val docsPerLevel = sys.env.getOrElse("THREADPROBE_DOCS", "60000").toInt
    val m = graft.SparkEntry.fixtureModels
    val lex: String => Boolean = m.lexicon.contains _
    val bean = ManagementFactory.getThreadMXBean
    val genOnly = sys.env.contains("THREADPROBE_GEN_ONLY")
    def annotate(i: Int): Int = {
      val fd = graft.fixtures.Fixtures.doc(i)
      if (genOnly) fd.sentences.length
      else graft.Pipeline.annotateDoc(m, lex, graft.schema.InputDoc(fd.docId, fd.spans.toArray)).sents.length
    }
    // warm JIT on one thread
    (0 until 4000).foreach(annotate)
    val gcBeans = ManagementFactory.getGarbageCollectorMXBeans
    def gcMs = { var s = 0L; gcBeans.forEach(b => s += b.getCollectionTime); s }
    for (round <- 1 to 2; n <- levels) {
      val gc0 = gcMs
      val next = new AtomicInteger(0)
      val cpuNs = new java.util.concurrent.atomic.AtomicLong(0)
      val t0 = System.nanoTime()
      val threads = (0 until n).map { _ =>
        new Thread(() => {
          val tid = Thread.currentThread().getId
          val c0 = bean.getThreadCpuTime(tid)
          var i = next.getAndIncrement()
          while (i < docsPerLevel) { annotate(i); i = next.getAndIncrement() }
          cpuNs.addAndGet(bean.getThreadCpuTime(tid) - c0)
          ()
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      val wall = (System.nanoTime() - t0) / 1e9
      val cpu = cpuNs.get / 1e9
      val gc = (gcMs - gc0) / 1e3
      println(f"[threadprobe] round=$round n=$n%2d wall=$wall%7.2f s  cpu=$cpu%7.2f s  gc=$gc%6.2f s  docs/s=${docsPerLevel / wall}%8.0f  cpu-us/doc=${cpu * 1e6 / docsPerLevel}%7.1f  util=${cpu / (wall * n) * 100}%5.1f%%")
    }
  }
}
