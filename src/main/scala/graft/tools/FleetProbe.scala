package graft.tools

import java.lang.management.ManagementFactory
import java.util.concurrent.atomic.AtomicInteger

/** Multi-PROCESS fleet-scaling probe: W worker JVMs × T threads each, every
  * worker annotating its own disjoint doc range — the closest this single-box
  * sandbox gets to "the same job on a 1-worker vs 4-worker cluster". Unlike
  * local[4T] in one JVM, each worker has its own heap, allocator, GC and JIT
  * (exactly like separate executor processes on a fleet); the only shared
  * resource left is the box's memory bus.
  *
  * Reading the result: if aggregate docs/s at 4×T is ≈4× the 1×T rate, the
  * ENGINE scales across workers and any local[4T] shortfall is single-JVM or
  * host-level, not architectural. If 4×T also falls short, compare its
  * per-worker CPU-µs/doc to the 1×T level: inflation with steal≈0 and GC≈0
  * is the memory-bandwidth ceiling (shared bus) that separate HOSTS in a real
  * fleet do not share — corroborating, process-isolated, the ThreadProbe
  * argument in BENCH/NOTES.md.
  *
  * Usage: `sbt "runMain graft.tools.FleetProbe"` (defaults: T=8, fleet sizes
  * 1 and 4, 40000 docs per worker). Env: FLEETPROBE_DOCS, FLEETPROBE_THREADS,
  * FLEETPROBE_FLEETS (comma-separated worker counts).
  * As a child: `FleetProbe worker <startDoc> <nDocs> <threads>`.
  */
object FleetProbe {

  def main(args: Array[String]): Unit =
    if (args.headOption.contains("worker")) workerMain(args) else driverMain()

  /** Child JVM: annotate [start, start+n) on T threads, print one stats line. */
  private def workerMain(args: Array[String]): Unit = {
    val start = args(1).toInt
    val n = args(2).toInt
    val threads = args(3).toInt
    val m = graft.SparkEntry.fixtureModels
    val lex: String => Boolean = m.lexicon.contains _
    val bean = ManagementFactory.getThreadMXBean
    def annotate(i: Int): Int = {
      val fd = graft.fixtures.Fixtures.doc(i)
      graft.Pipeline.annotateDoc(m, lex, graft.schema.InputDoc(fd.docId, fd.spans.toArray)).sents.length
    }
    (start until start + 4000).foreach(annotate) // JIT warmup
    val next = new AtomicInteger(0)
    val cpuNs = new java.util.concurrent.atomic.AtomicLong(0)
    val t0 = System.nanoTime()
    val ts = (0 until threads).map { _ =>
      new Thread(() => {
        val tid = Thread.currentThread().getId
        val c0 = bean.getThreadCpuTime(tid)
        var i = next.getAndIncrement()
        while (i < n) { annotate(start + i); i = next.getAndIncrement() }
        cpuNs.addAndGet(bean.getThreadCpuTime(tid) - c0)
        ()
      })
    }
    ts.foreach(_.start()); ts.foreach(_.join())
    val wall = (System.nanoTime() - t0) / 1e9
    // stdout contract parsed by the driver: WORKER <wallSec> <cpuSec>
    println(f"WORKER ${wall}%.4f ${cpuNs.get / 1e9}%.4f")
  }

  final case class FleetRow(workers: Int, threads: Int, wall: Double,
                            cpuSec: Double, docs: Long) {
    def dps: Double = docs / wall
    def cpuUsPerDoc: Double = cpuSec * 1e6 / docs
  }

  /** Run the multi-process probe: for each fleet size, spawn that many worker
    * JVMs and aggregate. Returns the BEST round per fleet size (rounds warm
    * the page cache / scheduler; throughput over the workers' measured
    * post-warmup sections — max worker wall is the fleet makespan, since
    * workers start within ~1 s of each other). */
  def run(fleets: Seq[Int], threads: Int, docsPerWorker: Int,
          rounds: Int = 2, quiet: Boolean = false): Seq[FleetRow] = {
    val java = s"${System.getProperty("java.home")}/bin/java"
    val cp = System.getProperty("java.class.path")
    val best = collection.mutable.LinkedHashMap[Int, FleetRow]()
    for (round <- 1 to rounds; w <- fleets) {
      val t0 = System.nanoTime()
      val procs = (0 until w).map { k =>
        new ProcessBuilder(java, "-Xmx4g", "-XX:+UseParallelGC", "-cp", cp,
          "graft.tools.FleetProbe", "worker",
          (k * docsPerWorker).toString, docsPerWorker.toString, threads.toString)
          .redirectErrorStream(true).start()
      }
      val stats = procs.map { p =>
        val out = new String(p.getInputStream.readAllBytes())
        p.waitFor()
        val line = out.linesIterator.find(_.startsWith("WORKER "))
          .getOrElse(sys.error(s"worker died:\n$out"))
        val Array(_, wall, cpu) = line.split(" ")
        (wall.toDouble, cpu.toDouble)
      }
      val outerWall = (System.nanoTime() - t0) / 1e9
      val row = FleetRow(w, threads, stats.map(_._1).max, stats.map(_._2).sum,
        w.toLong * docsPerWorker)
      if (!best.contains(w) || row.dps > best(w).dps) best(w) = row
      if (!quiet)
        println(f"[fleetprobe] round=$round workers=$w%2d x $threads threads  wall=${row.wall}%7.2f s (outer $outerWall%.2f)  docs=${row.docs}%7d  agg-docs/s=${row.dps}%8.0f  cpu-us/doc=${row.cpuUsPerDoc}%7.1f")
    }
    best.values.toSeq
  }

  private def driverMain(): Unit = {
    val docsPerWorker = sys.env.getOrElse("FLEETPROBE_DOCS", "40000").toInt
    val threads = sys.env.getOrElse("FLEETPROBE_THREADS", "8").toInt
    val fleets = sys.env.getOrElse("FLEETPROBE_FLEETS", "1,4")
      .split(",").map(_.trim.toInt).toSeq
    val rows = run(fleets, threads, docsPerWorker)
    for (Seq(lo, hi) <- rows.sortBy(_.workers).sliding(2).toSeq if rows.size >= 2) {
      val eff = (hi.dps / lo.dps) / (hi.workers.toDouble / lo.workers)
      println(f"[fleetprobe] scaling ${lo.workers}x$threads -> ${hi.workers}x$threads: efficiency=$eff%.4f (best-of-rounds aggregate throughput)")
    }
  }
}
