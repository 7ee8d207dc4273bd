package graft.tools

import java.util.concurrent.atomic.AtomicLong

/** Control experiment for the thread-scaling probes: a ZERO-allocation,
  * cache-resident integer kernel (xorshift64) timed at several thread
  * counts. If CPU-time-per-unit inflates at 32 threads even here — no
  * allocation, no shared data, ~zero memory traffic — the inflation is
  * ENVIRONMENTAL (hypervisor scheduling / all-core turbo / SMT of the
  * underlying host), not a property of any job. The ratio measured here is
  * the machine's own parallel-slowdown floor; the annotate kernel's ratio
  * can only be judged against it, not against the ideal 1.0.
  *
  * Usage: SPINPROBE_ITERS=2000000000 sbt "runMain graft.tools.SpinProbe 8 32"
  */
object SpinProbe {
  def main(args: Array[String]): Unit = {
    val levels = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 2, 8, 32)
    val itersTotal = sys.env.getOrElse("SPINPROBE_ITERS", "4000000000").toLong
    val rounds = sys.env.getOrElse("SPINPROBE_ROUNDS", "3").toInt
    val bean = java.lang.management.ManagementFactory.getThreadMXBean

    def spin(iters: Long): Long = { // xorshift64 — registers only
      var x = 88172645463325252L
      var i = 0L
      while (i < iters) {
        x ^= x << 13; x ^= x >>> 7; x ^= x << 17
        i += 1
      }
      x
    }

    // FP mode (SPINPROBE_FP=1): per-thread PRIVATE L1-resident float dot
    // products — the annotate kernel's arithmetic shape (vectorized FP32 FMA)
    // with ZERO shared memory and zero allocation. If CPU-per-iter inflates
    // at 32 threads here while the integer kernel holds ~1.0, the inflation
    // is all-core FP/AVX frequency droop — a property of the box, not of any
    // job's memory behavior.
    val fpMode = sys.env.contains("SPINPROBE_FP")
    def spinFp(iters: Long): Float = {
      val a = new Array[Float](256); val b = new Array[Float](256)
      var k = 0
      while (k < 256) { a(k) = k * 0.5f; b(k) = 1.0f / (k + 1); k += 1 }
      var acc = 0.0f
      var i = 0L
      val n = iters / 256
      while (i < n) {
        var s = 0.0f
        var j = 0
        while (j < 256) { s += a(j) * b(j); j += 1 }
        acc += s
        a(0) = acc // serialize: keep the loop from folding away
        i += 1
      }
      acc
    }

    def run(threads: Int): (Double, Double) = {
      val per = itersTotal / threads
      val cpuNs = new AtomicLong(0)
      val sink = new AtomicLong(0)
      val t0 = System.nanoTime()
      val ts = (0 until threads).map { _ =>
        new Thread(() => {
          val tid = Thread.currentThread().getId
          val c0 = bean.getThreadCpuTime(tid)
          sink.addAndGet(if (fpMode) spinFp(per).toLong else spin(per))
          cpuNs.addAndGet(bean.getThreadCpuTime(tid) - c0)
          ()
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join())
      val wall = (System.nanoTime() - t0) / 1e9
      (wall, cpuNs.get / 1e9)
    }

    if (fpMode) spinFp(itersTotal / 8) else spin(itersTotal / 8) // JIT warm
    for (r <- 1 to rounds; n <- levels) {
      val (wall, cpu) = run(n)
      val nsPerIter = cpu * 1e9 / itersTotal
      println(f"[spinprobe] round=$r n=$n%2d wall=$wall%7.2f s  cpu=$cpu%7.2f s  ns/iter=$nsPerIter%6.3f  iters/s=${itersTotal / wall}%,.0f")
    }
  }
}
