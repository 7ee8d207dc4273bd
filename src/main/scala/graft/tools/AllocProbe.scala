package graft.tools

import scala.collection.immutable.ArraySeq

/** Localizes the annotate kernel's memory-allocation rate per STAGE — the
  * working hypothesis for the 8→32 CPU/doc inflation (GC≈0, steal≈0) is
  * allocation-bandwidth contention: every allocated byte is zeroed (bus
  * write) and young-collected (bus read+write), so bytes/doc × docs/s bounds
  * the sustainable fleet throughput on one box long before GC *time* shows.
  *
  * Stages mirror [[graft.Pipeline.annotateDoc]]'s phases:
  *   tok    — HebTokenizer.tokenize
  *   single — Scorer.decodeBatch(m.single)  (token-single BiLSTM-CRF)
  *   multi  — Scorer.decodeBatch(m.multi)
  *   lat    — Analyzer.sentenceLattice + Prune + Disambig (MD)
  *   morph  — Scorer.decodeBatch(m.morph) over predicted morphemes
  *   full   — whole annotateDoc (assembly overhead = full − parts)
  *
  * Usage: ALLOCPROBE_DOCS=20000 sbt "runMain graft.tools.AllocProbe"
  */
object AllocProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.getOrElse("ALLOCPROBE_DOCS", "20000").toInt
    val bean = java.lang.management.ManagementFactory.getThreadMXBean
      .asInstanceOf[com.sun.management.ThreadMXBean]
    val tid = Thread.currentThread().getId
    val m = graft.SparkEntry.fixtureModels
    val lex = m.lexPredicate

    def docToks(i: Int): Array[Array[String]] = {
      val fd = graft.fixtures.Fixtures.doc(i)
      fd.spans.filter(_.kind == "text")
        .map(s => graft.text.HebTokenizer.tokenize(s.text).toArray).toArray
    }

    // pre-materialized pool for the pooled stage — annotate-only churn, the
    // shape the scaling probes measure (AnnotateKernel.pooledAnnotator)
    val pool = Array.tabulate(nDocs) { i =>
      val fd = graft.fixtures.Fixtures.doc(i)
      graft.schema.InputDoc(fd.docId, fd.spans.toArray)
    }

    final case class Stage(name: String, run: Int => Unit)
    val stages = Seq(
      Stage("gen", i => { graft.fixtures.Fixtures.doc(i); () }),
      Stage("tok", i => { docToks(i); () }),
      Stage("single", i => {
        val b = docToks(i).filter(t => t.nonEmpty && t.length < m.maxSentenceLength)
          .map(t => ArraySeq.unsafeWrapArray(t): IndexedSeq[String])
        graft.ner.Scorer.decodeBatch(m.single, ArraySeq.unsafeWrapArray(b)); ()
      }),
      Stage("multi", i => {
        val b = docToks(i).filter(t => t.nonEmpty && t.length < m.maxSentenceLength)
          .map(t => ArraySeq.unsafeWrapArray(t): IndexedSeq[String])
        graft.ner.Scorer.decodeBatch(m.multi, ArraySeq.unsafeWrapArray(b)); ()
      }),
      Stage("lat", i => {
        val toksAll = docToks(i).filter(t => t.nonEmpty && t.length < m.maxSentenceLength)
        val b = toksAll.map(t => ArraySeq.unsafeWrapArray(t): IndexedSeq[String])
        val multiB = graft.ner.Scorer.decodeBatch(m.multi, ArraySeq.unsafeWrapArray(b))
        var k = 0
        while (k < toksAll.length) {
          val lattice = graft.lattice.Analyzer
            .sentenceLattice(ArraySeq.unsafeWrapArray(toksAll(k)), lex).toIndexedSeq
          val pruned = graft.lattice.Prune.pruneSentence(lattice, multiB(k), nonOOnly = false)
          graft.lattice.Disambig.disambiguate(pruned, lex)
          k += 1
        }
      }),
      Stage("full", i => {
        val fd = graft.fixtures.Fixtures.doc(i)
        graft.Pipeline.annotateDoc(m, lex, graft.schema.InputDoc(fd.docId, fd.spans.toArray))
        ()
      }),
      Stage("pooled", i => { graft.Pipeline.annotateDoc(m, lex, pool(i)); () })
    )

    // JIT warm everything once
    stages.foreach(s => (0 until 2000).foreach(s.run))

    for (s <- stages) {
      val a0 = bean.getThreadAllocatedBytes(tid)
      val c0 = bean.getThreadCpuTime(tid)
      var i = 0
      while (i < nDocs) { s.run(i); i += 1 }
      val cpuUs = (bean.getThreadCpuTime(tid) - c0) / 1e3 / nDocs
      val kb = (bean.getThreadAllocatedBytes(tid) - a0).toDouble / 1024 / nDocs
      println(f"[alloc] ${s.name}%-7s ${cpuUs}%8.1f us/doc  ${kb}%9.1f KB/doc")
    }
  }
}
