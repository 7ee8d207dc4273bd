package graft.tools

/** Measures per-doc sentence batching (production: all sentences of one doc
  * decode as one batch per model, ~3 sentences/batch at fixture shape) against
  * the reference's cross-doc batching (10 sentences per batch regardless of
  * document boundary, utils/data.py:97) on the pure decode path — the data
  * that decides VERDICT r2 "What's missing #3" without building anything.
  *
  * Expectation to test: unlike the reference's tensor scorer (where padding a
  * batch to max length vectorizes the matmul), our JVM scorer runs
  * per-sentence loops inside decodeBatch, so batch composition should be
  * wall-neutral and only the grouped/sort bookkeeping differs. */
object BatchProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toInt else 30000
    val m = graft.SparkEntry.fixtureModels
    // materialize tokenized sentences once — isolate decode cost from fixture gen
    val docSents: IndexedSeq[IndexedSeq[IndexedSeq[String]]] =
      (0 until nDocs).map { i =>
        val fd = graft.fixtures.Fixtures.doc(i)
        fd.sentences.map(s => s.tokens.toIndexedSeq).toIndexedSeq
      }
    val nSents = docSents.map(_.length).sum
    def perDoc(): Long = {
      var acc = 0L
      for (sents <- docSents) acc += graft.ner.Scorer.decodeBatch(m.single, sents).length
      acc
    }
    def pooled(): Long =
      graft.ner.Scorer.decodePartition(m.single,
        docSents.iterator.flatten.map(s => ((), s))).length.toLong
    def time(tag: String)(f: => Long): Double = {
      val t0 = System.nanoTime(); val n = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[batchprobe] $tag: $sec%6.2f s  (${nSents / sec}%8.0f sents/s, n=$n)")
      sec
    }
    // JIT warm both paths
    for (_ <- 1 to 2) { perDoc(); pooled() }
    println(s"[batchprobe] $nDocs docs, $nSents sentences, " +
      f"avg ${nSents.toDouble / nDocs}%.2f sents/doc; model batchSize=${m.single.config.batchSize}")
    for (round <- 1 to 3) {
      val a = time(s"r$round per-doc batches   ")(perDoc())
      val b = time(s"r$round cross-doc batch=${m.single.config.batchSize}")(pooled())
      println(f"[batchprobe] r$round cross-doc/per-doc wall ratio = ${b / a}%.3f")
    }
  }
}
