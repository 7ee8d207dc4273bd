package graft.ner

import org.apache.spark.sql.{Dataset, SparkSession}

/** Sentence classification head (SURVEY §2 F14, reference
  * model/sentclassifier.py:14-59 + wordsequence.py:114-155
  * `sentence_representation`). Dead code for the NEMO pipelines, implemented
  * for surface completeness: a user of the reference's NCRF++ fork can run
  * sentence-level classification ("SentClassifier" task) as well as sequence
  * labeling.
  *
  * Representation (mirrors the reference):
  *  - LSTM extractor: concat of every layer's and direction's FINAL hidden
  *    state (torch's h_n flattened — sentclassifier reads `hidden[0]`);
  *  - CNN extractor: global max-pool over the per-position CNN features.
  * A separate linear head maps the representation to label scores; prediction
  * is argmax, training loss is softmax cross-entropy (F.cross_entropy).
  *
  * Distribution: classification is embarrassingly parallel (mapPartitions
  * with the broadcast model — same shape as the tagger's annotate stage);
  * head training is one treeAggregate per minibatch of the exact
  * softmax-regression gradient, mirroring `Trainer`.
  */
object SentClassifier {

  /** The tagger encoder + a sentence-level linear head.
    * `labels(k)` is the class name for head row k. */
  final case class SentModel(
      base: NerModel,
      labels: IndexedSeq[String],
      w: Array[Array[Float]],  // numClasses × repDim
      b: Array[Float])

  /** Sentence representation (reference wordsequence.py:114-155). Empty
    * sentences map to the zero vector (the reference cannot batch them). */
  def represent(m: NerModel, tokens: IndexedSeq[String]): Array[Float] = {
    if (tokens.isEmpty) new Array[Float](repDim(m))
    else if (m.config.wordExtractor == "CNN") {
      // max-pool the per-position CNN features (already ReLU'd in features())
      val feats = Scorer.features(m, tokens)
      val rep = new Array[Float](m.featDim)
      java.util.Arrays.fill(rep, Float.MinValue)
      var t = 0
      while (t < feats.length) {
        var d = 0
        while (d < rep.length) { if (feats(t)(d) > rep(d)) rep(d) = feats(t)(d); d += 1 }
        t += 1
      }
      rep
    } else {
      // h_n of every layer and direction, concatenated (layer-major, fwd then
      // bwd — torch's h_n ordering)
      var reps: Array[Array[Float]] = {
        val a = new Array[Array[Float]](tokens.length)
        var i = 0
        while (i < tokens.length) { a(i) = Scorer.wordRep(m, tokens(i)); i += 1 }
        a
      }
      val parts = Array.ofDim[Array[Float]](m.lstm.length * 2)
      var layer = 0
      while (layer < m.lstm.length) {
        val fwd = Scorer.lstmRun(m.lstm(layer)(0), reps, reverse = false)
        val bwd = Scorer.lstmRun(m.lstm(layer)(1), reps, reverse = true)
        parts(2 * layer) = fwd(fwd.length - 1) // final hidden of the forward run
        parts(2 * layer + 1) = bwd(0)          // final hidden of the backward run
        if (layer < m.lstm.length - 1) { // top layer's per-token merge is never read
          val merged = new Array[Array[Float]](reps.length)
          var t = 0
          while (t < reps.length) { merged(t) = fwd(t) ++ bwd(t); t += 1 }
          reps = merged
        }
        layer += 1
      }
      parts.flatten
    }
  }

  /** Dimension of [[represent]]'s output for a given base model. */
  def repDim(m: NerModel): Int =
    if (m.config.wordExtractor == "CNN") m.featDim else m.lstm.length * 2 * m.config.hidden

  /** Class scores for one sentence. */
  def scores(sm: SentModel, tokens: IndexedSeq[String]): Array[Float] =
    Scorer.affine(sm.w, sm.b, represent(sm.base, tokens))

  /** Predicted class (argmax, deterministic lowest-index tie-break — torch.max). */
  def classify(sm: SentModel, tokens: IndexedSeq[String]): String = {
    val s = scores(sm, tokens)
    var best = 0
    var i = 1
    while (i < s.length) { if (s(i) > s(best)) best = i; i += 1 }
    sm.labels(best)
  }

  /** Distributed classification: broadcast model, narrow mapPartitions. */
  def classifyDs[K](spark: SparkSession, sm: SentModel,
                    sents: Dataset[(K, Seq[String])])(
      implicit ev: org.apache.spark.sql.Encoder[(K, String)]): Dataset[(K, String)] = {
    val bc = spark.sparkContext.broadcast(sm)
    sents.mapPartitions(_.map { case (k, toks) => (k, classify(bc.value, toks.toIndexedSeq)) })
  }

  /** Softmax cross-entropy of one sentence (reference F.cross_entropy). */
  def crossEntropy(sm: SentModel, tokens: IndexedSeq[String], goldClass: Int): Double = {
    val s = scores(sm, tokens)
    var mx = Float.NegativeInfinity
    s.foreach(v => if (v > mx) mx = v)
    var z = 0.0
    s.foreach(v => z += math.exp((v - mx).toDouble))
    math.log(z) + mx - s(goldClass)
  }

  /** Head-gradient accumulator: softmax regression over frozen representations
    * ((p − onehot) ⊗ rep) — exact, like the tagger's head path. */
  final class HeadGrad(numClasses: Int, dim: Int) extends Serializable {
    val dW = Array.ofDim[Double](numClasses, dim)
    val dB = new Array[Double](numClasses)
    var loss = 0.0
    var n = 0L
    def merge(o: HeadGrad): HeadGrad = {
      var i = 0
      while (i < dW.length) {
        var j = 0
        while (j < dW(i).length) { dW(i)(j) += o.dW(i)(j); j += 1 }
        dB(i) += o.dB(i)
        i += 1
      }
      loss += o.loss; n += o.n
      this
    }
  }

  def accumulate(sm: SentModel, acc: HeadGrad, tokens: IndexedSeq[String], goldClass: Int): Unit =
    accumulateRep(sm, acc, represent(sm.base, tokens), goldClass)

  /** Same, over a PRECOMPUTED representation (the head trainer featurizes each
    * sentence once — the base encoder never changes during head training). */
  def accumulateRep(sm: SentModel, acc: HeadGrad, rep: Array[Float], goldClass: Int): Unit = {
    val s = Scorer.affine(sm.w, sm.b, rep)
    var mx = Float.NegativeInfinity
    s.foreach(v => if (v > mx) mx = v)
    var z = 0.0
    val p = new Array[Double](s.length)
    var k = 0
    while (k < s.length) { p(k) = math.exp((s(k) - mx).toDouble); z += p(k); k += 1 }
    k = 0
    while (k < s.length) {
      val g = p(k) / z - (if (k == goldClass) 1.0 else 0.0)
      val row = acc.dW(k)
      var d = 0
      while (d < rep.length) { row(d) += g * rep(d); d += 1 }
      acc.dB(k) += g
      k += 1
    }
    acc.loss += math.log(z) + mx - s(goldClass)
    acc.n += 1
  }

  /** Distributed head training: full-batch GD per epoch via treeAggregate
    * (the loop mechanics live in Trainer; this is the classifier analog).
    * Representations are computed ONCE through the frozen base encoder;
    * epochs re-pay only the softmax-regression math. */
  def trainHead(
      spark: SparkSession,
      data: Dataset[(Seq[String], String)],
      init: SentModel,
      epochs: Int = 20,
      lr0: Double = 0.5,
      lrDecay: Double = 0.05): (SentModel, Seq[Double]) = {
    // the cached RDD's lineage closes over this broadcast (cache misses and
    // task retries recompute through it) — destroyed only in the finally
    val bcInit = spark.sparkContext.broadcast(init)
    val reps = data.rdd.flatMap { case (toks, cls) =>
      val k = bcInit.value.labels.indexOf(cls)
      if (k >= 0 && toks.nonEmpty) Some((represent(bcInit.value.base, toks.toIndexedSeq), k))
      else None
    }.cache()
    reps.count() // one-time featurization; cached blocks serve the epochs
    var sm = init
    val losses = Vector.newBuilder[Double]
    try {
      for (epoch <- 0 until epochs) {
        val lr = lr0 / (1.0 + lrDecay * epoch)
        val bc = spark.sparkContext.broadcast(sm)
        val acc = reps.treeAggregate(new HeadGrad(init.labels.length, repDim(init.base)))(
          (a, ex) => { accumulateRep(bc.value, a, ex._1, ex._2); a },
          (a1, a2) => a1.merge(a2))
        bc.destroy()
        if (acc.n > 0) {
          val s = lr / acc.n
          sm = sm.copy(
            w = Array.tabulate(sm.w.length)(i =>
              Array.tabulate(sm.w(i).length)(j => (sm.w(i)(j) - s * acc.dW(i)(j)).toFloat)),
            b = Array.tabulate(sm.b.length)(i => (sm.b(i) - s * acc.dB(i)).toFloat))
          losses += acc.loss / acc.n
        } else losses += 0.0
      }
    } finally { reps.unpersist(); bcInit.destroy(); () }
    (sm, losses.result())
  }

  /** Fresh zero-head classifier over a base tagger model. */
  def init(base: NerModel, labels: Seq[String]): SentModel =
    SentModel(base, labels.toIndexedSeq,
      Array.fill(labels.length)(new Array[Float](repDim(base))),
      new Array[Float](labels.length))
}
