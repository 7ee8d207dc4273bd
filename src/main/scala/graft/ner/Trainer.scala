package graft.ner

import org.apache.spark.sql.{Dataset, SparkSession}

/** Distributed CRF training (SURVEY §2 F13, the reference's training loop —
  * ncrf_main.py:361-478: SGD + lr decay, per-epoch shuffle, minibatches,
  * best-dev checkpointing) re-expressed Spark-first.
  *
  * Two modes:
  *  - default (`trainEncoder = false`): the linear head (hidden2tag W/b) and
  *    the CRF transition matrix train over the FROZEN encoder, with EXACT
  *    analytic gradients from the forward–backward expected counts
  *    (Scorer.crfGradients). Features are computed once and cached — epochs
  *    re-pay only the head+CRF math.
  *  - `trainEncoder = true`: every parameter the reference trains receives
  *    exact gradients via the manual backprop in [[Backprop]] (BPTT through
  *    the BiLSTM stack and char BiLSTM, CNNs through max-pool/ReLU, embedding
  *    tables) — the hand-rolled replacement for torch autograd, each group
  *    verified against finite differences (BackpropSpec).
  *
  * Spark shape: one minibatch step = one `treeAggregate` over that batch's
  * partition of the data — per-partition gradient sums combine tree-wise, the
  * driver holds only O(T·featDim + T²) state, and nothing grows with corpus
  * size. Minibatches are drawn by an epoch-seeded hash partition of the
  * examples (a genuine reshuffle every epoch, deterministically). At fixture
  * scale batches are filter-scans; at 100 TB you would materialize the epoch
  * partition once (repartitionByRange on the hash) — same plan family as the
  * engine's bucketed stage writes.
  */
object Trainer {

  final case class TrainExample(tokens: Seq[String], labels: Seq[String]) {
    /** Memoized content hash — computed once per cached JVM object, so the
      * per-epoch minibatch assignment mixes a precomputed int instead of
      * re-hashing the full token sequence nBatches× per epoch. */
    @transient lazy val tokenHash: Int =
      scala.util.hashing.MurmurHash3.orderedHash(tokens, 17)
  }

  final case class EpochStats(epoch: Int, trainNll: Double, devTokenAcc: Double, lr: Double)

  /** Per-batch gradient accumulator (driver-sized: T+2 rows). */
  final class GradAcc(val t2: Int, val featDim: Int) extends Serializable {
    val dW = Array.ofDim[Double](t2, featDim)
    val dB = new Array[Double](t2)
    val dTr = Array.ofDim[Double](t2, t2)
    var loss = 0.0
    var n = 0L
    def merge(o: GradAcc): GradAcc = {
      var i = 0
      while (i < t2) {
        var j = 0
        while (j < featDim) { dW(i)(j) += o.dW(i)(j); j += 1 }
        var k = 0
        while (k < t2) { dTr(i)(k) += o.dTr(i)(k); k += 1 }
        dB(i) += o.dB(i)
        i += 1
      }
      loss += o.loss; n += o.n
      this
    }
  }

  /** Gold label ids for one example, None when the example is malformed
    * (length mismatch, empty, or a label missing from the alphabet — the
    * alphabet's UNK fallback would silently train toward the wrong label). */
  private def goldIds(m: NerModel, ex: TrainExample): Option[Array[Int]] = {
    if (ex.tokens.isEmpty || ex.tokens.length != ex.labels.length) return None
    val gold = new Array[Int](ex.labels.length)
    var i = 0
    while (i < gold.length) {
      val id = m.labelAlphabet.get(ex.labels(i))
      if (m.labelAlphabet.instance(id) != ex.labels(i)) return None
      gold(i) = id
      i += 1
    }
    Some(gold)
  }

  /** Accumulate one sentence's exact gradients into `acc` (chain rule through
    * the linear head: dW(tag) += dEmit_i(tag) · feats_i, dB(tag) += dEmit_i). */
  def accumulate(m: NerModel, acc: GradAcc, ex: TrainExample): Unit = {
    val gold = goldIds(m, ex) match { case Some(g) => g; case None => return }
    accumulateFeats(m, acc, Scorer.features(m, ex.tokens.toIndexedSeq), gold)
  }

  /** Same, over PRECOMPUTED frozen features — the head-only training loop
    * featurizes each example exactly once (the encoder never changes in that
    * mode), so epochs re-pay only the linear head + CRF math. */
  def accumulateFeats(m: NerModel, acc: GradAcc,
                      feats: Array[Array[Float]], gold: Array[Int]): Unit = {
    if (feats.isEmpty) return
    val emit = new Array[Array[Float]](feats.length)
    var i = 0
    while (i < feats.length) { emit(i) = Scorer.affine(m.hidden2tag, m.hidden2tagB, feats(i)); i += 1 }
    val (loss, dEmit, dTr) = Scorer.crfGradients(m, emit, gold)
    i = 0
    while (i < feats.length) {
      val f = feats(i); val de = dEmit(i)
      var tag = 0
      while (tag < de.length) {
        val g = de(tag)
        if (g != 0.0) {
          val row = acc.dW(tag)
          var d = 0
          while (d < f.length) { row(d) += g * f(d); d += 1 }
          acc.dB(tag) += g
        }
        tag += 1
      }
      i += 1
    }
    var a = 0
    while (a < acc.t2) {
      var b = 0
      while (b < acc.t2) { acc.dTr(a)(b) += dTr(a)(b); b += 1 }
      a += 1
    }
    acc.loss += loss
    acc.n += 1
  }

  private def applyStep(m: NerModel, acc: GradAcc, lr: Double,
                        trMask: Array[Array[Boolean]]): NerModel = {
    if (acc.n == 0) return m
    val scale = lr / acc.n
    val w = m.hidden2tag.map(_.clone())
    val b = m.hidden2tagB.clone()
    val tr = m.transitions.map(_.clone())
    var i = 0
    while (i < acc.t2) {
      var j = 0
      while (j < w(i).length) { w(i)(j) = (w(i)(j) - scale * acc.dW(i)(j)).toFloat; j += 1 }
      b(i) = (b(i) - scale * acc.dB(i)).toFloat
      var k = 0
      while (k < acc.t2) {
        // structural walls (BIOSE −10000 illegal transitions) stay frozen —
        // training must not soften grammar constraints
        if (!trMask(i)(k)) tr(i)(k) = (tr(i)(k) - scale * acc.dTr(i)(k)).toFloat
        k += 1
      }
      i += 1
    }
    m.copy(hidden2tag = w, hidden2tagB = b, transitions = tr)
  }

  /** Full-network gradient for one example (Backprop.accumulate wrapper). */
  def accumulateFull(m: NerModel, acc: Backprop.ModelGrad, ex: TrainExample): Unit = {
    val gold = goldIds(m, ex) match { case Some(g) => g; case None => return }
    Backprop.accumulate(m, acc, ex.tokens.toIndexedSeq, gold)
    ()
  }

  private def applyFullStep(m: NerModel, acc: Backprop.ModelGrad, lr: Double,
                            trMask: Array[Array[Boolean]]): NerModel = {
    if (acc.n == 0) return m
    val s = lr / acc.n
    def upd1(w: Array[Float], g: Array[Double]): Array[Float] =
      Array.tabulate(w.length)(i => (w(i) - s * g(i)).toFloat)
    def upd2(w: Array[Array[Float]], g: Array[Array[Double]]): Array[Array[Float]] =
      Array.tabulate(w.length)(i => upd1(w(i), g(i)))
    def upd3(w: Array[Array[Array[Float]]], g: Array[Array[Array[Double]]]): Array[Array[Array[Float]]] =
      Array.tabulate(w.length)(i => upd2(w(i), g(i)))
    def updLstm(w: LstmCellWeights, g: Backprop.LstmGrad): LstmCellWeights =
      LstmCellWeights(upd2(w.wi, g.wi), upd2(w.wh, g.wh), upd1(w.b, g.b))
    // sparse embedding step: rewrite ONLY the rows the minibatch touched;
    // untouched rows are shared by reference with the previous model (weights
    // are immutable-by-convention — every update path builds fresh arrays)
    def updSparse(w: Array[Array[Float]], g: Backprop.SparseRowGrad): Array[Array[Float]] = {
      val out = w.clone()
      g.foreachRow { (i, gr) =>
        val row = w(i)
        out(i) = Array.tabulate(row.length)(j => (row(j) - s * gr(j)).toFloat)
      }
      out
    }
    val tr = m.transitions.map(_.clone())
    var i = 0
    while (i < tr.length) {
      var k = 0
      while (k < tr.length) {
        if (!trMask(i)(k)) tr(i)(k) = (tr(i)(k) - s * acc.dTr(i)(k)).toFloat
        k += 1
      }
      i += 1
    }
    m.copy(
      wordEmb = updSparse(m.wordEmb, acc.dWordEmb),
      charEmb = updSparse(m.charEmb, acc.dCharEmb),
      charCnnW = upd3(m.charCnnW, acc.dCharCnnW),
      charCnnB = upd1(m.charCnnB, acc.dCharCnnB),
      charLstm = m.charLstm.map(ws =>
        Array(updLstm(ws(0), acc.dCharLstm.get(0)), updLstm(ws(1), acc.dCharLstm.get(1)))),
      lstm = Array.tabulate(m.lstm.length)(l =>
        Array(updLstm(m.lstm(l)(0), acc.dLstm(l)(0)), updLstm(m.lstm(l)(1), acc.dLstm(l)(1)))),
      cnnW = upd3(m.cnnW, acc.dCnnW),
      cnnB = upd1(m.cnnB, acc.dCnnB),
      hidden2tag = upd2(m.hidden2tag, acc.dH2t),
      hidden2tagB = upd1(m.hidden2tagB, acc.dH2tB),
      transitions = tr)
  }

  /** Deterministic epoch-seeded batch assignment: a fresh partition of the
    * examples into `nBatches` groups every epoch (the shuffle). Takes the
    * example's memoized content hash and mixes the epoch in with a cheap
    * integer finalizer — O(1) per example per scan. */
  private def batchOf(tokenHash: Int, epoch: Int, nBatches: Int): Int = {
    var h = tokenHash ^ (epoch * 0x9E3779B9)
    h ^= h >>> 16; h *= 0x85EBCA6B; h ^= h >>> 13
    java.lang.Math.floorMod(h, nBatches)
  }

  def devTokenAccuracy(m: NerModel, dev: Seq[TrainExample]): Double = {
    var ok = 0L; var tot = 0L
    // malformed examples (token/label length mismatch) are EXCLUDED, matching
    // goldIds' rejection on the training side — partially counting them would
    // skew the metric that drives best-dev checkpointing
    for (ex <- dev if ex.tokens.nonEmpty && ex.tokens.length == ex.labels.length) {
      val pred = Scorer.decodeBatch(m, IndexedSeq(ex.tokens.toIndexedSeq)).head
      var i = 0
      while (i < pred.length && i < ex.labels.length) {
        if (pred(i) == ex.labels(i)) ok += 1
        tot += 1; i += 1
      }
    }
    if (tot == 0) 0.0 else ok.toDouble / tot
  }

  /** Minibatch SGD with lr decay (lr_e = lr0 / (1 + decay·e), the reference's
    * schedule) and best-dev checkpointing. Returns (best-dev model, history).
    *
    * `trainEncoder = false` (default) trains the linear head + CRF over the
    * frozen encoder — the cheap path. `trainEncoder = true` trains EVERY
    * parameter the reference trains (embeddings, char CNN/LSTM, word
    * BiLSTM/CNN, head, transitions) via the manual backprop in [[Backprop]];
    * each minibatch step is still one treeAggregate, now of a ModelGrad. */
  def train(
      spark: SparkSession,
      train: Dataset[TrainExample],
      dev: Seq[TrainExample],
      init: NerModel,
      epochs: Int = 10,
      lr0: Double = 0.5,
      lrDecay: Double = 0.05,
      nBatches: Int = 4,
      trainEncoder: Boolean = false): (NerModel, Seq[EpochStats]) = {
    val trMask: Array[Array[Boolean]] = init.transitions.map(_.map(_ <= -5000f))
    // broadcast of the FROZEN featurizer: must outlive the whole run — the
    // cached featData's lineage still closes over it (a cache miss or task
    // retry recomputes through the closure), so it is destroyed only in the
    // finally below, never mid-training
    val bcFeat = if (trainEncoder) null else spark.sparkContext.broadcast(init)
    // full-network mode iterates raw examples (features change every step);
    // head-only mode featurizes ONCE through the frozen encoder and epochs
    // re-pay only the linear head + CRF math (encoder forward dominates cost)
    val data = if (trainEncoder) train.rdd.cache() else null
    val featData =
      if (trainEncoder) null
      else {
        val fd = train.rdd.flatMap { ex =>
          goldIds(bcFeat.value, ex).map(g =>
            (ex.tokenHash, Scorer.features(bcFeat.value, ex.tokens.toIndexedSeq), g))
        }.cache()
        fd.count() // one-time featurization; cached blocks serve the epochs
        fd
      }
    if (trainEncoder) { data.count(); () }
    var model = init
    var best = init
    var bestAcc = -10.0
    val history = Vector.newBuilder[EpochStats]
    try {
      for (epoch <- 0 until epochs) {
        val lr = lr0 / (1.0 + lrDecay * epoch)
        var epochLoss = 0.0
        var epochN = 0L
        for (b <- 0 until nBatches) {
          val bc = spark.sparkContext.broadcast(model)
          if (trainEncoder) {
            val acc = data.filter(ex => batchOf(ex.tokenHash, epoch, nBatches) == b)
              .treeAggregate(new Backprop.ModelGrad(model))(
                (a, ex) => { accumulateFull(bc.value, a, ex); a },
                (a1, a2) => a1.merge(a2))
            epochLoss += acc.loss; epochN += acc.n
            model = applyFullStep(model, acc, lr, trMask)
          } else {
            val acc = featData.filter(t => batchOf(t._1, epoch, nBatches) == b)
              .treeAggregate(new GradAcc(model.numTags + 2, model.featDim))(
                (a, t) => { accumulateFeats(bc.value, a, t._2, t._3); a },
                (a1, a2) => a1.merge(a2))
            epochLoss += acc.loss; epochN += acc.n
            model = applyStep(model, acc, lr, trMask)
          }
          bc.destroy()
        }
        val devAcc = devTokenAccuracy(model, dev)
        // strict >, seeded at -10 like the reference loop (ncrf_main.py:384,
        // 461): epoch 1 always checkpoints; a plateau keeps the FIRST tying
        // model, not the last one still drifting on train loss
        if (devAcc > bestAcc) { bestAcc = devAcc; best = model }
        history += EpochStats(epoch, if (epochN == 0) 0.0 else epochLoss / epochN, devAcc, lr)
      }
    } finally {
      if (data != null) { data.unpersist(); () }
      if (featData != null) { featData.unpersist(); () }
      if (bcFeat != null) { bcFeat.destroy(); () }
    }
    (best, history.result())
  }
}
