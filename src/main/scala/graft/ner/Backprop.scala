package graft.ner

/** Full-network gradients for training (F13 at full fidelity): manual
  * backpropagation through every trainable parameter of the NerModel —
  * CRF transitions, hidden2tag, word BiLSTM stack (BPTT) or word CNN,
  * char CNN (through the max-pool) or char BiLSTM, and the word/char
  * embedding tables — driven by the exact CRF output gradients from
  * `Scorer.crfGradients`.
  *
  * The forward pass here replicates `Scorer`'s inference math step for step
  * (same Float arithmetic, same ordering) while recording the activations the
  * backward pass needs; BackpropSpec asserts the cached forward's emissions
  * are bit-identical to `Scorer.emissions`, and every parameter group's
  * analytic gradient is checked against central finite differences.
  *
  * Gradients accumulate in Double (a minibatch sums thousands of small Float
  * products; Float accumulation loses the low bits the lr then multiplies).
  */
object Backprop {

  // ---------- gradient container (mirrors NerModel's trainable arrays) ----------

  final class LstmGrad(val wi: Array[Array[Double]], val wh: Array[Array[Double]], val b: Array[Double])
      extends Serializable {
    def merge(o: LstmGrad): Unit = {
      var i = 0
      while (i < wi.length) {
        var j = 0
        while (j < wi(i).length) { wi(i)(j) += o.wi(i)(j); j += 1 }
        j = 0
        while (j < wh(i).length) { wh(i)(j) += o.wh(i)(j); j += 1 }
        b(i) += o.b(i)
        i += 1
      }
    }
  }

  /** Sparse per-row gradient for an embedding TABLE: only rows a minibatch
    * actually touches are materialized (a sentence touches ≤ its token/char
    * count of rows; the table has the whole vocabulary). This is what keeps
    * `trainEncoder = true`'s treeAggregate payload minibatch-sized instead of
    * vocab-sized — at reference dims (10^5 words × 300d) a dense dWordEmb is
    * ~240 MB of almost-all-zeros PER aggregation message; sparse it is
    * (touched rows × dim) doubles. Access contract is identical to the dense
    * array it replaced: `apply(i)` returns THE accumulable row (created
    * zeroed on first touch), so accumulate sites and the FD tests read/write
    * unchanged. */
  final class SparseRowGrad(val dim: Int) extends Serializable {
    private val rows = new java.util.HashMap[Integer, Array[Double]]()
    def apply(i: Int): Array[Double] = {
      var r = rows.get(i)
      if (r == null) { r = new Array[Double](dim); rows.put(i, r) }
      r
    }
    def merge(o: SparseRowGrad): Unit = {
      val it = o.rows.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val mine = rows.get(e.getKey)
        if (mine == null) rows.put(e.getKey, e.getValue) // o is consumed by merge
        else {
          val v = e.getValue; var j = 0
          while (j < dim) { mine(j) += v(j); j += 1 }
        }
      }
    }
    def foreachRow(f: (Int, Array[Double]) => Unit): Unit = {
      val it = rows.entrySet().iterator()
      while (it.hasNext) { val e = it.next(); f(e.getKey, e.getValue) }
    }
    def nTouched: Int = rows.size
  }

  final class ModelGrad(m: NerModel) extends Serializable {
    private def zeros2(a: Array[Array[Float]]): Array[Array[Double]] =
      Array.tabulate(a.length)(i => new Array[Double](a(i).length))
    private def zerosLstm(w: LstmCellWeights): LstmGrad =
      new LstmGrad(zeros2(w.wi), zeros2(w.wh), new Array[Double](w.b.length))

    val dWordEmb: SparseRowGrad =
      new SparseRowGrad(if (m.wordEmb.length > 0) m.wordEmb(0).length else 0)
    val dCharEmb: SparseRowGrad =
      new SparseRowGrad(if (m.charEmb.length > 0) m.charEmb(0).length else 0)
    val dCharCnnW: Array[Array[Array[Double]]] = m.charCnnW.map(zeros2)
    val dCharCnnB: Array[Double] = new Array[Double](m.charCnnB.length)
    val dCharLstm: Option[Array[LstmGrad]] = m.charLstm.map(_.map(zerosLstm))
    val dLstm: Array[Array[LstmGrad]] = m.lstm.map(_.map(zerosLstm))
    val dCnnW: Array[Array[Array[Double]]] = m.cnnW.map(zeros2)
    val dCnnB: Array[Double] = new Array[Double](m.cnnB.length)
    val dH2t: Array[Array[Double]] = zeros2(m.hidden2tag)
    val dH2tB: Array[Double] = new Array[Double](m.hidden2tagB.length)
    val dTr: Array[Array[Double]] = zeros2(m.transitions)
    var loss: Double = 0.0
    var n: Long = 0L

    def merge(o: ModelGrad): ModelGrad = {
      def add2(a: Array[Array[Double]], b: Array[Array[Double]]): Unit = {
        var i = 0
        while (i < a.length) {
          var j = 0
          while (j < a(i).length) { a(i)(j) += b(i)(j); j += 1 }
          i += 1
        }
      }
      dWordEmb.merge(o.dWordEmb); dCharEmb.merge(o.dCharEmb)
      var h = 0
      while (h < dCharCnnW.length) { add2(dCharCnnW(h), o.dCharCnnW(h)); h += 1 }
      var i = 0
      while (i < dCharCnnB.length) { dCharCnnB(i) += o.dCharCnnB(i); i += 1 }
      (dCharLstm, o.dCharLstm) match {
        case (Some(a), Some(b)) => a(0).merge(b(0)); a(1).merge(b(1))
        case _ =>
      }
      var l = 0
      while (l < dLstm.length) { dLstm(l)(0).merge(o.dLstm(l)(0)); dLstm(l)(1).merge(o.dLstm(l)(1)); l += 1 }
      h = 0
      while (h < dCnnW.length) { add2(dCnnW(h), o.dCnnW(h)); h += 1 }
      i = 0
      while (i < dCnnB.length) { dCnnB(i) += o.dCnnB(i); i += 1 }
      add2(dH2t, o.dH2t)
      i = 0
      while (i < dH2tB.length) { dH2tB(i) += o.dH2tB(i); i += 1 }
      add2(dTr, o.dTr)
      loss += o.loss; n += o.n
      this
    }
  }

  // ---------- LSTM forward with cache + BPTT ----------

  private final class LstmCache(L: Int, h: Int) {
    val ig = Array.ofDim[Float](L, h); val fg = Array.ofDim[Float](L, h)
    val gg = Array.ofDim[Float](L, h); val og = Array.ofDim[Float](L, h)
    val c = Array.ofDim[Float](L, h)
    val hs = Array.ofDim[Array[Float]](L) // h_t (same objects the forward emits)
  }

  // numeric primitives shared with the inference path (bit-identity between
  // this forward and Scorer's is load-bearing — never fork these)
  import Scorer.{sigmoid, tanhF, dot}

  /** Identical math and ordering to Scorer.lstmRun, plus the cache. */
  private def lstmForward(w: LstmCellWeights, xs: Array[Array[Float]], reverse: Boolean): LstmCache = {
    val h = w.wh(0).length
    val cache = new LstmCache(xs.length, h)
    var hPrev = new Array[Float](h)
    var cPrev = new Array[Float](h)
    val idx = if (reverse) xs.indices.reverse else xs.indices
    for (t <- idx) {
      val gates = new Array[Float](4 * h)
      var g = 0
      while (g < 4 * h) { gates(g) = dot(w.wi(g), xs(t)) + dot(w.wh(g), hPrev) + w.b(g); g += 1 }
      val hNew = new Array[Float](h)
      val cNew = new Array[Float](h)
      var j = 0
      while (j < h) {
        val i = sigmoid(gates(j))
        val f = sigmoid(gates(h + j))
        val gg = tanhF(gates(2 * h + j))
        val o = sigmoid(gates(3 * h + j))
        cNew(j) = f * cPrev(j) + i * gg
        hNew(j) = o * tanhF(cNew(j))
        cache.ig(t)(j) = i; cache.fg(t)(j) = f; cache.gg(t)(j) = gg; cache.og(t)(j) = o
        j += 1
      }
      cache.c(t) = cNew; cache.hs(t) = hNew
      hPrev = hNew; cPrev = cNew
    }
    cache
  }

  /** BPTT for one direction. `dHs(t)` is the loss gradient injected at h_t
    * (zero array where none). Accumulates into `g`; returns dXs. */
  private def lstmBackward(w: LstmCellWeights, xs: Array[Array[Float]], cache: LstmCache,
                           dHs: Array[Array[Double]], reverse: Boolean, g: LstmGrad): Array[Array[Double]] = {
    val h = w.wh(0).length
    val L = xs.length
    val dXs = Array.tabulate(L)(t => new Array[Double](xs(t).length))
    val order = if (reverse) xs.indices else xs.indices.reverse // reverse of processing order
    var dhChain = new Array[Double](h)
    var dcChain = new Array[Double](h)
    for (t <- order) {
      val prevT = if (reverse) t + 1 else t - 1 // processing-order predecessor
      val hPrev: Array[Float] = if (prevT >= 0 && prevT < L) cache.hs(prevT) else new Array[Float](h)
      val cPrev: Array[Float] = if (prevT >= 0 && prevT < L) cache.c(prevT) else new Array[Float](h)
      val da = new Array[Double](4 * h)
      val dhPrev = new Array[Double](h)
      val dcPrev = new Array[Double](h)
      var j = 0
      while (j < h) {
        val dh = dHs(t)(j) + dhChain(j)
        val i = cache.ig(t)(j); val f = cache.fg(t)(j)
        val gg = cache.gg(t)(j); val o = cache.og(t)(j)
        val tc = math.tanh(cache.c(t)(j).toDouble)
        val dO = dh * tc
        var dc = dcChain(j) + dh * o * (1.0 - tc * tc)
        val dF = dc * cPrev(j)
        val dI = dc * gg
        val dG = dc * i
        dcPrev(j) = dc * f
        da(j) = dI * i * (1.0 - i)
        da(h + j) = dF * f * (1.0 - f)
        da(2 * h + j) = dG * (1.0 - gg * gg)
        da(3 * h + j) = dO * o * (1.0 - o)
        j += 1
      }
      var gi = 0
      while (gi < 4 * h) {
        val d = da(gi)
        if (d != 0.0) {
          val wiRow = w.wi(gi); val gWi = g.wi(gi)
          var k = 0
          while (k < wiRow.length) { gWi(k) += d * xs(t)(k); dXs(t)(k) += d * wiRow(k); k += 1 }
          val whRow = w.wh(gi); val gWh = g.wh(gi)
          k = 0
          while (k < h) { gWh(k) += d * hPrev(k); dhPrev(k) += d * whRow(k); k += 1 }
          g.b(gi) += d
        }
        gi += 1
      }
      dhChain = dhPrev; dcChain = dcPrev
    }
    dXs
  }

  // ---------- char-level reps with cache ----------

  private final case class CharCnnCache(chars: Array[Int], embs: Array[Array[Float]], argmax: Array[Int])

  private def charCnnForward(m: NerModel, word: String): (Array[Float], CharCnnCache) = {
    val cfg = m.config
    val k = cfg.charKernel
    val chars = word.map(c => m.charAlphabet.get(c.toString)).toArray
    val L = math.max(chars.length, 1)
    val embs = Array.tabulate(L)(i => if (i < chars.length) m.charEmb(chars(i)) else new Array[Float](cfg.charEmbDim))
    val out = new Array[Float](cfg.charHidden)
    val argmax = new Array[Int](cfg.charHidden)
    java.util.Arrays.fill(out, Float.MinValue)
    var pos = 0
    while (pos < L) {
      var h = 0
      while (h < cfg.charHidden) {
        var acc = m.charCnnB(h)
        var kk = 0
        while (kk < k) {
          val p = pos + kk - k / 2
          if (p >= 0 && p < L) {
            val e = embs(p); val wk = m.charCnnW(h)(kk)
            var d = 0
            while (d < cfg.charEmbDim) { acc += wk(d) * e(d); d += 1 }
          }
          kk += 1
        }
        if (acc > out(h)) { out(h) = acc; argmax(h) = pos }
        h += 1
      }
      pos += 1
    }
    (out, CharCnnCache(chars, embs, argmax))
  }

  private def charCnnBackward(m: NerModel, cache: CharCnnCache, dOut: Array[Double], g: ModelGrad): Unit = {
    val cfg = m.config
    val k = cfg.charKernel
    val L = cache.embs.length
    var h = 0
    while (h < cfg.charHidden) {
      val d0 = dOut(h)
      if (d0 != 0.0) {
        val pos = cache.argmax(h)
        g.dCharCnnB(h) += d0
        var kk = 0
        while (kk < k) {
          val p = pos + kk - k / 2
          if (p >= 0 && p < L) {
            val e = cache.embs(p); val wk = m.charCnnW(h)(kk); val gw = g.dCharCnnW(h)(kk)
            var d = 0
            while (d < cfg.charEmbDim) { gw(d) += d0 * e(d); d += 1 }
            // embedding grad only for REAL chars (padding rows are not parameters)
            if (p < cache.chars.length) {
              val row = g.dCharEmb(cache.chars(p))
              var dd = 0
              while (dd < cfg.charEmbDim) { row(dd) += d0 * wk(dd); dd += 1 }
            }
          }
          kk += 1
        }
      }
      h += 1
    }
  }

  private final case class CharLstmCache(chars: Array[Int], embs: Array[Array[Float]],
                                         fwd: LstmCache, bwd: LstmCache)

  private def charLstmForward(m: NerModel, word: String): (Array[Float], CharLstmCache) = {
    val ws = m.charLstm.get
    val chars = word.map(c => m.charAlphabet.get(c.toString)).toArray
    val L = math.max(chars.length, 1)
    val embs = Array.tabulate(L)(i => if (i < chars.length) m.charEmb(chars(i)) else new Array[Float](m.config.charEmbDim))
    val fwd = lstmForward(ws(0), embs, reverse = false)
    val bwd = lstmForward(ws(1), embs, reverse = true)
    (fwd.hs(L - 1) ++ bwd.hs(0), CharLstmCache(chars, embs, fwd, bwd))
  }

  private def charLstmBackward(m: NerModel, cache: CharLstmCache, dOut: Array[Double], g: ModelGrad): Unit = {
    val ws = m.charLstm.get
    val h = m.config.charHidden
    val L = cache.embs.length
    val dFwd = Array.fill(L)(new Array[Double](h))
    val dBwd = Array.fill(L)(new Array[Double](h))
    var j = 0
    while (j < h) { dFwd(L - 1)(j) = dOut(j); dBwd(0)(j) = dOut(h + j); j += 1 }
    val gl = g.dCharLstm.get
    val dX1 = lstmBackward(ws(0), cache.embs, cache.fwd, dFwd, reverse = false, gl(0))
    val dX2 = lstmBackward(ws(1), cache.embs, cache.bwd, dBwd, reverse = true, gl(1))
    var p = 0
    while (p < cache.chars.length) { // padding rows are not parameters
      val row = g.dCharEmb(cache.chars(p))
      var d = 0
      while (d < row.length) { row(d) += dX1(p)(d) + dX2(p)(d); d += 1 }
      p += 1
    }
  }

  // ---------- full sentence gradients ----------

  /** Forward (with caches) + backward for one sentence; accumulates every
    * parameter gradient into `g` and returns the sentence NLL. The emissions
    * computed here equal Scorer.emissions bit for bit (asserted in tests). */
  def accumulate(m: NerModel, g: ModelGrad, tokens: IndexedSeq[String], gold: Array[Int]): Double = {
    if (tokens.isEmpty) return 0.0 // CRF lattice is undefined on zero positions
    val cfg = m.config
    val n = tokens.length
    // --- forward: word reps with char caches ---
    val wordIds = new Array[Int](n)
    val charCnnCaches = new Array[CharCnnCache](n)
    val charLstmCaches = new Array[CharLstmCache](n)
    val reps0 = new Array[Array[Float]](n)
    var i = 0
    while (i < n) {
      val tok = tokens(i)
      val norm = if (cfg.numberNormalized) Scorer.normalizeWord(tok) else tok
      val wid0 = m.wordAlphabet.get(norm)
      val wid = if (wid0 >= 0 && wid0 < m.wordEmb.length) wid0 else m.wordAlphabet.unkIndex
      wordIds(i) = wid
      val we = m.wordEmb(wid)
      reps0(i) = cfg.charExtractor match {
        case "NONE" => we
        case "LSTM" =>
          val (cr, cc) = charLstmForward(m, tok); charLstmCaches(i) = cc; we ++ cr
        case _ =>
          val (cr, cc) = charCnnForward(m, tok); charCnnCaches(i) = cc; we ++ cr
      }
      i += 1
    }
    // --- forward: word extractor with caches ---
    var feats: Array[Array[Float]] = reps0
    var cnnPre: Array[Array[Float]] = null          // word-CNN pre-ReLU values
    val lstmCaches = Array.ofDim[LstmCache](m.lstm.length, 2)
    val layerInputs = new Array[Array[Array[Float]]](m.lstm.length)
    if (cfg.wordExtractor == "CNN") {
      val k = if (m.cnnW.nonEmpty) m.cnnW(0).length else 1
      val inDim = if (m.cnnW.nonEmpty) m.cnnW(0)(0).length else 0
      val out = new Array[Array[Float]](n)
      cnnPre = new Array[Array[Float]](n)
      var pos = 0
      while (pos < n) {
        val pre = new Array[Float](m.cnnW.length)
        val row = new Array[Float](m.cnnW.length)
        var h = 0
        while (h < m.cnnW.length) {
          var acc = m.cnnB(h)
          val wh = m.cnnW(h)
          var kk = 0
          while (kk < k) {
            val p = pos + kk - k / 2
            if (p >= 0 && p < n) {
              val e = reps0(p); val wk = wh(kk)
              var d = 0
              while (d < inDim) { acc += wk(d) * e(d); d += 1 }
            }
            kk += 1
          }
          pre(h) = acc
          row(h) = math.max(acc, 0f)
          h += 1
        }
        cnnPre(pos) = pre; out(pos) = row
        pos += 1
      }
      feats = out
    } else {
      var layer = 0
      while (layer < m.lstm.length) {
        layerInputs(layer) = feats
        val fwd = lstmForward(m.lstm(layer)(0), feats, reverse = false)
        val bwd = lstmForward(m.lstm(layer)(1), feats, reverse = true)
        lstmCaches(layer)(0) = fwd; lstmCaches(layer)(1) = bwd
        val merged = new Array[Array[Float]](n)
        var t = 0
        while (t < n) { merged(t) = fwd.hs(t) ++ bwd.hs(t); t += 1 }
        feats = merged
        layer += 1
      }
    }
    // --- emissions + CRF ---
    val emit = new Array[Array[Float]](n)
    i = 0
    while (i < n) { emit(i) = Scorer.affine(m.hidden2tag, m.hidden2tagB, feats(i)); i += 1 }
    val (loss, dEmit, dTr) = Scorer.crfGradients(m, emit, gold)
    var a = 0
    while (a < g.dTr.length) {
      var b = 0
      while (b < g.dTr.length) { g.dTr(a)(b) += dTr(a)(b); b += 1 }
      a += 1
    }
    // --- backward: hidden2tag ---
    val dFeats = Array.fill(n)(new Array[Double](feats(0).length))
    i = 0
    while (i < n) {
      val f = feats(i); val de = dEmit(i)
      var tag = 0
      while (tag < de.length) {
        val dd = de(tag)
        if (dd != 0.0) {
          val wRow = m.hidden2tag(tag); val gRow = g.dH2t(tag)
          var d = 0
          while (d < f.length) { gRow(d) += dd * f(d); dFeats(i)(d) += dd * wRow(d); d += 1 }
          g.dH2tB(tag) += dd
        }
        tag += 1
      }
      i += 1
    }
    // --- backward: word extractor → dReps0 ---
    val dReps0 = Array.fill(n)(new Array[Double](reps0(0).length))
    if (cfg.wordExtractor == "CNN") {
      val k = if (m.cnnW.nonEmpty) m.cnnW(0).length else 1
      val inDim = if (m.cnnW.nonEmpty) m.cnnW(0)(0).length else 0
      var pos = 0
      while (pos < n) {
        var h = 0
        while (h < m.cnnW.length) {
          val dOut = if (cnnPre(pos)(h) > 0f) dFeats(pos)(h) else 0.0 // ReLU gate
          if (dOut != 0.0) {
            g.dCnnB(h) += dOut
            val wh = m.cnnW(h); val gw = g.dCnnW(h)
            var kk = 0
            while (kk < k) {
              val p = pos + kk - k / 2
              if (p >= 0 && p < n) {
                val e = reps0(p); val wk = wh(kk); val gwk = gw(kk)
                var d = 0
                while (d < inDim) { gwk(d) += dOut * e(d); dReps0(p)(d) += dOut * wk(d); d += 1 }
              }
              kk += 1
            }
          }
          h += 1
        }
        pos += 1
      }
    } else {
      // stacked BiLSTM: walk layers top-down, splitting each layer's dOut
      var dOut = dFeats
      var layer = m.lstm.length - 1
      while (layer >= 0) {
        val h = cfg.hidden
        val xs = layerInputs(layer)
        val dFwd = Array.fill(n)(new Array[Double](h))
        val dBwd = Array.fill(n)(new Array[Double](h))
        var t = 0
        while (t < n) {
          var j = 0
          while (j < h) { dFwd(t)(j) = dOut(t)(j); dBwd(t)(j) = dOut(t)(h + j); j += 1 }
          t += 1
        }
        val gl = g.dLstm(layer)
        val dX1 = lstmBackward(m.lstm(layer)(0), xs, lstmCaches(layer)(0), dFwd, reverse = false, gl(0))
        val dX2 = lstmBackward(m.lstm(layer)(1), xs, lstmCaches(layer)(1), dBwd, reverse = true, gl(1))
        val dIn = Array.tabulate(n)(t2 => {
          val arr = new Array[Double](xs(t2).length)
          var d = 0
          while (d < arr.length) { arr(d) = dX1(t2)(d) + dX2(t2)(d); d += 1 }
          arr
        })
        dOut = dIn
        layer -= 1
      }
      i = 0
      while (i < n) { dReps0(i) = dOut(i); i += 1 }
    }
    // --- backward: word reps → embeddings + char encoders ---
    i = 0
    while (i < n) {
      val wDim = cfg.wordEmbDim
      val row = g.dWordEmb(wordIds(i))
      var d = 0
      while (d < wDim) { row(d) += dReps0(i)(d); d += 1 }
      cfg.charExtractor match {
        case "NONE" =>
        case "LSTM" =>
          val dChar = java.util.Arrays.copyOfRange(dReps0(i), wDim, dReps0(i).length)
          charLstmBackward(m, charLstmCaches(i), dChar, g)
        case _ =>
          val dChar = java.util.Arrays.copyOfRange(dReps0(i), wDim, dReps0(i).length)
          charCnnBackward(m, charCnnCaches(i), dChar, g)
      }
      i += 1
    }
    g.loss += loss
    g.n += 1
    loss
  }
}
