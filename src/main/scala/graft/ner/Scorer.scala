package graft.ner

import scala.collection.mutable.ArrayBuffer

/** The neural inner loop (SURVEY §2 F-group): batchify → word representation
  * (embeddings + char CNN/LSTM) → BiLSTM or word-CNN → hidden2tag → CRF Viterbi
  * → label strings.
  *
  * This is pure JVM math invoked from `Dataset.mapPartitions` — the reference's
  * whole `ncrf_main.py evaluate()` decode trace (SURVEY §3.3) collapses into
  * this object with no process boundary. Per-executor weight reuse comes from
  * broadcasting the NerModel once and calling decode per partition.
  *
  * Faithfulness notes (behavior, not numerics):
  *  - digit folding before vocab lookup (utils/functions.py:11-18, B1);
  *  - sentences ≥ maxSentenceLength tokens are NOT scored (dropped upstream by
  *    the pipeline filter, utils/data.py:25 — B3);
  *  - batches are sorted desc by length, padded, and the original order is
  *    restored before labels are zipped back (ncrf_main.py:202-277 — F1/F10);
  *  - LSTM runs only to each sentence's true length (pack_padded_sequence);
  *  - CRF Viterbi with START/STOP extra tags (model/crf.py:105-197 — F7).
  */
object Scorer {

  /** B1: fold digits to 0 (number_normalized). */
  def normalizeWord(w: String): String = {
    // fast path: most tokens carry no digit — don't allocate a copy for them
    var i = 0
    while (i < w.length && !w.charAt(i).isDigit) i += 1
    if (i == w.length) w
    else {
      val a = w.toCharArray
      while (i < a.length) { if (a(i).isDigit) a(i) = '0'; i += 1 }
      new String(a)
    }
  }

  // ---------- low-level math ----------

  @inline private[ner] def dot(w: Array[Float], x: Array[Float]): Float = {
    var s = 0f; var i = 0
    while (i < w.length) { s += w(i) * x(i); i += 1 }
    s
  }

  private[ner] def affine(w: Array[Array[Float]], b: Array[Float], x: Array[Float]): Array[Float] = {
    val out = new Array[Float](w.length)
    var o = 0
    while (o < w.length) { out(o) = dot(w(o), x) + b(o); o += 1 }
    out
  }

  @inline private[ner] def sigmoid(x: Float): Float = (1.0 / (1.0 + math.exp(-x))).toFloat
  @inline private[ner] def tanhF(x: Float): Float = math.tanh(x).toFloat

  /** One LSTM direction over a sequence (gates [i,f,g,o]); returns h_t per step. */
  def lstmRun(w: LstmCellWeights, xs: Array[Array[Float]], reverse: Boolean): Array[Array[Float]] = {
    val h = w.wh(0).length
    val out = Array.ofDim[Array[Float]](xs.length)
    var hPrev = new Array[Float](h)
    // gates and the cell state are double-buffered SCRATCH (only h_t escapes
    // this function): per-step `new` here was 5h floats × steps × directions
    // × layers of garbage per sentence — allocation bandwidth, not compute,
    // is what caps the annotate kernel's 32-thread scaling (tools/AllocProbe)
    var cPrev = new Array[Float](h)
    var cNext = new Array[Float](h)
    val gates = new Array[Float](4 * h)
    val idx = if (reverse) xs.indices.reverse else xs.indices
    for (t <- idx) {
      var g = 0
      while (g < 4 * h) { gates(g) = dot(w.wi(g), xs(t)) + dot(w.wh(g), hPrev) + w.b(g); g += 1 }
      val hNew = new Array[Float](h)
      var j = 0
      while (j < h) {
        val i = sigmoid(gates(j))
        val f = sigmoid(gates(h + j))
        val gg = tanhF(gates(2 * h + j))
        val o = sigmoid(gates(3 * h + j))
        cNext(j) = f * cPrev(j) + i * gg
        hNew(j) = o * tanhF(cNext(j))
        j += 1
      }
      out(t) = hNew; hPrev = hNew
      val tmp = cPrev; cPrev = cNext; cNext = tmp
    }
    out
  }

  /** [[lstmRun]] writing each h_t into `out(t)` at `offset` — lets the
    * BiLSTM layer materialize fwd‖bwd directly into ONE 2h row per step
    * instead of two h rows plus a concat row (the concat was ~9% of the
    * annotate kernel's allocation churn — JFR). h_t is computed in
    * double-buffered scratch and copied (h floats ≪ one allocation). */
  private def lstmRunInto(w: LstmCellWeights, xs: Array[Array[Float]], n: Int,
                          reverse: Boolean, out: Array[Array[Float]], offset: Int): Unit = {
    val h = w.wh(0).length
    var hPrev = new Array[Float](h)
    var hNext = new Array[Float](h)
    var cPrev = new Array[Float](h)
    var cNext = new Array[Float](h)
    val gates = new Array[Float](4 * h)
    // explicit n: xs/out may be pooled arrays longer than the sequence
    var t = if (reverse) n - 1 else 0
    val step = if (reverse) -1 else 1
    var remaining = n
    while (remaining > 0) {
      var g = 0
      while (g < 4 * h) { gates(g) = dot(w.wi(g), xs(t)) + dot(w.wh(g), hPrev) + w.b(g); g += 1 }
      var j = 0
      while (j < h) {
        val i = sigmoid(gates(j))
        val f = sigmoid(gates(h + j))
        val gg = tanhF(gates(2 * h + j))
        val o = sigmoid(gates(3 * h + j))
        cNext(j) = f * cPrev(j) + i * gg
        hNext(j) = o * tanhF(cNext(j))
        j += 1
      }
      System.arraycopy(hNext, 0, out(t), offset, h)
      var tmp = cPrev; cPrev = cNext; cNext = tmp
      tmp = hPrev; hPrev = hNext; hNext = tmp
      t += step
      remaining -= 1
    }
  }

  /** Char CNN (F4): char embeds → 1-D conv (same pad) → global max pool. */
  def charCnn(m: NerModel, word: String): Array[Float] = {
    val cfg = m.config
    val k = cfg.charKernel
    val L = math.max(word.length, 1)
    val embs = new Array[Array[Float]](L)
    var ci = 0
    while (ci < word.length) { embs(ci) = m.charEmb(m.charAlphabet.getChar(word.charAt(ci))); ci += 1 }
    if (word.isEmpty) embs(0) = new Array[Float](cfg.charEmbDim)
    val out = new Array[Float](cfg.charHidden)
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
            val e = embs(p); val wk = m.charCnnW(h)(kk) // contiguous over d
            var d = 0
            while (d < cfg.charEmbDim) { acc += wk(d) * e(d); d += 1 }
          }
          kk += 1
        }
        if (acc > out(h)) out(h) = acc
        h += 1
      }
      pos += 1
    }
    out
  }

  /** Char BiLSTM (F5): last hidden of each direction, concatenated. */
  def charLstm(m: NerModel, word: String): Array[Float] = {
    val ws = m.charLstm.get
    val L = math.max(word.length, 1)
    val embs = new Array[Array[Float]](L)
    var ci = 0
    while (ci < word.length) { embs(ci) = m.charEmb(m.charAlphabet.getChar(word.charAt(ci))); ci += 1 }
    if (word.isEmpty) embs(0) = new Array[Float](m.config.charEmbDim)
    val fwd = lstmRun(ws(0), embs, reverse = false)
    val bwd = lstmRun(ws(1), embs, reverse = true)
    fwd(L - 1) ++ bwd(0)
  }

  /** Word representation (F3+F4/F5): wordEmb(id) ⧺ charRep. Memoized per
    * executor in [[NerModel.repCache]] (context-free + Zipf ⇒ ~every token is
    * a hit after warmup); entries are treated as immutable by all callers. */
  def wordRep(m: NerModel, token: String): Array[Float] = {
    val cache = m.repCache
    val hit = cache.get(token)
    if (hit != null) return hit
    val norm = if (m.config.numberNormalized) normalizeWord(token) else token
    val wid = m.wordAlphabet.get(norm)
    val we = m.wordEmb(if (wid >= 0 && wid < m.wordEmb.length) wid else m.wordAlphabet.unkIndex)
    val rep = m.config.charExtractor match {
      case "NONE" => we
      case "LSTM" => we ++ charLstm(m, token)
      case _      => we ++ charCnn(m, token)
    }
    if (cache.size < RepCacheCap) cache.put(token, rep)
    rep
  }

  /** Rep-cache bound: ~10⁶ tokens × (repDim floats + key) ≈ low hundreds of
    * MB worst-case on a real model — a deliberate executor-memory budget;
    * past it, misses recompute instead of growing the heap. */
  private val RepCacheCap = 1 << 20

  /** Sequence feature extractor (F6) up to the feature layer (pre-hidden2tag):
    * stacked BiLSTM or 1-layer word CNN (NCRF++ word_feature_extractor).
    * Exposed separately from [[emissions]] so the trainer (F13) can treat the
    * encoder as a frozen featurizer and train the linear head + CRF on top. */
  def features(m: NerModel, tokens: IndexedSeq[String]): Array[Array[Float]] = {
    // explicit loop: a generic .map(...).toArray routes every element store
    // through reflective ScalaRunTime.array_update — measured as expensive as
    // the whole Viterbi pass at 32 threads (JFR, tools/ThreadProbe)
    var reps: Array[Array[Float]] = {
      val n = tokens.length
      val arr = new Array[Array[Float]](n)
      var i = 0
      while (i < n) { arr(i) = wordRep(m, tokens(i)); i += 1 }
      arr
    }
    if (m.config.wordExtractor == "CNN") {
      val k = if (m.cnnW.nonEmpty) m.cnnW(0).length else 1
      val inDim = if (m.cnnW.nonEmpty) m.cnnW(0)(0).length else 0
      val L = reps.length
      val out = Array.ofDim[Array[Float]](L)
      var pos = 0
      while (pos < L) {
        val row = new Array[Float](m.cnnW.length)
        var h = 0
        while (h < m.cnnW.length) {
          var acc = m.cnnB(h)
          val wh = m.cnnW(h)
          var kk = 0
          while (kk < k) {
            val p = pos + kk - k / 2
            if (p >= 0 && p < L) {
              val e = reps(p); val wk = wh(kk) // contiguous over d
              var d = 0
              while (d < inDim) { acc += wk(d) * e(d); d += 1 }
            }
            kk += 1
          }
          row(h) = math.max(acc, 0f) // ReLU, as in NCRF++ word CNN
          h += 1
        }
        out(pos) = row
        pos += 1
      }
      reps = out
    } else {
      var layer = 0
      while (layer < m.lstm.length) {
        val h = m.lstm(layer)(0).wh(0).length
        val merged = new Array[Array[Float]](reps.length)
        var t = 0
        while (t < reps.length) { merged(t) = new Array[Float](2 * h); t += 1 }
        lstmRunInto(m.lstm(layer)(0), reps, reps.length, reverse = false, merged, 0)
        lstmRunInto(m.lstm(layer)(1), reps, reps.length, reverse = true, merged, h)
        reps = merged
        layer += 1
      }
    }
    reps
  }

  /** [[features]] on pooled per-thread rows — the decode hot path. The
    * returned array is pool-backed (length ≥ tokens.length; valid until the
    * next decode on this thread); only indices < tokens.length are defined.
    * Same dots in the same order as [[features]] (pinned by ScorerSpec's
    * decodeBatch-equality property). */
  private def featuresPooled(m: NerModel, tokens: IndexedSeq[String],
                             s: DecodeScratch): Array[Array[Float]] = {
    val n = tokens.length
    val reps = s.ptrs(n)
    var i = 0
    while (i < n) { reps(i) = wordRep(m, tokens(i)); i += 1 }
    if (m.config.wordExtractor == "CNN") {
      val k = if (m.cnnW.nonEmpty) m.cnnW(0).length else 1
      val inDim = if (m.cnnW.nonEmpty) m.cnnW(0)(0).length else 0
      val out = s.rows(0, n, m.cnnW.length)
      var pos = 0
      while (pos < n) {
        val row = out(pos)
        var h = 0
        while (h < m.cnnW.length) {
          var acc = m.cnnB(h)
          val wh = m.cnnW(h)
          var kk = 0
          while (kk < k) {
            val p = pos + kk - k / 2
            if (p >= 0 && p < n) {
              val e = reps(p); val wk = wh(kk)
              var d = 0
              while (d < inDim) { acc += wk(d) * e(d); d += 1 }
            }
            kk += 1
          }
          row(h) = math.max(acc, 0f)
          h += 1
        }
        pos += 1
      }
      out
    } else {
      var cur: Array[Array[Float]] = reps
      var layer = 0
      while (layer < m.lstm.length) {
        val h = m.lstm(layer)(0).wh(0).length
        val merged = s.rows(layer, n, 2 * h)
        lstmRunInto(m.lstm(layer)(0), cur, n, reverse = false, merged, 0)
        lstmRunInto(m.lstm(layer)(1), cur, n, reverse = true, merged, h)
        cur = merged
        layer += 1
      }
      cur
    }
  }

  /** Per-token tag scores: hidden2tag over the extracted features. */
  def emissions(m: NerModel, tokens: IndexedSeq[String]): Array[Array[Float]] = {
    val reps = features(m, tokens)
    val out = new Array[Array[Float]](reps.length)
    var t = 0
    while (t < reps.length) { out(t) = affine(m.hidden2tag, m.hidden2tagB, reps(t)); t += 1 }
    out
  }

  // ---------- CRF (F7/F8) ----------

  /** Viterbi decode with START/STOP (transitions(from)(to)). Returns tag ids.
    * Rolling two-row DP (backpointers keep the full L×T matrix) — halves the
    * allocation of the hot path. */
  def viterbi(m: NerModel, emit: Array[Array[Float]]): Array[Int] = {
    val t = m.numTags
    val L = emit.length
    if (L == 0) return Array.empty
    val tr = m.transitions
    val trT = m.transitionsT // (to × from): inner max runs row-contiguous
    val start = m.startTag; val stop = m.stopTag
    var prev = new Array[Float](t)
    var cur = new Array[Float](t)
    val bp = new Array[Int](L * t) // flat: one allocation, not L row arrays
    var j = 0
    while (j < t) { prev(j) = tr(start)(j) + emit(0)(j); j += 1 }
    var i = 1
    while (i < L) {
      val base = i * t; val emi = emit(i)
      var to = 0
      while (to < t) {
        val trTo = trT(to)
        var best = Float.NegativeInfinity; var arg = 0
        var from = 0
        while (from < t) {
          val s = prev(from) + trTo(from)
          if (s > best) { best = s; arg = from }
          from += 1
        }
        cur(to) = best + emi(to); bp(base + to) = arg
        to += 1
      }
      val tmp = prev; prev = cur; cur = tmp
      i += 1
    }
    var best = Float.NegativeInfinity; var arg = 0
    j = 0
    while (j < t) {
      val s = prev(j) + tr(j)(stop)
      if (s > best) { best = s; arg = j }
      j += 1
    }
    val out = new Array[Int](L)
    out(L - 1) = arg
    i = L - 1
    while (i > 0) { out(i - 1) = bp(i * t + out(i)); i -= 1 }
    out
  }

  /** k-best Viterbi (F8, model/crf.py:268-418) — returns up to k (score, path)
    * pairs, best first. Used for nbest output fidelity (`# score` headers). */
  def viterbiNbest(m: NerModel, emit: Array[Array[Float]], k: Int): Seq[(Float, Array[Int])] = {
    val t = m.numTags
    val L = emit.length
    if (L == 0) return Seq.empty
    val tr = m.transitions
    // beam of (score, path) per tag
    var beam: Array[List[(Float, List[Int])]] =
      Array.tabulate(t)(j => List((tr(m.startTag)(j) + emit(0)(j), List(j))))
    var i = 1
    while (i < L) {
      val next = Array.tabulate(t) { to =>
        val cands = new ArrayBuffer[(Float, List[Int])]()
        var from = 0
        while (from < t) {
          for ((s, p) <- beam(from)) cands += ((s + tr(from)(to) + emit(i)(to), to :: p))
          from += 1
        }
        cands.sortBy(-_._1).take(k).toList
      }
      beam = next
      i += 1
    }
    val fin = new ArrayBuffer[(Float, List[Int])]()
    var j = 0
    while (j < t) {
      for ((s, p) <- beam(j)) fin += ((s + tr(j)(m.stopTag), p))
      j += 1
    }
    fin.sortBy(-_._1).take(k).map { case (s, p) => (s, p.reverse.toArray) }.toSeq
  }

  // ---------- CRF training math (F9: forward algorithm / gold score / NLL) ----------

  @inline private def logSumExp(xs: Array[Double]): Double = {
    var mx = Double.NegativeInfinity
    var i = 0
    while (i < xs.length) { if (xs(i) > mx) mx = xs(i); i += 1 }
    if (mx == Double.NegativeInfinity) return mx
    var s = 0.0
    i = 0
    while (i < xs.length) { s += math.exp(xs(i) - mx); i += 1 }
    mx + math.log(s)
  }

  /** Forward algorithm (F9, the reference's `CRF._calculate_PZ`): returns the
    * full alpha lattice (L × T, log space, START folded into row 0) and the
    * log partition function over all paths (STOP folded into the final sum).
    * Double precision — the sum over exponentially many paths needs it. */
  def forwardAlphas(m: NerModel, emit: Array[Array[Float]]): (Array[Array[Double]], Double) = {
    val t = m.numTags
    val L = emit.length
    if (L == 0) return (Array.empty, 0.0) // same guard as viterbi: empty → no paths, logZ 0
    val tr = m.transitions
    val alpha = Array.ofDim[Double](L, t)
    var j = 0
    while (j < t) { alpha(0)(j) = tr(m.startTag)(j).toDouble + emit(0)(j); j += 1 }
    val buf = new Array[Double](t)
    var i = 1
    while (i < L) {
      var to = 0
      while (to < t) {
        var from = 0
        while (from < t) { buf(from) = alpha(i - 1)(from) + tr(from)(to); from += 1 }
        alpha(i)(to) = logSumExp(buf) + emit(i)(to)
        to += 1
      }
      i += 1
    }
    j = 0
    while (j < t) { buf(j) = alpha(L - 1)(j) + tr(j)(m.stopTag); j += 1 }
    (alpha, logSumExp(buf))
  }

  /** Backward betas (log space): beta(i)(tag) = log-sum over completions from
    * position i with tag, EXCLUDING emit(i) (the standard convention that makes
    * alpha(i)+beta(i) = logZ marginals). */
  def backwardBetas(m: NerModel, emit: Array[Array[Float]]): Array[Array[Double]] = {
    val t = m.numTags
    val L = emit.length
    if (L == 0) return Array.empty
    val tr = m.transitions
    val beta = Array.ofDim[Double](L, t)
    var j = 0
    while (j < t) { beta(L - 1)(j) = tr(j)(m.stopTag).toDouble; j += 1 }
    val buf = new Array[Double](t)
    var i = L - 2
    while (i >= 0) {
      var from = 0
      while (from < t) {
        var to = 0
        while (to < t) { buf(to) = tr(from)(to).toDouble + emit(i + 1)(to) + beta(i + 1)(to); to += 1 }
        beta(i)(from) = logSumExp(buf)
        from += 1
      }
      i -= 1
    }
    beta
  }

  /** Score of one tag path (F9, `CRF._score_sentence`). */
  def goldScore(m: NerModel, emit: Array[Array[Float]], tags: Array[Int]): Double = {
    if (tags.isEmpty) return 0.0 // empty sentence: consistent with forwardAlphas' logZ 0
    val tr = m.transitions
    var s = tr(m.startTag)(tags(0)).toDouble + emit(0)(tags(0))
    var i = 1
    while (i < tags.length) {
      s += tr(tags(i - 1))(tags(i)).toDouble + emit(i)(tags(i))
      i += 1
    }
    s + tr(tags.last)(m.stopTag)
  }

  /** F9: `neg_log_likelihood_loss` = logZ − score(gold) for one sentence
    * (≥ 0; the per-batch loss is the sum over sentences). */
  def negLogLikelihood(m: NerModel, emit: Array[Array[Float]], gold: Array[Int]): Double = {
    val (_, logZ) = forwardAlphas(m, emit)
    logZ - goldScore(m, emit, gold)
  }

  /** Exact NLL gradients w.r.t. the emission scores and the transition matrix
    * for one sentence (forward–backward expected counts minus gold counts):
    *   dNLL/dEmit(i)(tag)   = γ_i(tag) − 1{gold_i = tag}
    *   dNLL/dTr(from)(to)   = Σ_i ξ_i(from,to) − 1{gold transition}
    * including the START→t0 and t_last→STOP rows. Returns
    * (loss, dEmit L×T, dTr (T+2)×(T+2)). */
  def crfGradients(m: NerModel, emit: Array[Array[Float]], gold: Array[Int])
      : (Double, Array[Array[Double]], Array[Array[Double]]) = {
    val t = m.numTags
    val L = emit.length
    if (L == 0) // empty sentence: zero loss, zero gradients (guards align
      return (0.0, Array.empty, Array.ofDim[Double](t + 2, t + 2)) // with viterbi)
    val tr = m.transitions
    val (alpha, logZ) = forwardAlphas(m, emit)
    val beta = backwardBetas(m, emit)
    val dEmit = Array.ofDim[Double](L, t)
    val dTr = Array.ofDim[Double](t + 2, t + 2)
    // unary marginals γ_i(tag) = exp(alpha + beta − logZ)
    var i = 0
    while (i < L) {
      var j = 0
      while (j < t) { dEmit(i)(j) = math.exp(alpha(i)(j) + beta(i)(j) - logZ); j += 1 }
      dEmit(i)(gold(i)) -= 1.0
      i += 1
    }
    // START row: P(t0 = j) is the same unary marginal at position 0
    var j = 0
    while (j < t) {
      dTr(m.startTag)(j) = math.exp(alpha(0)(j) + beta(0)(j) - logZ)
      dTr(j)(m.stopTag) = math.exp(alpha(L - 1)(j) + beta(L - 1)(j) - logZ)
      j += 1
    }
    dTr(m.startTag)(gold(0)) -= 1.0
    dTr(gold(L - 1))(m.stopTag) -= 1.0
    // pairwise marginals ξ
    i = 1
    while (i < L) {
      var from = 0
      while (from < t) {
        val a = alpha(i - 1)(from)
        var to = 0
        while (to < t) {
          dTr(from)(to) += math.exp(a + tr(from)(to) + emit(i)(to) + beta(i)(to) - logZ)
          to += 1
        }
        from += 1
      }
      dTr(gold(i - 1))(gold(i)) -= 1.0
      i += 1
    }
    (logZ - goldScore(m, emit, gold), dEmit, dTr)
  }

  // ---------- decode driver (F1 + F10) ----------

  /** Per-thread scratch for the decode hot path: emissions land in one flat
    * L×T float buffer and the Viterbi DP rows/backpointers are reused across
    * sentences. Per-sentence `new` at these three sites was ~20% of the
    * annotate kernel's allocation churn (JFR via tools/AllocProbe) — and
    * allocation bandwidth, not compute, is what caps 32-thread scaling. */
  private final class DecodeScratch {
    var emit: Array[Float] = new Array[Float](0)
    var bp: Array[Int] = new Array[Int](0)
    var prev: Array[Float] = new Array[Float](0)
    var cur: Array[Float] = new Array[Float](0)
    def ensure(cells: Int, t: Int): Unit = {
      if (emit.length < cells) { // grow with headroom; never shrink
        emit = new Array[Float](cells * 2)
        bp = new Array[Int](cells * 2)
      }
      if (prev.length < t) { prev = new Array[Float](t); cur = new Array[Float](t) }
    }
    // pooled Viterbi output ids — valid until the next decode on this thread;
    // decodeBatch maps them to label strings immediately
    var outIds: Array[Int] = new Array[Int](0)
    def ids(n: Int): Array[Int] = {
      if (outIds.length < n) outIds = new Array[Int](n * 2)
      outIds
    }
    // Feature-extractor row pools. `inPtrs` holds borrowed references (layer
    // inputs: cached wordReps); `rowPool(key)` owns reusable float rows for
    // one (layer, width) — the BiLSTM merged rows were the single largest
    // allocation site left after the first scratch pass (~27% — JFR). Rows
    // are valid until the next decode call on this thread; decodeSentence
    // consumes them into the emit buffer immediately.
    var inPtrs: Array[Array[Float]] = new Array[Array[Float]](0)
    private val rowPools = new java.util.HashMap[Long, Array[Array[Float]]]()
    def ptrs(n: Int): Array[Array[Float]] = {
      if (inPtrs.length < n) inPtrs = new Array[Array[Float]](n * 2)
      inPtrs
    }
    def rows(layer: Int, n: Int, width: Int): Array[Array[Float]] = {
      val key = (layer.toLong << 32) | width.toLong
      var r = rowPools.get(key)
      if (r == null || r.length < n) {
        r = new Array[Array[Float]](math.max(n * 2, 64))
        var i = 0
        while (i < r.length) { r(i) = new Array[Float](width); i += 1 }
        rowPools.put(key, r)
      }
      r
    }
  }
  private val decodeScratch: ThreadLocal[DecodeScratch] =
    ThreadLocal.withInitial(() => new DecodeScratch)

  /** Decode one sentence on the scratch path. Bit-identical to
    * `viterbi(m, emissions(m, toks))` (pinned by ScorerSpec): same dots, same
    * DP, same tie-breaks — only the intermediates live in reused buffers. */
  private def decodeSentence(m: NerModel, toks: IndexedSeq[String]): Array[Int] = {
    val L = toks.length
    if (L == 0) return Array.empty
    val s = decodeScratch.get()
    val reps = featuresPooled(m, toks, s) // pool-backed: indices < L only
    val t = m.numTags
    s.ensure(L * t, t)
    val emit = s.emit
    var i = 0
    while (i < L) { // hidden2tag columns ≥ t exist (START/STOP) but the
      val x = reps(i) // decoder never reads them — skip their dot products
      val base = i * t
      var o = 0
      while (o < t) { emit(base + o) = dot(m.hidden2tag(o), x) + m.hidden2tagB(o); o += 1 }
      i += 1
    }
    val tr = m.transitions; val trT = m.transitionsT
    val start = m.startTag; val stop = m.stopTag
    var prev = s.prev; var cur = s.cur
    val bp = s.bp
    var j = 0
    while (j < t) { prev(j) = tr(start)(j) + emit(j); j += 1 }
    i = 1
    while (i < L) {
      val base = i * t
      var to = 0
      while (to < t) {
        val trTo = trT(to)
        var best = Float.NegativeInfinity; var arg = 0
        var from = 0
        while (from < t) {
          val sc = prev(from) + trTo(from)
          if (sc > best) { best = sc; arg = from }
          from += 1
        }
        cur(to) = best + emit(base + to); bp(base + to) = arg
        to += 1
      }
      val tmp = prev; prev = cur; cur = tmp
      i += 1
    }
    var best = Float.NegativeInfinity; var arg = 0
    j = 0
    while (j < t) {
      val sc = prev(j) + tr(j)(stop)
      if (sc > best) { best = sc; arg = j }
      j += 1
    }
    val out = s.ids(L) // pooled: consumed by the caller before the next decode
    out(L - 1) = arg
    i = L - 1
    while (i > 0) { out(i - 1) = bp(i * t + out(i)); i -= 1 }
    out
  }

  /** Decode a batch of sentences: sort desc by length (F1), score, restore
    * input order (F10 recover), map tag ids to label strings. */
  def decodeBatch(m: NerModel, sents: IndexedSeq[IndexedSeq[String]]): IndexedSeq[IndexedSeq[String]] = {
    if (sents.length == 1) { // trivial batch: skip the sort/recover machinery
      val toks = sents.head
      val labs =
        if (toks.isEmpty) IndexedSeq.empty[String]
        else {
          val ids = decodeSentence(m, toks) // pooled: may be longer than toks
          val arr = new Array[String](toks.length)
          var i = 0
          while (i < arr.length) { arr(i) = m.labelAlphabet.instance(ids(i)); i += 1 }
          scala.collection.immutable.ArraySeq.unsafeWrapArray(arr)
        }
      return IndexedSeq(labs)
    }
    // F1 sort: stable insertion sort on an int array, desc by length —
    // batches are a handful of sentences; sortBy's boxed-Integer + Ordering
    // machinery was measurable churn at 32 threads. Equivalent to
    // indices.sortBy(-length) (both stable).
    val order = new Array[Int](sents.length)
    var ii = 0
    while (ii < order.length) { order(ii) = ii; ii += 1 }
    var a = 1
    while (a < order.length) {
      val v = order(a); val lv = sents(v).length
      var b = a - 1
      while (b >= 0 && sents(order(b)).length < lv) { order(b + 1) = order(b); b -= 1 }
      order(b + 1) = v
      a += 1
    }
    val decoded = new Array[IndexedSeq[String]](sents.length)
    var oi = 0
    while (oi < order.length) { // padding is a no-op for per-sentence JVM
      val i = order(oi)         // loops; the sort is kept for fidelity of
      val toks = sents(i)       // iteration order
      val labs =
        if (toks.isEmpty) IndexedSeq.empty[String]
        else {
          val ids = decodeSentence(m, toks)
          val arr = new Array[String](toks.length)
          var k = 0
          while (k < arr.length) { arr(k) = m.labelAlphabet.instance(ids(k)); k += 1 }
          scala.collection.immutable.ArraySeq.unsafeWrapArray(arr)
        }
      decoded(i) = labs
      oi += 1
    }
    scala.collection.immutable.ArraySeq.unsafeWrapArray(decoded) // index-addressed writes == recover permutation
  }

  /** Partition-level decode: batches of cfg.batchSize, keys carried through.
    * This is the body the pipeline hands to Dataset.mapPartitions. */
  def decodePartition[K](m: NerModel, rows: Iterator[(K, IndexedSeq[String])]): Iterator[(K, IndexedSeq[String])] =
    rows.grouped(m.config.batchSize).flatMap { group =>
      val labs = decodeBatch(m, group.map(_._2).toIndexedSeq)
      group.iterator.zip(labs.iterator).map { case ((k, _), l) => (k, l) }
    }
}
