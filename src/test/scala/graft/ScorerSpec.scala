package graft

import graft.ner.{NerModel, NerConfig, Scorer, Alphabet}
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

class ScorerSpec extends AnyFunSuite {

  test("normalizeWord folds digits (B1)") {
    assert(Scorer.normalizeWord("abc123") === "abc000")
    assert(Scorer.normalizeWord("אבג") === "אבג")
  }

  // ---- Viterbi vs exhaustive enumeration (the correctness anchor, SURVEY §5) ----

  private def enumerateBest(m: NerModel, emit: Array[Array[Float]]): Float = {
    val t = m.numTags
    val L = emit.length
    var best = Float.NegativeInfinity
    def rec(i: Int, prev: Int, score: Float): Unit = {
      if (i == L) { val s = score + m.transitions(prev)(m.stopTag); if (s > best) best = s }
      else {
        var j = 0
        while (j < t) {
          rec(i + 1, j, score + m.transitions(prev)(j) + emit(i)(j))
          j += 1
        }
      }
    }
    var j = 0
    while (j < t) { rec(1, j, m.transitions(m.startTag)(j) + emit(0)(j)); j += 1 }
    best
  }

  private def pathScore(m: NerModel, emit: Array[Array[Float]], path: Array[Int]): Float = {
    var s = m.transitions(m.startTag)(path(0)) + emit(0)(path(0))
    for (i <- 1 until path.length) s += m.transitions(path(i - 1))(path(i)) + emit(i)(path(i))
    s + m.transitions(path.last)(m.stopTag)
  }

  test("property: viterbi path score equals exhaustive max on 100 random models") {
    val r = new Random(17)
    for (trial <- 0 until 100) {
      val labels = Seq("O", "B-PER", "I-PER", "E-PER")
      val words = Seq("aa", "bb", "cc", "dd")
      val m = NerModel.synthesize(
        NerConfig("token-single", wordEmbDim = 4, charEmbDim = 3, charHidden = 3,
          hidden = 4, lstmLayers = 1), words, labels, seed = trial)
      val L = 1 + r.nextInt(4)
      val emit = Array.fill(L)(Array.fill(m.numTags)((r.nextDouble() * 4 - 2).toFloat))
      val path = Scorer.viterbi(m, emit)
      assert(math.abs(pathScore(m, emit, path) - enumerateBest(m, emit)) < 1e-3f)
    }
  }

  // ---- F9: CRF loss (forward algorithm vs exhaustive enumeration) ----

  private def enumerateLogZ(m: NerModel, emit: Array[Array[Float]]): Double = {
    val t = m.numTags
    val L = emit.length
    val scores = scala.collection.mutable.ArrayBuffer.empty[Double]
    def rec(i: Int, prev: Int, score: Double): Unit = {
      if (i == L) scores += score + m.transitions(prev)(m.stopTag)
      else (0 until t).foreach(j => rec(i + 1, j, score + m.transitions(prev)(j) + emit(i)(j)))
    }
    (0 until t).foreach(j => rec(1, j, m.transitions(m.startTag)(j).toDouble + emit(0)(j)))
    val mx = scores.max
    mx + math.log(scores.map(s => math.exp(s - mx)).sum)
  }

  test("property: forward logZ equals exhaustive log-sum over all paths (F9)") {
    val r = new Random(31)
    for (trial <- 0 until 50) {
      val m = NerModel.synthesize(
        NerConfig("token-single", wordEmbDim = 4, charEmbDim = 3, charHidden = 3,
          hidden = 4, lstmLayers = 1), Seq("aa", "bb"), Seq("O", "B-PER", "E-PER"), seed = trial)
      val L = 1 + r.nextInt(4)
      val emit = Array.fill(L)(Array.fill(m.numTags)((r.nextDouble() * 4 - 2).toFloat))
      val (_, logZ) = Scorer.forwardAlphas(m, emit)
      assert(math.abs(logZ - enumerateLogZ(m, emit)) < 1e-6)
      // NLL ≥ 0 for every path (logZ dominates any single path's score)
      val gold = Array.fill(L)(r.nextInt(m.numTags))
      val nll = Scorer.negLogLikelihood(m, emit, gold)
      assert(nll >= -1e-9, s"NLL must be non-negative, got $nll")
      assert(math.abs(nll - (logZ - Scorer.goldScore(m, emit, gold))) < 1e-9)
    }
  }

  test("crfGradients match finite differences on emissions and transitions (F9/F13)") {
    val r = new Random(47)
    val m0 = NerModel.synthesize(
      NerConfig("token-single", wordEmbDim = 4, charEmbDim = 3, charHidden = 3,
        hidden = 4, lstmLayers = 1), Seq("aa", "bb"), Seq("O", "S-PER"), seed = 3)
    val L = 4
    val emit = Array.fill(L)(Array.fill(m0.numTags)((r.nextDouble() * 2 - 1).toFloat))
    val gold = Array.fill(L)(r.nextInt(m0.numTags))
    val (_, dEmit, dTr) = Scorer.crfGradients(m0, emit, gold)
    val eps = 1e-3f
    // emissions: perturb a handful of entries
    for (_ <- 0 until 10) {
      val i = r.nextInt(L); val j = r.nextInt(m0.numTags)
      val e2 = emit.map(_.clone())
      e2(i)(j) += eps
      val up = Scorer.negLogLikelihood(m0, e2, gold)
      e2(i)(j) -= 2 * eps
      val dn = Scorer.negLogLikelihood(m0, e2, gold)
      val fd = (up - dn) / (2 * eps)
      assert(math.abs(fd - dEmit(i)(j)) < 1e-3, s"dEmit($i)($j): fd=$fd analytic=${dEmit(i)(j)}")
    }
    // transitions: perturb entries incl. START/STOP rows
    for (_ <- 0 until 10) {
      val a = r.nextInt(m0.numTags + 2); val b = r.nextInt(m0.numTags + 2)
      def withTr(d: Float): NerModel = {
        val tr = m0.transitions.map(_.clone()); tr(a)(b) += d; m0.copy(transitions = tr)
      }
      val fd = (Scorer.negLogLikelihood(withTr(eps), emit, gold) -
        Scorer.negLogLikelihood(withTr(-eps), emit, gold)) / (2 * eps)
      assert(math.abs(fd - dTr(a)(b)) < 1e-3, s"dTr($a)($b): fd=$fd analytic=${dTr(a)(b)}")
    }
  }

  test("viterbiNbest: best equals viterbi; scores non-increasing; paths distinct") {
    val r = new Random(23)
    val m = NerModel.synthesize(
      NerConfig("token-single", wordEmbDim = 4, charEmbDim = 3, charHidden = 3,
        hidden = 4, lstmLayers = 1), Seq("aa", "bb"), Seq("O", "S-PER", "B-ORG"), seed = 5)
    val emit = Array.fill(4)(Array.fill(m.numTags)((r.nextDouble() * 4 - 2).toFloat))
    val nbest = Scorer.viterbiNbest(m, emit, 5)
    val v = Scorer.viterbi(m, emit)
    assert(nbest.head._2.toSeq === v.toSeq)
    assert(nbest.map(_._1).sliding(2).forall { case Seq(a, b) => a >= b; case _ => true })
    assert(nbest.map(_._2.toSeq).distinct.length === nbest.length)
  }

  test("LSTM/charCNN/charLSTM paths run and are deterministic") {
    for (charEx <- Seq("CNN", "LSTM", "NONE")) {
      val cfg = NerConfig("token-single", wordEmbDim = 6, charEmbDim = 4, charHidden = 4,
        hidden = 5, lstmLayers = 2, charExtractor = charEx)
      val m = NerModel.synthesize(cfg, Seq("אבג", "דהו", "זחט"), Seq("O", "S-PER"), seed = 9)
      val out1 = Scorer.decodeBatch(m, IndexedSeq(IndexedSeq("אבג", "דהו", "זחט", "xyz")))
      val out2 = Scorer.decodeBatch(m, IndexedSeq(IndexedSeq("אבג", "דהו", "זחט", "xyz")))
      assert(out1 === out2)
      assert(out1.head.length === 4)
      // random weights may legitimately emit the pad tag; the point here is
      // determinism + shape, not label quality
      assert(out1.head.forall(l => l == "O" || l == "S-PER" || l == "</pad>"))
    }
  }

  test("decodePartition restores input order across batches (F1/F10 recover)") {
    val (s, _, _) = graft.fixtures.Fixtures.oracleVocab(0)
    val m = NerModel.synthesizeOracle("token-single", s, s.values.toSeq.distinct)
    // variable-length sentences so the in-batch sort actually permutes
    val sents = (0 until 23).map { i =>
      (i, graft.fixtures.Fixtures.fillers.take(1 + (i % 7)).toIndexedSeq)
    }
    val out = Scorer.decodePartition(m.copy(config = m.config.copy(batchSize = 4)), sents.iterator).toIndexedSeq
    assert(out.map(_._1) === sents.map(_._1)) // keys in original order
    out.zip(sents).foreach { case ((_, labs), (_, toks)) => assert(labs.length === toks.length) }
  }

  test("oracle model reproduces planted gold labels end-to-end (all 3 modes)") {
    val models = Pipeline.fixtureModels()
    for (docId <- 0 until 30) {
      val d = graft.fixtures.Fixtures.doc(docId)
      for (sent <- d.sentences) {
        val single = Scorer.decodeBatch(models.single, IndexedSeq(sent.tokens)).head
        assert(single === sent.goldSingle, s"single mismatch doc=$docId toks=${sent.tokens}")
        val multi = Scorer.decodeBatch(models.multi, IndexedSeq(sent.tokens)).head
        assert(multi === sent.goldMulti, s"multi mismatch doc=$docId")
        val morphFlat = sent.morphForms.flatten
        val morph = Scorer.decodeBatch(models.morph, IndexedSeq(morphFlat)).head
        assert(morph === sent.goldMorph.flatten, s"morph mismatch doc=$docId")
      }
    }
  }

  test("alphabet pad/unk conventions (F2)") {
    val a = Alphabet.fromStrings(Seq("x", "y"))
    assert(a.get("x") === 2 && a.get("y") === 3)
    assert(a.get("zzz") === a.unkIndex)
    assert(a.instance(2) === "x")
    val l = Alphabet.fromStrings(Seq("O", "S-PER"), isLabel = true)
    assert(l.get("O") === 1)
    assert(l.instance(1) === "O")
    // a frozen label alphabet has no UNKNOWN slot — the reference raises
    // KeyError (alphabet.py:56); silent fallback would decode wrong labels
    intercept[NoSuchElementException] { l.get("B-MISSING") }
  }

  test("CRF math guards empty sentences consistently with viterbi") {
    val m = NerModel.synthesize(
      NerConfig("token-single", wordEmbDim = 4, charEmbDim = 3, charHidden = 3,
        hidden = 4, lstmLayers = 1),
      Seq("aa", "bb"), Seq("O", "S-PER"), seed = 5)
    val empty = Array.empty[Array[Float]]
    val (alpha, logZ) = Scorer.forwardAlphas(m, empty)
    assert(alpha.isEmpty && logZ === 0.0)
    assert(Scorer.backwardBetas(m, empty).isEmpty)
    assert(Scorer.goldScore(m, empty, Array.empty) === 0.0)
    val (loss, dEmit, dTr) = Scorer.crfGradients(m, empty, Array.empty)
    assert(loss === 0.0 && dEmit.isEmpty && dTr.forall(_.forall(_ === 0.0)))
    assert(Scorer.negLogLikelihood(m, empty, Array.empty) === 0.0)
  }

  test("property: decodeBatch (scratch fast path) equals viterbi(emissions) label-for-label") {
    // decodeBatch routes through the thread-local-scratch decodeSentence —
    // this pins it to the public reference composition on random models,
    // random vocab overlap, and both char extractors
    val r = new Random(41)
    val labels = Seq("O", "B-PER", "I-PER", "E-PER", "S-ORG")
    val vocab = Seq("אא", "בב", "גג", "דד", "x1", "yy")
    for (trial <- 0 until 30) {
      val ext = if (trial % 2 == 0) "CNN" else "LSTM"
      val m = NerModel.synthesize(
        NerConfig("token-single", wordEmbDim = 5, charEmbDim = 3, charHidden = 4,
          hidden = 6, lstmLayers = 1 + trial % 2, charExtractor = ext),
        vocab, labels, seed = 1000 + trial)
      val sents = (0 until (1 + r.nextInt(4))).map { _ =>
        (0 until (1 + r.nextInt(7))).map(_ =>
          if (r.nextBoolean()) vocab(r.nextInt(vocab.length)) else "oov" + r.nextInt(3))
          .toIndexedSeq
      }.toIndexedSeq
      val fast = Scorer.decodeBatch(m, sents)
      val ref = sents.map { toks =>
        Scorer.viterbi(m, Scorer.emissions(m, toks))
          .map(m.labelAlphabet.instance).toIndexedSeq
      }
      assert(fast === ref, s"trial=$trial ext=$ext")
    }
  }
}
