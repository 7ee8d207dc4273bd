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
  }
}
