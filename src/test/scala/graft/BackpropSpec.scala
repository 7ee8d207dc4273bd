package graft

import graft.ner.{NerModel, NerConfig, Scorer, Backprop, LstmCellWeights}
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Full-network backprop verification (F13 at full fidelity): for every
  * trainable parameter group, the analytic gradient from Backprop.accumulate
  * must match central finite differences of the NLL computed through the
  * REGULAR inference path (Scorer.emissions) — which simultaneously proves the
  * cached forward pass inside Backprop replicates inference exactly. */
class BackpropSpec extends AnyFunSuite {

  private def deepCopy(m: NerModel): NerModel = {
    def c2(a: Array[Array[Float]]) = a.map(_.clone())
    def c3(a: Array[Array[Array[Float]]]) = a.map(c2)
    def cl(w: LstmCellWeights) = LstmCellWeights(c2(w.wi), c2(w.wh), w.b.clone())
    m.copy(
      wordEmb = c2(m.wordEmb), charEmb = c2(m.charEmb),
      charCnnW = c3(m.charCnnW), charCnnB = m.charCnnB.clone(),
      charLstm = m.charLstm.map(_.map(cl)),
      lstm = m.lstm.map(_.map(cl)),
      cnnW = c3(m.cnnW), cnnB = m.cnnB.clone(),
      hidden2tag = c2(m.hidden2tag), hidden2tagB = m.hidden2tagB.clone(),
      transitions = c2(m.transitions))
  }

  private def nllOf(m: NerModel, toks: IndexedSeq[String], gold: Array[Int]): Double =
    Scorer.negLogLikelihood(m, Scorer.emissions(m, toks), gold)

  /** Central finite difference for a parameter reached via `mutate`. */
  private def fd(m: NerModel, toks: IndexedSeq[String], gold: Array[Int],
                 eps: Float)(mutate: (NerModel, Float) => Unit): Double = {
    val up = deepCopy(m); mutate(up, eps)
    val dn = deepCopy(m); mutate(dn, -eps)
    (nllOf(up, toks, gold) - nllOf(dn, toks, gold)) / (2.0 * eps)
  }

  private def checkAll(cfg: NerConfig, seed: Long): Unit = {
    val words = Seq("אבג", "דהוז", "חט", "יכלמ")
    val labels = Seq("O", "B-PER", "E-PER", "S-ORG")
    val m = NerModel.synthesize(cfg, words, labels, seed)
    val r = new Random(seed * 7 + 1)
    val toks = IndexedSeq("אבג", "חט", "דהוז", "אבג", "יכלמ")
    val gold = Array.fill(toks.length)(r.nextInt(m.numTags))
    val g = new Backprop.ModelGrad(m)
    val loss = Backprop.accumulate(m, g, toks, gold)
    // forward parity: the cached forward's loss equals the inference-path NLL
    assert(math.abs(loss - nllOf(m, toks, gold)) < 1e-6,
      s"Backprop forward diverges from Scorer.emissions (cfg=$cfg)")
    val eps = 1e-2f
    def check(tag: String, analytic: Double)(mutate: (NerModel, Float) => Unit): Unit = {
      val numeric = fd(m, toks, gold, eps)(mutate)
      val tol = math.max(5e-3, 2e-2 * math.abs(numeric))
      assert(math.abs(numeric - analytic) < tol,
        s"$tag (cfg=${cfg.wordExtractor}/${cfg.charExtractor}): fd=$numeric analytic=$analytic")
    }
    // word embedding of a word that occurs in the sentence
    val wid = m.wordAlphabet.get("אבג")
    check("wordEmb", g.dWordEmb(wid)(1))((mm, e) => mm.wordEmb(wid)(1) += e)
    // transitions + head
    check("transitions", g.dTr(0)(1))((mm, e) => mm.transitions(0)(1) += e)
    check("hidden2tag", g.dH2t(2)(0))((mm, e) => mm.hidden2tag(2)(0) += e)
    check("hidden2tagB", g.dH2tB(1))((mm, e) => mm.hidden2tagB(1) += e)
    if (cfg.wordExtractor == "CNN") {
      check("cnnW", g.dCnnW(0)(1)(2))((mm, e) => mm.cnnW(0)(1)(2) += e)
      check("cnnB", g.dCnnB(3))((mm, e) => mm.cnnB(3) += e)
    } else {
      for (layer <- m.lstm.indices; dir <- 0 to 1) {
        check(s"lstm$layer/$dir.wi", g.dLstm(layer)(dir).wi(2)(1))(
          (mm, e) => mm.lstm(layer)(dir).wi(2)(1) += e)
        check(s"lstm$layer/$dir.wh", g.dLstm(layer)(dir).wh(1)(0))(
          (mm, e) => mm.lstm(layer)(dir).wh(1)(0) += e)
        check(s"lstm$layer/$dir.b", g.dLstm(layer)(dir).b(0))(
          (mm, e) => mm.lstm(layer)(dir).b(0) += e)
      }
    }
    cfg.charExtractor match {
      case "CNN" =>
        val cid = m.charAlphabet.get("א")
        check("charEmb", g.dCharEmb(cid)(0))((mm, e) => mm.charEmb(cid)(0) += e)
        check("charCnnW", g.dCharCnnW(1)(0)(1))((mm, e) => mm.charCnnW(1)(0)(1) += e)
        check("charCnnB", g.dCharCnnB(0))((mm, e) => mm.charCnnB(0) += e)
      case "LSTM" =>
        val cid = m.charAlphabet.get("ד")
        check("charEmb", g.dCharEmb(cid)(1))((mm, e) => mm.charEmb(cid)(1) += e)
        for (dir <- 0 to 1) {
          check(s"charLstm/$dir.wi", g.dCharLstm.get(dir).wi(1)(0))(
            (mm, e) => mm.charLstm.get(dir).wi(1)(0) += e)
          check(s"charLstm/$dir.b", g.dCharLstm.get(dir).b(2))(
            (mm, e) => mm.charLstm.get(dir).b(2) += e)
        }
      case _ =>
    }
  }

  test("gradients match finite differences: BiLSTM + charCNN") {
    checkAll(NerConfig("token-single", wordEmbDim = 5, charEmbDim = 4, charHidden = 4,
      hidden = 5, lstmLayers = 2, wordExtractor = "LSTM", charExtractor = "CNN"), seed = 11)
  }

  test("gradients match finite differences: BiLSTM + charLSTM") {
    checkAll(NerConfig("token-single", wordEmbDim = 5, charEmbDim = 4, charHidden = 3,
      hidden = 4, lstmLayers = 1, wordExtractor = "LSTM", charExtractor = "LSTM"), seed = 13)
  }

  test("gradients match finite differences: word CNN + no char") {
    checkAll(NerConfig("token-single", wordEmbDim = 6, charEmbDim = 4, charHidden = 4,
      hidden = 5, lstmLayers = 1, wordExtractor = "CNN", charExtractor = "NONE"), seed = 17)
  }

  test("gradients match finite differences: word CNN + charCNN") {
    checkAll(NerConfig("token-single", wordEmbDim = 4, charEmbDim = 3, charHidden = 3,
      hidden = 4, lstmLayers = 1, wordExtractor = "CNN", charExtractor = "CNN"), seed = 19)
  }
}
