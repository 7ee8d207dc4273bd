package graft

import graft.ner.{NerModel, NerConfig, SentClassifier}
import graft.fixtures.Fixtures
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** F14: sentence classification head (reference model/sentclassifier.py —
  * dead code for the NEMO pipelines, implemented for surface completeness). */
class SentClassifierSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def lstmBase(seed: Long): NerModel =
    NerModel.synthesize(
      NerConfig("token-single", wordEmbDim = 5, charEmbDim = 4, charHidden = 3,
        hidden = 6, lstmLayers = 2, wordExtractor = "LSTM", charExtractor = "CNN"),
      Seq("אבג", "דהו", "זחט", "יכל"), Seq("O", "S-PER"), seed)

  test("representation shape and determinism (LSTM h_n concat / CNN max-pool)") {
    val m = lstmBase(3)
    val toks = IndexedSeq("אבג", "זחט", "דהו")
    val r1 = SentClassifier.represent(m, toks)
    val r2 = SentClassifier.represent(m, toks)
    assert(r1.toSeq === r2.toSeq)
    assert(r1.length === m.lstm.length * 2 * m.config.hidden)
    assert(r1.length === SentClassifier.repDim(m))
    assert(SentClassifier.represent(m, IndexedSeq.empty).toSeq === Seq.fill(r1.length)(0f))
    // CNN path
    val (s, _, _) = Fixtures.oracleVocab(0)
    val cnn = NerModel.synthesizeOracle("token-single", s, s.values.toSeq.distinct)
    val rc = SentClassifier.represent(cnn, IndexedSeq(s.keys.head))
    assert(rc.length === SentClassifier.repDim(cnn))
  }

  test("cross-entropy is a proper softmax NLL and head gradients match finite differences") {
    val m = lstmBase(5)
    val labels = IndexedSeq("a", "b", "c")
    val r = new Random(9)
    val sm = SentClassifier.SentModel(m, labels,
      Array.fill(3)(Array.fill(SentClassifier.repDim(m))((r.nextFloat() - 0.5f))),
      Array.fill(3)(r.nextFloat() - 0.5f))
    val toks = IndexedSeq("אבג", "דהו", "זחט", "אבג")
    val ce = SentClassifier.crossEntropy(sm, toks, 1)
    assert(ce >= 0.0)
    // probabilities over classes sum the loss correctly: Σ_gold exp(−CE) = 1
    val total = (0 until 3).map(k => math.exp(-SentClassifier.crossEntropy(sm, toks, k))).sum
    assert(math.abs(total - 1.0) < 1e-6)
    // finite-difference check of the head gradient
    val acc = new SentClassifier.HeadGrad(3, SentClassifier.repDim(m))
    SentClassifier.accumulate(sm, acc, toks, 1)
    val eps = 1e-3f
    for (_ <- 0 until 8) {
      val k = r.nextInt(3); val d = r.nextInt(SentClassifier.repDim(m))
      def ceW(delta: Float): Double = {
        val w2 = sm.w.map(_.clone()); w2(k)(d) += delta
        SentClassifier.crossEntropy(sm.copy(w = w2), toks, 1)
      }
      val fd = (ceW(eps) - ceW(-eps)) / (2 * eps)
      assert(math.abs(fd - acc.dW(k)(d)) < 1e-3, s"dW($k)($d): fd=$fd analytic=${acc.dW(k)(d)}")
      def ceB(delta: Float): Double = {
        val b2 = sm.b.clone(); b2(k) += delta
        SentClassifier.crossEntropy(sm.copy(b = b2), toks, 1)
      }
      val fdB = (ceB(eps) - ceB(-eps)) / (2 * eps)
      assert(math.abs(fdB - acc.dB(k)) < 1e-3)
    }
  }

  test("distributed head training learns entity-presence classification e2e") {
    import spark.implicits._
    // oracle base: CNN max-pooled rep has a 10 at coordinate L iff some token
    // carries label L — "does the sentence mention a PER entity" is exactly
    // linearly separable, so a correct trainer must reach ~perfect accuracy
    val (s, _, _) = Fixtures.oracleVocab(0)
    val base = NerModel.synthesizeOracle("token-single", s, s.values.toSeq.distinct)
    def cls(labels: Seq[String]): String = if (labels.exists(_.endsWith("-PER"))) "per" else "other"
    val all = (0 until 120).flatMap { i =>
      Fixtures.doc(i).sentences.map(sn => (sn.tokens: Seq[String], cls(sn.goldSingle)))
    }
    // stratified split: every 4th example of EACH class goes to dev
    val byClass = all.groupBy(_._2)
    val trainEx = byClass.values.flatMap(_.zipWithIndex.collect { case (e, i) if i % 4 != 0 => e }).toSeq
    val devEx = byClass.values.flatMap(_.zipWithIndex.collect { case (e, i) if i % 4 == 0 => e }).toSeq
    assert(devEx.map(_._2).distinct.length === 2, "dev must contain both classes")
    val init = SentClassifier.init(base, Seq("other", "per"))
    val (trained, losses) = SentClassifier.trainHead(
      spark, spark.createDataset(trainEx).repartition(4), init, epochs = 25, lr0 = 0.5)
    assert(losses.last < losses.head * 0.2, s"loss did not fall: $losses")
    val acc = devEx.count { case (t, c) =>
      SentClassifier.classify(trained, t.toIndexedSeq) == c
    }.toDouble / devEx.length
    assert(acc >= 0.97, s"entity-presence accuracy too low: $acc")
    // distributed classify matches the local one
    val ds = spark.createDataset(devEx.zipWithIndex.map { case ((t, _), i) => (i.toLong, t) })
    val got = SentClassifier.classifyDs(spark, trained, ds).collect().toMap
    devEx.zipWithIndex.foreach { case ((t, _), i) =>
      assert(got(i.toLong) === SentClassifier.classify(trained, t.toIndexedSeq))
    }
  }
}
