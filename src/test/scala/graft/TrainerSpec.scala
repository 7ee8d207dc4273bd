package graft

import graft.ner.{NerModel, Scorer, Trainer}
import graft.ner.Trainer.TrainExample
import graft.fixtures.Fixtures
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** F13: distributed CRF-head training (treeAggregate of exact forward–backward
  * gradients, minibatch SGD with lr decay, epoch-seeded shuffle, best-dev
  * checkpointing). The task: recover a NOISE-PERTURBED oracle head — the
  * frozen encoder makes the features linearly separable by construction, so a
  * correct trainer must restore near-gold accuracy and a broken gradient
  * cannot. */
class TrainerSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def goldExamples(from: Int, until: Int): Seq[TrainExample] =
    (from until until).flatMap { i =>
      Fixtures.doc(i).sentences.map(sn => TrainExample(sn.tokens, sn.goldSingle))
    }

  /** Oracle token-single model with the trainable head perturbed: hidden2tag
    * gets ±4 uniform noise, legal transitions get ±1 noise (structural −10000
    * walls untouched — the trainer must also leave them frozen). */
  private def perturbedOracle(seed: Long): NerModel = {
    val (s, _, _) = Fixtures.oracleVocab(0)
    val m = NerModel.synthesizeOracle("token-single", s, s.values.toSeq.distinct)
    val r = new Random(seed)
    val w = m.hidden2tag.map(_.map(v => v + (r.nextFloat() * 8f - 4f)))
    val tr = m.transitions.map(_.map(v => if (v <= -5000f) v else v + (r.nextFloat() * 2f - 1f)))
    m.copy(hidden2tag = w, transitions = tr)
  }

  test("training restores a perturbed oracle head: loss falls, dev accuracy recovers") {
    import spark.implicits._
    val init = perturbedOracle(seed = 7)
    val dev = goldExamples(60, 80)
    val initAcc = Trainer.devTokenAccuracy(init, dev)
    assert(initAcc < 0.97, s"perturbation too weak to make training observable ($initAcc)")
    // 150 docs so every (BIOSE position × category) label occurs in training —
    // a label with zero training occurrences gets no gradient (its feature
    // never fires) and its perturbed column would stay noisy forever
    val train = spark.createDataset(goldExamples(0, 150)).repartition(4)
    val (best, hist) = Trainer.train(spark, train, dev, init,
      epochs = 12, lr0 = 0.3, lrDecay = 0.05, nBatches = 3)
    assert(hist.length === 12)
    // loss falls: final epoch mean NLL well under the first epoch's
    assert(hist.last.trainNll < hist.head.trainNll * 0.5,
      s"NLL did not fall: ${hist.map(_.trainNll)}")
    // lr decays monotonically per the reference schedule
    assert(hist.map(_.lr).sliding(2).forall { case Seq(a, b) => b < a; case _ => true })
    // dev accuracy recovers to near-gold and the returned model is best-dev
    val bestAcc = Trainer.devTokenAccuracy(best, dev)
    assert(bestAcc >= 0.99, s"dev accuracy did not recover: $initAcc -> $bestAcc " +
      s"(history: ${hist.map(_.devTokenAcc)})")
    assert(math.abs(bestAcc - hist.map(_.devTokenAcc).max) < 1e-9 || bestAcc >= hist.map(_.devTokenAcc).max)
    // structural walls stayed frozen
    val (s, _, _) = Fixtures.oracleVocab(0)
    val oracle = NerModel.synthesizeOracle("token-single", s, s.values.toSeq.distinct)
    for (a <- oracle.transitions.indices; b <- oracle.transitions.indices
         if oracle.transitions(a)(b) <= -5000f)
      assert(best.transitions(a)(b) === oracle.transitions(a)(b),
        s"BIOSE wall ($a,$b) was modified by training")
  }

  test("full-network training learns a task from RANDOM init (trainEncoder=true)") {
    // word→label task: only solvable by training the embeddings/encoder — the
    // random init knows nothing, and the head alone cannot separate what the
    // random features don't encode reliably. BiLSTM + charCNN, all parameter
    // groups live.
    import spark.implicits._
    val vocab = Seq("אבג", "דהו", "זחט", "יכל", "מנס", "עפצ", "קרש", "תאב", "גדה", "וזח", "טיכ", "למנ")
    val labOf = vocab.zipWithIndex.map { case (w, i) =>
      w -> Seq("O", "S-PER", "S-ORG")(i % 3)
    }.toMap
    val r = new Random(5)
    def sent(): TrainExample = {
      val ws = Seq.fill(3 + r.nextInt(5))(vocab(r.nextInt(vocab.length)))
      TrainExample(ws, ws.map(labOf))
    }
    val trainEx = Seq.fill(220)(sent())
    val devEx = Seq.fill(40)(sent())
    val init = ner.NerModel.synthesize(
      ner.NerConfig("token-single", wordEmbDim = 8, charEmbDim = 4, charHidden = 4,
        hidden = 8, lstmLayers = 1, wordExtractor = "LSTM", charExtractor = "CNN"),
      vocab, Seq("O", "S-PER", "S-ORG"), seed = 23)
    val initAcc = Trainer.devTokenAccuracy(init, devEx)
    assert(initAcc < 0.8, s"random init should be near chance, got $initAcc")
    val (best, hist) = Trainer.train(spark, spark.createDataset(trainEx).repartition(4), devEx,
      init, epochs = 15, lr0 = 0.5, lrDecay = 0.05, nBatches = 2, trainEncoder = true)
    val bestAcc = Trainer.devTokenAccuracy(best, devEx)
    assert(hist.last.trainNll < hist.head.trainNll * 0.2,
      s"full training NLL did not fall: ${hist.map(_.trainNll)}")
    assert(bestAcc >= 0.95,
      s"full training failed to learn: $initAcc -> $bestAcc (${hist.map(_.devTokenAcc)})")
  }

  test("encoder-training gradients ship SPARSE embedding rows, not the vocab table") {
    // at real dims (vocab 10^5 × 300d) a dense dWordEmb is ~240 MB per
    // treeAggregate message; the sparse container must keep the payload
    // minibatch-sized: only the rows the batch touched, regardless of vocab
    // digit-free vocab: number normalization (B1) must not alias words here
    def heb(i: Int): String = {
      var n = i; val sb = new StringBuilder("מלה")
      while ({ sb.append(('א' + n % 22).toChar); n /= 22; n > 0 }) ()
      sb.toString
    }
    val bigVocab = (0 until 20000).map(heb)
    val m = ner.NerModel.synthesize(
      ner.NerConfig("token-single", wordEmbDim = 8, charEmbDim = 4, charHidden = 4,
        hidden = 8, lstmLayers = 1, wordExtractor = "LSTM", charExtractor = "CNN"),
      bigVocab, Seq("O", "S-PER"), seed = 3)
    val g = new ner.Backprop.ModelGrad(m)
    val toks = IndexedSeq(heb(7), heb(19999), heb(7), heb(42))
    val gold = Array(0, 1, 0, 1).map(_ + 1) // valid label ids (1-based)
    ner.Backprop.accumulate(m, g, toks, gold)
    assert(g.dWordEmb.nTouched === 3, "exactly the distinct touched word rows")
    assert(g.dWordEmb(m.wordAlphabet.get(heb(7))).exists(_ != 0.0))
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(g); oos.close()
    val denseWordEmbBytes = m.wordEmb.length.toLong * m.config.wordEmbDim * 8
    assert(bos.size() < denseWordEmbBytes / 4,
      s"gradient payload ${bos.size()} B should be far below the dense " +
      s"word-embedding table ($denseWordEmbBytes B) — it must not scale with vocab")
    // and the sparse step only rewrites touched rows: untouched rows are the
    // SAME array references (no vocab-sized copy per minibatch step)
    val stepped = Trainer.train(spark, {
      import spark.implicits._
      spark.createDataset(Seq(TrainExample(toks, Seq("O", "S-PER", "O", "S-PER"))))
    }, dev = Seq(TrainExample(toks, Seq("O", "S-PER", "O", "S-PER"))),
      init = m, epochs = 1, nBatches = 1, trainEncoder = true)._1
    val untouched = m.wordAlphabet.get(heb(9999))
    assert(stepped.wordEmb(untouched) eq m.wordEmb(untouched))
    assert(!(stepped.wordEmb(m.wordAlphabet.get(heb(7))) eq m.wordEmb(m.wordAlphabet.get(heb(7)))))
  }

  test("one exact gradient step lowers the batch NLL (sanity anchor for F13)") {
    val init = perturbedOracle(seed = 11)
    val exs = goldExamples(0, 4)
    def batchNll(m: NerModel): Double = exs.map { ex =>
      val emit = Scorer.emissions(m, ex.tokens.toIndexedSeq)
      val gold = ex.labels.map(m.labelAlphabet.get).toArray
      Scorer.negLogLikelihood(m, emit, gold)
    }.sum
    val acc = new Trainer.GradAcc(init.numTags + 2, init.featDim)
    exs.foreach(ex => Trainer.accumulate(init, acc, ex))
    assert(acc.n === exs.size)
    // apply one small step by re-running train with 1 epoch / 1 batch on the
    // same examples (full-batch GD step) and compare NLL
    import spark.implicits._
    val ds = spark.createDataset(exs)
    val (_, hist) = Trainer.train(spark, ds, dev = exs, init,
      epochs = 2, lr0 = 0.02, lrDecay = 0.0, nBatches = 1)
    assert(hist(1).trainNll < hist(0).trainNll, s"full-batch GD step did not lower NLL: $hist")
    assert(batchNll(init) > 0.0)
  }
}
