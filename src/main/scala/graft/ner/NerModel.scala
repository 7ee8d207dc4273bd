package graft.ner

import scala.util.Random

/** Model hyperparameters (the engine's analog of the reference's key=value
  * decode `.conf` + pickled `Data` — utils/data.py:395-546, 342-351). */
final case class NerConfig(
    mode: String,                    // token-single | token-multi | morph
    wordEmbDim: Int = 16,
    charEmbDim: Int = 8,
    charHidden: Int = 8,
    charKernel: Int = 3,
    hidden: Int = 16,                // per-direction LSTM hidden
    lstmLayers: Int = 2,
    wordExtractor: String = "LSTM",  // LSTM | CNN (NCRF++ word_feature_extractor)
    charExtractor: String = "CNN",   // CNN | LSTM | NONE
    maxSentenceLength: Int = 250,    // reference utils/data.py:25
    batchSize: Int = 32,
    numberNormalized: Boolean = true)

/** All weights of one BiLSTM/CNN-CRF sequence labeler, as flat JVM arrays.
  *
  * Layout mirrors the reference model graph (model/wordsequence.py,
  * model/charcnn.py, model/charbilstm.py, model/crf.py) without porting any
  * numerics: weights here are synthesized deterministically (seeded uniform
  * ±sqrt(3/dim), the reference's init scheme — utils/functions.py:162-218).
  *
  * CRF tag space has two extra tags: START = T, STOP = T+1 (model/crf.py:39-46);
  * transitions(i)(j) = score of moving FROM tag j TO tag i is NCRF++'s layout,
  * we use the more common transitions(from)(to).
  */
final case class NerModel(
    config: NerConfig,
    wordAlphabet: Alphabet,
    charAlphabet: Alphabet,
    labelAlphabet: Alphabet,
    wordEmb: Array[Array[Float]],                  // wordVocab × wordEmbDim
    charEmb: Array[Array[Float]],                  // charVocab × charEmbDim
    charCnnW: Array[Array[Array[Float]]],          // charHidden × k × charEmbDim (kernel-major, contiguous d)
    charCnnB: Array[Float],
    charLstm: Option[Array[LstmCellWeights]],      // [fwd, bwd] when charExtractor=LSTM
    lstm: Array[Array[LstmCellWeights]],           // layers × [fwd, bwd]
    cnnW: Array[Array[Array[Float]]],              // (wordExtractor=CNN) featDim × k × inDim, one layer
    cnnB: Array[Float],
    hidden2tag: Array[Array[Float]],               // (T+2) × featDim
    hidden2tagB: Array[Float],
    transitions: Array[Array[Float]]) {            // (T+2) × (T+2), from × to

  def numTags: Int = labelAlphabet.size          // includes pad slot 0
  def startTag: Int = numTags
  def stopTag: Int = numTags + 1
  def featDim: Int =
    if (config.wordExtractor == "CNN") cnnW.length else 2 * config.hidden

  /** Transposed transitions (to × from): the Viterbi inner max runs over
    * `from` — row-contiguous access instead of a column stride through T+2
    * separate row objects. Rebuilt lazily per executor after broadcast. */
  @transient lazy val transitionsT: Array[Array[Float]] = {
    val n = transitions.length
    Array.tabulate(n, n)((to, from) => transitions(from)(to))
  }
}

/** One LSTM direction's parameters: gates ordered [i, f, g, o]. */
final case class LstmCellWeights(
    wi: Array[Array[Float]], // 4H × inputDim
    wh: Array[Array[Float]], // 4H × H
    b: Array[Float])         // 4H

object NerModel {

  private def mat(r: Random, rows: Int, cols: Int, scale: Double): Array[Array[Float]] =
    Array.fill(rows)(Array.fill(cols)(((r.nextDouble() * 2 - 1) * scale).toFloat))

  private def uniformScale(dim: Int): Double = math.sqrt(3.0 / dim)

  private def lstmWeights(r: Random, inDim: Int, h: Int): LstmCellWeights =
    LstmCellWeights(
      mat(r, 4 * h, inDim, uniformScale(inDim)),
      mat(r, 4 * h, h, uniformScale(h)),
      Array.fill(4 * h)(0f))

  /** Deterministic random model (for math/determinism tests and throughput
    * benchmarks at realistic dims). */
  def synthesize(cfg: NerConfig, words: Seq[String], labels: Seq[String], seed: Long): NerModel = {
    val r = new Random(seed)
    val wa = Alphabet.fromStrings(words)
    val ca = Alphabet.fromStrings(words.flatMap(_.toSeq).map(_.toString).distinct)
    val la = Alphabet.fromStrings(labels, isLabel = true)
    val t2 = la.size + 2
    val wordRepDim = cfg.wordEmbDim + (cfg.charExtractor match {
      case "NONE" => 0
      case "LSTM" => 2 * cfg.charHidden
      case _      => cfg.charHidden
    })
    val lstm = Array.tabulate(cfg.lstmLayers) { l =>
      val in = if (l == 0) wordRepDim else 2 * cfg.hidden
      Array(lstmWeights(r, in, cfg.hidden), lstmWeights(r, in, cfg.hidden))
    }
    val featDim = cfg.hidden * 2
    val cnnW = Array.fill(featDim)(mat(r, 3, wordRepDim, uniformScale(wordRepDim)))
    NerModel(
      cfg, wa, ca, la,
      wordEmb = mat(r, wa.size, cfg.wordEmbDim, uniformScale(cfg.wordEmbDim)),
      charEmb = mat(r, ca.size, cfg.charEmbDim, uniformScale(cfg.charEmbDim)),
      charCnnW = Array.fill(cfg.charHidden)(mat(r, cfg.charKernel, cfg.charEmbDim, uniformScale(cfg.charEmbDim))),
      charCnnB = Array.fill(cfg.charHidden)(0f),
      charLstm =
        if (cfg.charExtractor == "LSTM")
          Some(Array(lstmWeights(r, cfg.charEmbDim, cfg.charHidden), lstmWeights(r, cfg.charEmbDim, cfg.charHidden)))
        else None,
      lstm = lstm,
      cnnW = cnnW,
      cnnB = Array.fill(featDim)(0f),
      hidden2tag = mat(r, t2, featDim, uniformScale(featDim)),
      hidden2tagB = Array.fill(t2)(0f),
      transitions = mat(r, t2, t2, 0.1))
  }

  /** BIOSE-validity transition constraints (hard −10000 walls, the reference's
    * convention — model/crf.py:39-46 masks illegal START/STOP moves; we extend
    * the same mechanism to BIOSE grammar so synthesized models emit only valid
    * sequences). transitions(from)(to). */
  def bioseTransitions(la: Alphabet): Array[Array[Float]] = {
    val t = la.size
    val tr = Array.fill(t + 2, t + 2)(0f)
    val NEG = -10000f
    // A token-multi label is a ^-joined atom sequence; for transition legality
    // its OUTGOING kind is the last atom's and its INCOMING kind the first's.
    def atomKind(atom: String): (String, String) = {
      if (atom == "O" || atom == "</pad>") ("O", "")
      else {
        val i = atom.indexOf('-')
        if (i < 0) (atom, "") else (atom.substring(0, 1), atom.substring(i + 1))
      }
    }
    def outKind(id: Int): (String, String) = atomKind(la.instance(id).split('^').last)
    def inKind(id: Int): (String, String) = atomKind(la.instance(id).split('^').head)
    val start = t; val stop = t + 1
    for (from <- 0 until t + 2; to <- 0 until t + 2) {
      val (fb, fc) = if (from == start) ("<S>", "") else if (from == stop) ("</S>", "") else outKind(from)
      val (tb, tc) = if (to == start) ("<S>", "") else if (to == stop) ("</S>", "") else inKind(to)
      val legal = (fb, tb) match {
        case (_, "<S>")            => false                   // nothing enters START
        case ("</S>", _)           => false                   // nothing leaves STOP
        case ("<S>", b)            => b == "O" || b == "B" || b == "S" || b == "</S>"
        case ("B", b)              => (b == "I" || b == "E") && fc == tc
        case ("I", b)              => (b == "I" || b == "E") && fc == tc
        case ("E" | "S" | "O", b)  => b == "O" || b == "B" || b == "S" || b == "</S>"
        case _                     => false
      }
      if (!legal) tr(from)(to) = NEG
    }
    tr
  }

  /** Oracle model: a real model whose weights are CONSTRUCTED so that the
    * emission of each known vocabulary word is (a scaled) one-hot of its gold
    * label, and unknown words emit O. wordExtractor=CNN with kernel 1 and an
    * identity kernel makes the word CNN an exact linear map, so the decode path
    * (batchify → wordrep → extractor → hidden2tag → CRF Viterbi) is the REAL
    * code path end-to-end while outputs are known a priori — this is how the
    * fixture pipeline gets meaningful, verifiable labels without shipping the
    * reference's (absent) trained blobs. */
  def synthesizeOracle(mode: String, wordToLabel: Map[String, String], labels: Seq[String]): NerModel = {
    val allLabels = ("O" +: labels).distinct
    val la = Alphabet.fromStrings(allLabels, isLabel = true)
    val words = wordToLabel.keys.toSeq.sorted
    val wa = Alphabet.fromStrings(words)
    val ca = Alphabet.fromStrings(words.flatMap(_.toSeq).map(_.toString).distinct)
    val t2 = la.size + 2
    val cfg = NerConfig(mode = mode, wordEmbDim = t2, charExtractor = "NONE",
      wordExtractor = "CNN", hidden = t2, lstmLayers = 0)
    val oId = la.get("O")
    // embedding row of word w = 10 * onehot(labelId(w)); pad/unk rows favor O
    val emb = Array.tabulate(wa.size) { id =>
      val row = Array.fill(t2)(0f)
      val lab =
        if (id >= 2) la.get(wordToLabel(wa.instance(id)))
        else oId
      row(lab) = 10f
      row
    }
    // CNN: featDim = t2, kernel 1, identity (layout featDim × k × inDim)
    val cnnW = Array.tabulate(t2)(o => Array(Array.tabulate(t2)(i => if (i == o) 1f else 0f)))
    val h2t = Array.tabulate(t2)(o => Array.tabulate(t2)(i => if (i == o) 1f else 0f))
    NerModel(cfg, wa, ca, la,
      wordEmb = emb,
      charEmb = Array.fill(ca.size)(Array.fill(1)(0f)),
      charCnnW = Array.empty, charCnnB = Array.empty, charLstm = None,
      lstm = Array.empty,
      cnnW = cnnW, cnnB = Array.fill(t2)(0f),
      hidden2tag = h2t, hidden2tagB = Array.fill(t2)(0f),
      transitions = bioseTransitions(la))
  }
}
