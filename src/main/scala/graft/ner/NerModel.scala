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

  /** Per-executor word-representation memo (token → wordRep output). A word's
    * rep (embedding ⧺ char CNN/LSTM) depends only on the token string, never
    * on context, and corpora are Zipf-distributed — so virtually every scored
    * token after warmup is a cache hit that skips the whole char extractor.
    * This is the single biggest lever on annotate throughput AND on its
    * 32-thread scaling (the char extractor dominated the kernel's 165 KB/doc
    * allocation churn — tools/AllocProbe). Entries are written once and never
    * mutated (Scorer.features only reads reps into dot products; Backprop has
    * its own forward pass). Bounded: past `RepCacheCap` distinct tokens new
    * misses just recompute, so a pathological vocab can't grow the heap.
    * @transient — rebuilt empty on each executor after broadcast. */
  @transient lazy val repCache: java.util.concurrent.ConcurrentHashMap[String, Array[Float]] =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Float]](1 << 12)
}

/** One LSTM direction's parameters: gates ordered [i, f, g, o]. */
final case class LstmCellWeights(
    wi: Array[Array[Float]], // 4H × inputDim
    wh: Array[Array[Float]], // 4H × H
    b: Array[Float])         // 4H

object NerModel {

  // ---------- portable weight format (save/load) ----------
  //
  // The reference persists trained weights as torch pickles + a pickled Data
  // object (utils/data.py:342-351 load, 353-358 save; api_main.py:53-70 loads
  // a `.model`/`.dset` pair per registry entry). Those blobs are
  // python-ecosystem-bound (and absent from the snapshot), so exact interop
  // is impossible by construction; this is the documented portable
  // equivalent: ONE versioned little-endian binary file carrying config +
  // alphabets + every weight tensor, so real trained weights can be exported
  // into the engine without recompiling. Layout (all ints/floats LE):
  //   magic "GNERW" · version:int · config block · 3 alphabet blocks ·
  //   tensors in declaration order (each jagged array length-prefixed).
  // Gzip-wrapped: embedding tables dominate and compress ~2×.

  private val Magic = "GNERW"
  private val Version = 1

  def save(m: NerModel, path: String): Unit = {
    val fos = new java.io.FileOutputStream(path)
    val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
      new java.util.zip.GZIPOutputStream(fos), 1 << 16))
    try {
      out.writeBytes(Magic); out.writeInt(Version)
      val c = m.config
      out.writeUTF(c.mode); out.writeInt(c.wordEmbDim); out.writeInt(c.charEmbDim)
      out.writeInt(c.charHidden); out.writeInt(c.charKernel); out.writeInt(c.hidden)
      out.writeInt(c.lstmLayers); out.writeUTF(c.wordExtractor); out.writeUTF(c.charExtractor)
      out.writeInt(c.maxSentenceLength); out.writeInt(c.batchSize)
      out.writeBoolean(c.numberNormalized)
      def alpha(a: Alphabet): Unit = {
        out.writeBoolean(a.isLabel); out.writeInt(a.instances.length)
        a.instances.foreach(out.writeUTF)
      }
      alpha(m.wordAlphabet); alpha(m.charAlphabet); alpha(m.labelAlphabet)
      def v(a: Array[Float]): Unit = { out.writeInt(a.length); a.foreach(out.writeFloat) }
      def m2(a: Array[Array[Float]]): Unit = { out.writeInt(a.length); a.foreach(v) }
      def m3(a: Array[Array[Array[Float]]]): Unit = { out.writeInt(a.length); a.foreach(m2) }
      def cell(w: LstmCellWeights): Unit = { m2(w.wi); m2(w.wh); v(w.b) }
      m2(m.wordEmb); m2(m.charEmb); m3(m.charCnnW); v(m.charCnnB)
      out.writeBoolean(m.charLstm.isDefined)
      m.charLstm.foreach { ws => cell(ws(0)); cell(ws(1)) }
      out.writeInt(m.lstm.length)
      m.lstm.foreach { layer => cell(layer(0)); cell(layer(1)) }
      m3(m.cnnW); v(m.cnnB); m2(m.hidden2tag); v(m.hidden2tagB); m2(m.transitions)
    } finally out.close()
  }

  def load(path: String): NerModel = {
    val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
      new java.util.zip.GZIPInputStream(new java.io.FileInputStream(path)), 1 << 16))
    try {
      val magic = new Array[Byte](Magic.length)
      in.readFully(magic)
      require(new String(magic, "US-ASCII") == Magic,
        s"$path is not a $Magic weight file")
      val ver = in.readInt()
      require(ver == Version, s"unsupported $Magic version $ver (expected $Version)")
      val cfg = NerConfig(
        mode = in.readUTF(), wordEmbDim = in.readInt(), charEmbDim = in.readInt(),
        charHidden = in.readInt(), charKernel = in.readInt(), hidden = in.readInt(),
        lstmLayers = in.readInt(), wordExtractor = in.readUTF(), charExtractor = in.readUTF(),
        maxSentenceLength = in.readInt(), batchSize = in.readInt(),
        numberNormalized = in.readBoolean())
      def alpha(): Alphabet = {
        val isLabel = in.readBoolean()
        val n = in.readInt()
        Alphabet(IndexedSeq.fill(n)(in.readUTF()), isLabel)
      }
      val wa = alpha(); val ca = alpha(); val la = alpha()
      def v(): Array[Float] = Array.fill(in.readInt())(in.readFloat())
      def m2(): Array[Array[Float]] = Array.fill(in.readInt())(v())
      def m3(): Array[Array[Array[Float]]] = Array.fill(in.readInt())(m2())
      def cell(): LstmCellWeights = LstmCellWeights(m2(), m2(), v())
      val wordEmb = m2(); val charEmb = m2(); val charCnnW = m3(); val charCnnB = v()
      val charLstm = if (in.readBoolean()) Some(Array(cell(), cell())) else None
      val lstm = Array.fill(in.readInt())(Array(cell(), cell()))
      val cnnW = m3(); val cnnB = v(); val h2t = m2(); val h2tB = v(); val tr = m2()
      NerModel(cfg, wa, ca, la, wordEmb, charEmb, charCnnW, charCnnB, charLstm,
        lstm, cnnW, cnnB, h2t, h2tB, tr)
    } finally in.close()
  }

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
