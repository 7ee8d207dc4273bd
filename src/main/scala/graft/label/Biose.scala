package graft.label

import scala.collection.mutable.ArrayBuffer

/** BIOSE/IOBES label algebra — pure functions, no Spark dependency.
  *
  * Port of the reference's label-manipulation semantics (all P/R-affecting logic
  * lives here):
  *  - fixMultiBiose    — reference ne_evaluate_mentions.py:5-24 (fix_multi_biose)
  *  - validateBiose /
  *    fixedBioSequence — reference nemo.py:154-214
  *  - parseSpans       — reference api_main.py:380-419 via iobes.parse_spans_iobes
  *  - mention scan     — reference ne_evaluate_mentions.py:84-113 (sent_to_mentions_dict)
  *  - tag-scheme conv  — reference utils/tagSchemeConverter.py:16-112
  *
  * A label is `O` or `X-CAT` with X ∈ {B,I,E,S}. token-multi labels are `^`-joined
  * atoms, one per morpheme (reference README.md:74).
  */
object Biose {

  final case class SpanT(label: String, start: Int, end: Int) // end exclusive

  /** Split a BIOSE atom into (bio, cat). "O" → ("O", ""). */
  @inline def splitAtom(tag: String): (String, String) = {
    val i = tag.indexOf('-')
    if (i < 0) (tag, "") else (tag.substring(0, i), tag.substring(i + 1))
  }

  /** Collapse a `^`-joined multi-label to a single token-level BIOSE.
    * Category = first '-'-segment truncated to 3 chars; BIOSE priority
    * S > (B∧E → S) > E > B > I > O.
    * Exact port of reference ne_evaluate_mentions.py:5-24: the category comes
    * from `tag.split('-')[1][:3]` on the WHOLE multi string, so for
    * "O-ORG^B-ORG" it is the first cat in the string, and chars after the cat
    * (e.g. "^B" spillover) are truncated by the [:3].
    */
  /** Memo for [[fixMultiBiose]]: pure String→String over the (small) label
    * space — multi labels repeat per token across the whole corpus. Capped so
    * an adversarial label stream cannot grow the heap. */
  private val fixMultiMemo =
    new java.util.concurrent.ConcurrentHashMap[String, String](1 << 10)

  def fixMultiBiose(tag: String): String = {
    val hit = fixMultiMemo.get(tag)
    if (hit != null) return hit
    val res = fixMultiBioseCompute(tag)
    if (fixMultiMemo.size < (1 << 16)) fixMultiMemo.put(tag, res)
    res
  }

  private def fixMultiBioseCompute(tag: String): String = {
    // allocation-free scan of each ^-segment's first char (split + char-array
    // map boxed every char through the generic array path — hot in annotate)
    var hasS = false; var hasB = false; var hasE = false; var hasI = false
    var i = 0
    var segStart = true
    while (i < tag.length) {
      val c = tag.charAt(i)
      if (segStart && c != '^') {
        c match {
          case 'S' => hasS = true
          case 'B' => hasB = true
          case 'E' => hasE = true
          case 'I' => hasI = true
          case _   => ()
        }
        segStart = false
      }
      if (c == '^') segStart = true
      i += 1
    }
    val cat = {
      // Python semantics: tag.split('-')[1][:3] — the segment between the
      // first and second '-', truncated to 3 chars; a trailing-dash tag
      // (e.g. "B-") degrades to an empty category like the reference,
      // instead of throwing.
      val d = tag.indexOf('-')
      if (d < 0) ""
      else {
        val next = tag.indexOf('-', d + 1)
        val end = math.min(d + 1 + 3, if (next < 0) tag.length else next)
        "-" + tag.substring(d + 1, math.max(d + 1, end))
      }
    }
    val bio =
      if (hasS) "S"
      else if (hasB && hasE) "S"
      else if (hasE) "E"
      else if (hasB) "B"
      else if (hasI) "I"
      else "O"
    bio + cat
  }

  // ---- nemo.py:154-214 — fixing a per-token morpheme BIOSE sequence ----

  // Shape predicates over the BIO letter string. These are the five regex
  // languages of the reference (nemo.py:147-151: ^O*BI*$ | ^O*BI*EO*$ | ^I+$
  // | ^I*EO*$ | ^O*SO*$) as allocation-free char scans — regex Matchers per
  // label sequence were ~7% of the annotate kernel's allocation churn (JFR),
  // and these languages are trivially deterministic. Property-tested against
  // the original regexes in BioseSpec.
  private def allOf(s: String, c: Char): Boolean = {
    if (s.isEmpty) return false
    var i = 0
    while (i < s.length) { if (s.charAt(i) != c) return false; i += 1 }
    true
  }
  private def skip(s: String, from: Int, c: Char): Int = {
    var i = from
    while (i < s.length && s.charAt(i) == c) i += 1
    i
  }
  /** ^O*BI*$ */
  private def isOBI(s: String): Boolean = {
    val b = skip(s, 0, 'O')
    b < s.length && s.charAt(b) == 'B' && skip(s, b + 1, 'I') == s.length
  }
  /** ^O*BI*EO*$ */
  private def isOBIEO(s: String): Boolean = {
    val b = skip(s, 0, 'O')
    if (b >= s.length || s.charAt(b) != 'B') return false
    val e = skip(s, b + 1, 'I')
    e < s.length && s.charAt(e) == 'E' && skip(s, e + 1, 'O') == s.length
  }
  /** ^I*EO*$ */
  private def isIEO(s: String): Boolean = {
    val e = skip(s, 0, 'I')
    e < s.length && s.charAt(e) == 'E' && skip(s, e + 1, 'O') == s.length
  }
  /** ^O*SO*$ */
  private def isOSO(s: String): Boolean = {
    val p = skip(s, 0, 'O')
    p < s.length && s.charAt(p) == 'S' && skip(s, p + 1, 'O') == s.length
  }
  private def isValidBio(s: String): Boolean =
    isOBI(s) || isOBIEO(s) || allOf(s, 'I') || isIEO(s) || isOSO(s)

  /** reference nemo.py:154-170 (get_fixed_for_valid_biose). The input must match
    * validBioRe; throws IllegalArgumentException otherwise (reference raises
    * ValueError). */
  def fixedForValidBiose(bioSeq: String): String = {
    if (allOf(bioSeq, 'O')) "O"
    else if (isOSO(bioSeq) || isOBIEO(bioSeq)) "S"
    else if (isOBI(bioSeq)) "B"
    else if (allOf(bioSeq, 'I')) "I"
    else if (isIEO(bioSeq)) "E"
    else throw new IllegalArgumentException(s"invalid valid-BIOSE sequence: $bioSeq")
  }

  /** reference nemo.py:173-184 (get_fixed_for_invalid_biose). */
  def fixedForInvalidBiose(bioSeq: String): String = {
    if (bioSeq.contains('S')) "S"
    else if (bioSeq.contains('B') && bioSeq.contains('E')) "S"
    else if (bioSeq.contains('E')) "E"
    else if (bioSeq.contains('B')) "B"
    else if (bioSeq.contains('I')) "I"
    else "O"
  }

  /** reference nemo.py:188-209 (validate_biose_sequence).
    * Input: full BIOSE atoms (e.g. Seq("O","B-PER","E-PER")).
    * Returns (isValidBio, isSingleCategory, fixedLabel). */
  def validateBioseSequence(fullBioSeq: Seq[String]): (Boolean, Boolean, String) = {
    // imperative single pass (was: 3 mapped Seqs + mkString per call — this
    // runs once per token per doc in annotate)
    val sb = new java.lang.StringBuilder(fullBioSeq.length)
    var firstCat: String = null
    var singleCat = true
    val it = fullBioSeq.iterator
    while (it.hasNext) {
      val b = it.next()
      if (b == "O") sb.append('O')
      else {
        // splitAtom semantics: a dash-less atom has category "" (recorded,
        // not skipped — it participates in the single-category check)
        val d = b.indexOf('-')
        val cat = if (d < 0) { sb.append(b); "" }
                  else { sb.append(b, 0, d); b.substring(d + 1) }
        if (firstCat == null) firstCat = cat
        else if (singleCat && firstCat != cat) singleCat = false
      }
    }
    val bioSeq = sb.toString
    val valid = isValidBio(bioSeq)
    val fixed0 = if (valid) fixedForValidBiose(bioSeq) else fixedForInvalidBiose(bioSeq)
    val fixed = if (fixed0 != "O") fixed0 + "-" + firstCat else fixed0
    (valid, singleCat, fixed)
  }

  /** Memos for [[fixedBioSequence]] — a pure function over a tiny label
    * space called once per token in the annotate assembly (~14% of the
    * kernel's allocation churn as StringBuilder + tuple + byte[] per call —
    * JFR). Single-atom sequences (most tokens have one morpheme) key on the
    * atom itself: zero allocation on a hit; longer sequences pay one joined
    * key (≪ the computation it replaces). Capped like the other label memos
    * so an adversarial stream cannot grow the heap. */
  private val fixedSeq1 = new java.util.concurrent.ConcurrentHashMap[String, String](1 << 10)
  private val fixedSeqN = new java.util.concurrent.ConcurrentHashMap[String, String](1 << 10)

  /** reference nemo.py:212-214 (get_fixed_bio_sequence). */
  /** [[fixedBioSequence]] of a single atom — the most common shape (one
    * morpheme per token); zero allocation on a memo hit. */
  def fixedBioSequence1(a: String): String = {
    val hit = fixedSeq1.get(a)
    if (hit != null) hit
    else {
      val r = validateBioseSequence(a :: Nil)._3
      if (fixedSeq1.size < (1 << 16)) fixedSeq1.put(a, r)
      r
    }
  }

  def fixedBioSequence(fullBioSeq: Seq[String]): String =
    if (fullBioSeq.length == 1) fixedBioSequence1(fullBioSeq.head)
    else {
      val key = fullBioSeq.mkString("\u0001") // unambiguous join (atoms never contain U+0001)
      val hit = fixedSeqN.get(key)
      if (hit != null) hit
      else {
        val r = validateBioseSequence(fullBioSeq)._3
        if (fixedSeqN.size < (1 << 16)) fixedSeqN.put(key, r)
        r
      }
    }

  // ---- span extraction (E1/E6) ----

  /** Extract entity spans from a BIOSE sequence, positional semantics of
    * iobes span parsing as used by the reference API (api_main.py:380-419):
    * S-X emits [i,i+1); B-X opens; I-X extends an open span; E-X extends and
    * closes; O (or a fresh B/S) drops any open unclosed span.
    * Mirrors the mention-scan semantics of ne_evaluate_mentions.py:84-113
    * (an open span is only emitted when an E arrives; dangling B/I are dropped).
    */
  def parseSpans(labels: IndexedSeq[String]): IndexedSeq[SpanT] = {
    val out = new ArrayBuffer[SpanT]()
    var curStart = -1
    var curCat: String = null
    var i = 0
    while (i < labels.length) {
      val (bio, cat) = splitAtom(labels(i))
      bio match {
        case "S" =>
          out += SpanT(cat, i, i + 1); curStart = -1; curCat = null
        case "B" =>
          curStart = i; curCat = cat
        case "I" =>
          () // extends if open; no-op otherwise (start index already recorded)
        case "E" =>
          if (curStart >= 0) { out += SpanT(curCat, curStart, i + 1); curStart = -1; curCat = null }
        case _ =>
          curStart = -1; curCat = null
      }
      i += 1
    }
    out.toIndexedSeq
  }

  /** Mention multiset scan — exact port of sent_to_mentions_dict
    * (ne_evaluate_mentions.py:84-113). Differences vs parseSpans that matter for
    * evaluation fidelity: surfaces are joined with `joinChar` (default "" like the
    * reference CLI), category only (no positions), and an `I` after `B` APPENDS the
    * token to the current surface (parseSpans only tracks indices — same result).
    * Returns mentions in emission order: (surface, category).
    */
  def mentionScan(
      toks: IndexedSeq[String],
      labels: IndexedSeq[String],
      joinChar: String = "",
      ignoreCat: Boolean = false): IndexedSeq[(String, String)] = {
    val out = new ArrayBuffer[(String, String)]()
    var cur: ArrayBuffer[String] = null
    var curCat: String = null
    var i = 0
    while (i < labels.length && i < toks.length) {
      val (bio, cat0) = splitAtom(labels(i))
      // reference get_sents_fixed: missing category → '_'
      val cat = if (ignoreCat) "NAN" else if (cat0.isEmpty) "_" else cat0
      bio match {
        case "S" => out += ((toks(i), cat)); cur = null; curCat = null
        case "B" => cur = ArrayBuffer(toks(i)); curCat = cat
        case "I" => if (cur != null) cur += toks(i)
        case "E" =>
          if (cur != null) {
            cur += toks(i)
            out += ((cur.mkString(joinChar), curCat)); cur = null; curCat = null
          }
        case _ => cur = null; curCat = null
      }
      i += 1
    }
    out.toIndexedSeq
  }

  // ---- tag scheme converters (reference utils/tagSchemeConverter.py) ----

  /** BIO → BIOES: B with no following I → S; I with no following I → E. */
  def bioToBioes(labels: Seq[String]): Seq[String] = {
    val n = labels.length
    labels.zipWithIndex.map { case (l, i) =>
      val (bio, cat) = splitAtom(l)
      // reference fidelity (tagSchemeConverter.py:32,37): continuation is
      // decided ONLY by the next label carrying "I-" — the category is NOT
      // compared, so noisy input like (B-PER, I-ORG) converts to
      // (B-PER, E-ORG), exactly as BIO2BIOES does
      def nextIsI: Boolean =
        i + 1 < n && splitAtom(labels(i + 1))._1 == "I"
      bio match {
        case "B" => (if (nextIsI) "B-" else "S-") + cat
        case "I" => (if (nextIsI) "I-" else "E-") + cat
        case _   => l
      }
    }
  }

  /** BIOES → BIO: S → B; E → I. */
  def bioesToBio(labels: Seq[String]): Seq[String] =
    labels.map { l =>
      val (bio, cat) = splitAtom(l)
      bio match {
        case "S" => "B-" + cat
        case "E" => "I-" + cat
        case _   => l
      }
    }

  /** IOB → BIO: an I that begins a run (sentence start, after O, or after a
    * different category) becomes B. */
  def iobToBio(labels: Seq[String]): Seq[String] = {
    var prevBio = "O"; var prevCat = ""
    labels.map { l =>
      val (bio, cat) = splitAtom(l)
      val out =
        if (bio == "I" && !((prevBio == "B" || prevBio == "I") && prevCat == cat)) "B-" + cat
        else l
      prevBio = bio; prevCat = cat
      out
    }
  }
}
