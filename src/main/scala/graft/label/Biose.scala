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
  def fixMultiBiose(tag: String): String = {
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

  private val validBioRe = "^O*BI*$|^O*BI*EO*$|^I+$|^I*EO*$|^O*SO*$".r
  private val oRe = "^O+$".r
  private val sRe = "^O*SO*$|^O*BI*EO*$".r
  private val bRe = "^O*BI*$".r
  private val iRe = "^I+$".r
  private val eRe = "^I*EO*$".r

  /** reference nemo.py:154-170 (get_fixed_for_valid_biose). The input must match
    * validBioRe; throws IllegalArgumentException otherwise (reference raises
    * ValueError). */
  def fixedForValidBiose(bioSeq: String): String = {
    if (oRe.findFirstIn(bioSeq).isDefined) "O"
    else if (sRe.findFirstIn(bioSeq).isDefined) "S"
    else if (bRe.findFirstIn(bioSeq).isDefined) "B"
    else if (iRe.findFirstIn(bioSeq).isDefined) "I"
    else if (eRe.findFirstIn(bioSeq).isDefined) "E"
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
    val pairs = fullBioSeq.map { b =>
      if (b == "O") ("O", null) else { val (x, c) = splitAtom(b); (x, c) }
    }
    val bioSeq = pairs.map(_._1).mkString
    val typeSeq = pairs.map(_._2).filter(_ != null)
    val valid = validBioRe.findFirstIn(bioSeq).isDefined
    val fixed0 = if (valid) fixedForValidBiose(bioSeq) else fixedForInvalidBiose(bioSeq)
    val fixed = if (fixed0 != "O") fixed0 + "-" + typeSeq.head else fixed0
    (valid, typeSeq.distinct.size <= 1, fixed)
  }

  /** reference nemo.py:212-214 (get_fixed_bio_sequence). */
  def fixedBioSequence(fullBioSeq: Seq[String]): String = validateBioseSequence(fullBioSeq)._3

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
