package graft.lattice

/** Spark-native dependency parser (SURVEY §2 A8/A11/C10 — verbosity-2 output).
  *
  * The reference shells out to YAP `dep` (api_main.py:127-131), a
  * transition-based dependency parser with a trained linear model, and zips
  * (id, head, deprel) onto morphemes (api_main.py:338-351). Re-expressed
  * in-engine: a greedy ARC-STANDARD transition parser (the same family of
  * machine as YAP's) over the MD morpheme sequence, scored by a deterministic
  * linear feature function with synthesized weights — the same
  * weight-synthesis trick as Disambig.edgeScore. O(n) per sentence, runs
  * in-row inside the annotate mapPartitions stage: no shuffle, scale-safe at
  * any sentence length (no O(n³) chart).
  *
  * Synthesized grammar (deterministic, documented):
  *  - function morphemes (IN/DT/CC/REL proclitics) attach as LEFT-ARC
  *    dependents of the next content morpheme (their host), deprel per POS
  *    (case/det/cc/mark);
  *  - content morphemes form a head-initial spine: each attaches to the
  *    previous content morpheme via RIGHT-ARC (deprel "dep");
  *  - the first content morpheme is the root (head 0, deprel "root");
  *  - trailing function morphemes with no following host attach to the last
  *    content morpheme.
  */
object DepParser {

  /** One dependency node — exactly the CoNLL fields the reference consumes
    * (bclm.read_conll cols: id, form, lemma, xpostag, feats, head, deprel). */
  final case class DepNode(id: Int, form: String, lemma: String, xpos: String,
                           feats: String, head: Int, deprel: String)

  private val functionPos = Set("IN", "DT", "CC", "REL")
  def isFunction(pos: String): Boolean = functionPos.contains(pos)

  def relOf(pos: String): String = pos match {
    case "IN"  => "case"
    case "DT"  => "det"
    case "CC"  => "cc"
    case "REL" => "mark"
    case _     => "dep"
  }

  /** Transition scores for stack top pair (s1, s0) — a linear model with
    * synthesized weights. Greedy argmax with a fixed tie-break order
    * (LEFT > RIGHT > SHIFT) makes the parse fully deterministic. */
  private[graft] def actionScores(s1Pos: String, s0Pos: String,
                                    s1IsRoot: Boolean, bufferNonEmpty: Boolean)
      : (Double, Double, Double) = {
    val left =
      if (s1IsRoot) Double.NegativeInfinity                 // sentinel can't be a dependent
      else if (isFunction(s1Pos) && !isFunction(s0Pos)) 4.0 // proclitic ← host
      else -1.0
    val right =
      if (bufferNonEmpty) 0.5 // defer: later morphemes may still attach lower
      else 2.0                // buffer drained → collapse the spine right-to-left
    val shift = if (bufferNonEmpty) 1.0 else Double.NegativeInfinity
    (left, right, shift)
  }

  /** Argmax over [[actionScores]] with the fixed LEFT > RIGHT > SHIFT
    * tie-break, allocation-free (the tupled scores boxed three Doubles per
    * transition on the annotate hot path). 0 = LEFT-ARC, 1 = RIGHT-ARC,
    * 2 = SHIFT. Pinned to actionScores by a DepParserSpec property. */
  private[graft] def actionCode(s1Pos: String, s0Pos: String,
                                  s1IsRoot: Boolean, bufferNonEmpty: Boolean): Int = {
    val left =
      if (s1IsRoot) Double.NegativeInfinity
      else if (isFunction(s1Pos) && !isFunction(s0Pos)) 4.0
      else -1.0
    val right = if (bufferNonEmpty) 0.5 else 2.0
    val shift = if (bufferNonEmpty) 1.0 else Double.NegativeInfinity
    if (left >= right && left >= shift) 0 else if (right >= shift) 1 else 2
  }

  /** The transition machine: fills 1-based head/rel arrays (index 0 = the
    * artificial root sentinel, unused on output). Int-array stack — the List
    * stack allocated a cons cell per shift, ~3% of the annotate kernel's
    * churn (JFR). After the run: head(k) == -1 ⇔ unattached (clamped to 0,
    * deprel "root" when rel is empty, by the callers). */
  /** Per-thread machine scratch: head/rel/stack arrays reused across
    * sentences (a fresh triple per sentence was ~2.5% of the annotate
    * kernel's churn). Returned arrays are valid until the NEXT parse on the
    * same thread; both public entry points either copy out ([[parse]]) or
    * are consumed immediately by the assembly loop ([[parseHeadsRels]]). */
  private final class Scratch {
    var head: Array[Int] = new Array[Int](0)
    var rel: Array[String] = new Array[String](0)
    var stack: Array[Int] = new Array[Int](0)
    def ensure(n: Int): Unit = {
      if (head.length < n + 2) {
        head = new Array[Int](2 * n + 4)
        rel = new Array[String](2 * n + 4)
        stack = new Array[Int](2 * n + 4)
      }
      var i = 0
      while (i <= n) { head(i) = -1; rel(i) = ""; i += 1 }
    }
  }
  private val scratch: ThreadLocal[Scratch] = ThreadLocal.withInitial(() => new Scratch)

  private def runMachine(xpos: IndexedSeq[String], n: Int): (Array[Int], Array[String]) = {
    val s0s = scratch.get()
    s0s.ensure(n)
    val head = s0s.head
    val rel = s0s.rel
    val stack = s0s.stack
    var sp = 0 // stack(0) = 0 = artificial root sentinel
    var buffer = 1
    def pos(i: Int) = if (i == 0) "ROOT" else xpos(i - 1)
    while (buffer <= n || sp > 0) {
      if (sp < 1) {
        sp += 1; stack(sp) = buffer; buffer += 1
      } else {
        val s0 = stack(sp); val s1 = stack(sp - 1)
        actionCode(pos(s1), pos(s0), s1 == 0, buffer <= n) match {
          case 0 =>                     // LEFT-ARC: s0 heads s1
            head(s1) = s0; rel(s1) = relOf(pos(s1))
            stack(sp - 1) = s0; sp -= 1
          case 1 =>                     // RIGHT-ARC: s1 heads s0
            head(s0) = s1
            rel(s0) = if (s1 == 0) "root"
                      else if (isFunction(pos(s0))) relOf(pos(s0))
                      else "dep"
            sp -= 1
          case _ =>                     // SHIFT
            sp += 1; stack(sp) = buffer; buffer += 1
        }
      }
    }
    (head, rel)
  }

  /** Heads + deprels only, 1-based arrays (entry k = morpheme k) — the
    * annotate assembly consumes just (head, deprel); building full DepNodes
    * with copied form/lemma/xpos strings was ~6% of the kernel's allocation
    * churn. Same machine, same output fields as [[parse]]. */
  def parseHeadsRels(xpos: IndexedSeq[String]): (Array[Int], Array[String]) = {
    val n = xpos.length
    val (head, rel) = if (n == 0) (new Array[Int](1), Array("")) else runMachine(xpos, n)
    var k = 1
    while (k <= n) {
      if (head(k) <= 0 && rel(k).isEmpty) rel(k) = "root"
      if (head(k) < 0) head(k) = 0
      k += 1
    }
    (head, rel)
  }

  /** Parse a sentence given parallel (form, lemma, xpos, feats) morpheme
    * attributes. Returns one DepNode per morpheme, ids 1-based, head 0 = root.
    * `feats = null` means "all underscore" (saves the caller an allocation on
    * the hot path). */
  def parse(forms: IndexedSeq[String], lemmas: IndexedSeq[String],
            xpos: IndexedSeq[String], feats: IndexedSeq[String]): IndexedSeq[DepNode] = {
    val n = forms.length
    if (n == 0) return IndexedSeq.empty
    val (head, rel) = parseHeadsRels(xpos)
    val out = new Array[DepNode](n)
    var k = 1
    while (k <= n) {
      out(k - 1) = DepNode(k, forms(k - 1), lemmas(k - 1), xpos(k - 1),
        if (feats == null) "_" else feats(k - 1), head(k), rel(k))
      k += 1
    }
    scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
  }

  /** Convenience: parse an MD lattice path (one edge per morpheme). */
  def parseMd(md: IndexedSeq[graft.schema.LatticeEdge]): IndexedSeq[DepNode] =
    parse(md.map(_.form), md.map(_.lemma), md.map(_.upos), md.map(_.feats))

  /** C10 (api_main.py:338-351): zip (head, deprel) onto parallel morpheme
    * attributes, positionally. */
  def addDepInfo[T](morphs: IndexedSeq[T], deps: IndexedSeq[DepNode]): IndexedSeq[(T, Int, String)] =
    morphs.zip(deps).map { case (m, d) => (m, d.head, d.deprel) }
}
