package graft.lattice

import graft.schema.LatticeEdge
import scala.collection.mutable.ArrayBuffer

/** Morphological-ambiguity lattice generation (SURVEY §2 D1).
  *
  * The reference shells out to YAP's `hebma` (nemo.py:229-235) — an external Go
  * process. Per the north rule this is replaced by a Spark-native deterministic
  * analyzer: for each surface token we enumerate clitic-prefix segmentations
  * (Hebrew proclitics ב/ל/כ/ה/ו/ש/מ and common stacks like וב, וש, מה, שה, כש)
  * and emit a per-token DAG of `LatticeEdge`s in the reference's lattice schema
  * (ID1 ID2 form lemma upostag xpostag feats token_id — nemo.py:100-105).
  *
  * Node ids are strictly increasing within a sentence; each token's sub-lattice
  * spans [startNode, endNode] and all analyses share those endpoints, matching
  * the shape `get_valid_edges` consumes (nemo.py:78-97: min = first ID1, max =
  * last ID2 of the token's edge group).
  */
object Analyzer {

  /** Single-letter proclitics, longest-match stacks listed explicitly. */
  val cliticStacks: Seq[String] =
    Seq("וכש", "וב", "ול", "וכ", "וה", "וש", "ומ", "כש", "מה", "שה", "בה", "לה", "ב", "ל", "כ", "ה", "ו", "ש", "מ")

  private val prefixPos = Map(
    'ב' -> "IN", 'ל' -> "IN", 'כ' -> "IN", 'מ' -> "IN",
    'ה' -> "DT", 'ו' -> "CC", 'ש' -> "REL")

  /** All segmentations of one token: list of morpheme sequences.
    * Always includes the unsegmented reading. A clitic stack is split into its
    * single-letter morphemes (e.g. "וב" → ו + ב), like YAP's hebma output.
    * `lexicon` (optional): when non-empty, a remainder must be in it for the
    * split reading to be emitted — keeps lattices small on real text. */
  def segmentations(token: String, lexicon: String => Boolean = _ => true): Seq[Seq[String]] = {
    val out = new ArrayBuffer[Seq[String]]()
    out += Seq(token)
    for (stack <- cliticStacks) {
      if (token.length > stack.length && token.startsWith(stack)) {
        val rest = token.substring(stack.length)
        if (lexicon(rest))
          out += (stack.map(_.toString) :+ rest)
      }
    }
    out.toSeq.distinct
  }

  private def posOf(m: String, isLast: Boolean): String =
    if (!isLast && m.length == 1) prefixPos.getOrElse(m.charAt(0), "IN") else "NN"

  /** Build the MA lattice of one sentence. Each token contributes a sub-DAG
    * between consecutive shared nodes; analyses of k and j morphemes branch via
    * fresh interior nodes so every edge set forms simple paths start→end. */
  def sentenceLattice(tokens: IndexedSeq[String],
                      lexicon: String => Boolean = _ => true): Array[LatticeEdge] = {
    val edges = new ArrayBuffer[LatticeEdge]()
    var tokStart = 0
    var t = 0
    while (t < tokens.length) {
      val segs = segmentations(tokens(t), lexicon)
      // end node id must be > every interior id of every analysis
      val interiorBudget = segs.map(s => math.max(0, s.length - 1)).sum
      val tokEnd = tokStart + interiorBudget + 1
      var interiorNext = tokStart + 1
      for (seg <- segs) {
        var prev = tokStart
        for ((m, i) <- seg.zipWithIndex) {
          val isLast = i == seg.length - 1
          val nxt = if (isLast) tokEnd else { val x = interiorNext; interiorNext += 1; x }
          edges += LatticeEdge(prev, nxt, m, m, posOf(m, isLast), posOf(m, isLast), "_", t + 1)
          prev = nxt
        }
      }
      tokStart = tokEnd
      t += 1
    }
    edges.toArray
  }

  /** Load a wide-coverage lexicon from a table into the lexicon hook —
    * the pluggable answer to the YAP-hebma coverage gap (SURVEY §7.5: the
    * analyzer's RULES are complete; breadth is a data problem). The
    * returned predicate is a plain serializable closure; to ship it once
    * per executor inside the annotate `mapPartitions` broadcast like the
    * NER weights, plug it into `Pipeline.Models.lexiconExt` (the annotate
    * path ORs it with the exact core set via `Models.lexPredicate`) — used
    * standalone it is captured per-task in the closure instead.
    *
    * Exact variant: collects the DISTINCT surface forms to a driver-side
    * Set — a real lexicon is 10⁵–10⁶ forms (metadata-scale; the collect is
    * lexicon-sized, never corpus-sized). */
  def lexiconFromTable(df: org.apache.spark.sql.DataFrame,
                       column: String): String => Boolean = {
    val forms = df.select(org.apache.spark.sql.functions.col(column).cast("string"))
      .na.drop().distinct()
      .collect().map(_.getString(0)).toSet
    forms
  }

  /** Bloom variant for lexicons too large to hold exactly (10⁷+ forms):
    * constant memory per executor at a chosen false-positive rate. The FP
    * direction is SAFE here by construction — a false positive only ADMITS
    * an extra split reading into the lattice, which the downstream MD
    * Viterbi can still reject; a member form is never dropped (no false
    * negatives), so coverage is exact and over-generation is bounded by
    * `fpp`. */
  def lexiconBloom(df: org.apache.spark.sql.DataFrame, column: String,
                   expectedForms: Long, fpp: Double = 0.001): String => Boolean = {
    val bf = df.select(org.apache.spark.sql.functions.col(column).cast("string"))
      .na.drop()
      .stat.bloomFilter(column, expectedForms, fpp)
    (s: String) => bf.mightContain(s)
  }
}
