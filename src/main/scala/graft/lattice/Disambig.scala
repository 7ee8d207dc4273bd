package graft.lattice

import graft.schema.LatticeEdge
import scala.collection.mutable.{ArrayBuffer, HashMap}

/** Morphological disambiguation (MD) — pick one path per token through the
  * (pruned) lattice (SURVEY §2 D4).
  *
  * The reference shells out to YAP `joint`/`md` (nemo.py:238-244,
  * api_main.py:114-124), a transition-based max-score decoder. Re-expressed
  * Spark-native: a per-token Viterbi (max-sum DP) over the lattice DAG with a
  * deterministic edge-scoring function. Scores are a linear model over simple
  * features (morpheme length, lexicon membership, clitic priors) with weights
  * synthesized deterministically — the engine's analog of YAP's trained model.
  *
  * Runs entirely in-row (per-token DAGs are tiny); the Spark stage that calls it
  * is a narrow map, no shuffle.
  */
object Disambig {

  /** Deterministic edge score. Favors segmented readings whose remainder is a
    * known lexicon word; mild length prior mimics YAP's preference for fewer,
    * longer morphemes when no evidence supports a split. */
  def edgeScore(e: LatticeEdge, lexicon: String => Boolean): Double = {
    var s = 0.0
    if (lexicon(e.form)) s += 2.0
    s += 0.1 * e.form.length
    if (e.upos == "DT" || e.upos == "CC" || e.upos == "IN" || e.upos == "REL") s += 0.5
    s
  }

  /** Max-score path through one token's sub-DAG (edges in input order; shared
    * endpoints as produced by Analyzer). Deterministic tie-break: the earlier
    * edge in input order wins. */
  def bestPath(tokenEdges: IndexedSeq[LatticeEdge],
               lexicon: String => Boolean): IndexedSeq[LatticeEdge] = {
    if (tokenEdges.isEmpty) return IndexedSeq.empty
    if (tokenEdges.length == 1) return tokenEdges // unambiguous fast path
    val start = tokenEdges.head.id1
    val end = tokenEdges.last.id2
    // topological DP over node ids (ids are increasing along every path)
    val best = new HashMap[Int, (Double, List[LatticeEdge])]()
    best(start) = (0.0, Nil)
    // process edges in (id1, input order): ids increase along paths, so a simple
    // sort by id1 is a topological order of edge sources
    val sorted = tokenEdges.sortBy(_.id1) // stable — preserves input order per id1
    for (e <- sorted) {
      best.get(e.id1).foreach { case (s, path) =>
        val ns = s + edgeScore(e, lexicon)
        val cur = best.get(e.id2)
        if (cur.isEmpty || ns > cur.get._1) best(e.id2) = (ns, e :: path)
      }
    }
    best.get(end).map(_._2.reverse.toIndexedSeq).getOrElse(IndexedSeq(tokenEdges.head))
  }

  /** Disambiguate a whole sentence lattice → linear MD lattice (one path per
    * token, reference "MD lattice" shape, §1.1 #7). */
  def disambiguate(edges: IndexedSeq[LatticeEdge],
                   lexicon: String => Boolean): IndexedSeq[LatticeEdge] = {
    if (edges.isEmpty) return IndexedSeq.empty
    val out = new ArrayBuffer[LatticeEdge]()
    // group by tokenId preserving order
    var i = 0
    while (i < edges.length) {
      val tid = edges(i).tokenId
      var j = i
      while (j < edges.length && edges(j).tokenId == tid) j += 1
      out ++= bestPath(edges.slice(i, j), lexicon)
      i = j
    }
    out.toIndexedSeq
  }
}
