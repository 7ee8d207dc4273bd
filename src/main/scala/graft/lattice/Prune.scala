package graft.lattice

import graft.schema.LatticeEdge
import scala.collection.mutable.{ArrayBuffer, HashSet, HashMap}

/** Hybrid lattice pruning (SURVEY §2 D2/D3) — the NEMO paper's headline idea:
  * token-multi NER output prunes the MD search space.
  *
  * Exact port of reference nemo.py:78-114 (get_valid_edges / prune_lattices):
  * per (sentence, token) edge group,
  *   - min node = ID1 of the FIRST edge, max node = ID2 of the LAST edge
  *     (input order, as in the pandas groupby);
  *   - biose_count = number of `^`-atoms in the token's multi label;
  *   - if `non_o_only` and the label has no category ('-' absent) keep all
  *     simple paths; else keep simple paths with exactly biose_count+1 nodes
  *     (search cutoff biose_count+1);
  *   - if nothing qualifies and `keepAllIfNoValid`, keep all simple paths.
  * Both reference call sites use non_o_only=False (nemo.py:111, api_main.py:211).
  *
  * Each per-token DAG has ≤ ~10 nodes, so this is an in-row DFS — never a
  * distributed graph.
  */
object Prune {

  /** All simple paths min→max with an optional max-node-count cutoff
    * (cutoff < 0 → unbounded). Deterministic DFS in edge-insertion order,
    * mirroring networkx.all_simple_paths visit order. */
  def simplePaths(edges: IndexedSeq[(Int, Int)], from: Int, to: Int, cutoff: Int): Seq[Seq[Int]] = {
    val adj = new HashMap[Int, ArrayBuffer[Int]]()
    for ((s, t) <- edges) adj.getOrElseUpdate(s, new ArrayBuffer[Int]()) += t
    val out = new ArrayBuffer[Seq[Int]]()
    val path = new ArrayBuffer[Int]()
    val onPath = new HashSet[Int]()
    def dfs(u: Int): Unit = {
      path += u; onPath += u
      if (u == to) out += path.toSeq
      else if (cutoff < 0 || path.length < cutoff + 1) {
        // networkx cutoff = max path LENGTH in edges; len(path)==cutoff+1 nodes max
        for (v <- adj.getOrElse(u, ArrayBuffer.empty) if !onPath.contains(v)) dfs(v)
      }
      path.remove(path.length - 1); onPath -= u
    }
    dfs(from)
    out.toSeq
  }

  /** Valid (id1,id2) pairs of one token's lattice given its multi label. */
  def validEdgesForToken(
      tokenEdges: IndexedSeq[LatticeEdge],
      biose: String,
      nonOOnly: Boolean = false,
      keepAllIfNoValid: Boolean = true): Set[(Int, Int)] = {
    if (tokenEdges.isEmpty) return Set.empty
    val pairs = tokenEdges.map(e => (e.id1, e.id2))
    val minNode = tokenEdges.head.id1
    val maxNode = tokenEdges.last.id2
    // split with limit -1: Python's split KEEPS trailing empty atoms
    // (len("B-ORG^".split('^')) == 2), Scala's default drops them — the
    // count decides which path lengths survive pruning
    val bioseCount = biose.split("\\^", -1).length
    var vp: Seq[Seq[Int]] =
      if (nonOOnly && !biose.contains('-'))
        simplePaths(pairs, minNode, maxNode, -1)
      else
        simplePaths(pairs, minNode, maxNode, bioseCount + 1).filter(_.length == bioseCount + 1)
    if (keepAllIfNoValid && vp.isEmpty)
      vp = simplePaths(pairs, minNode, maxNode, -1)
    vp.iterator.flatMap(p => p.iterator.zip(p.iterator.drop(1))).toSet
  }

  /** Prune a whole sentence lattice given per-token multi labels (1-based
    * tokenId in edges; multiLabels(i) is token i+1's label). Keeps input edge
    * order. Iterates contiguous per-token runs (Analyzer emits them contiguous)
    * with a single-edge fast path — an unambiguous token (the overwhelmingly
    * common case) is kept whatever its label: with one edge the only path has
    * 2 nodes, so it is either count-valid or restored by keep_all_if_no_valid;
    * identical outcome to the full DFS, zero allocation. */
  def pruneSentence(
      edges: IndexedSeq[LatticeEdge],
      multiLabels: IndexedSeq[String],
      nonOOnly: Boolean = false,
      keepAllIfNoValid: Boolean = true): IndexedSeq[LatticeEdge] = {
    if (edges.isEmpty) return edges
    val out = new ArrayBuffer[LatticeEdge](edges.length)
    var i = 0
    while (i < edges.length) {
      val tid = edges(i).tokenId
      var j = i
      while (j < edges.length && edges(j).tokenId == tid) j += 1
      if (j - i == 1 && keepAllIfNoValid) {
        out += edges(i) // fast path: single analysis always survives
      } else {
        val es = edges.slice(i, j)
        val label = if (tid - 1 < multiLabels.length) multiLabels(tid - 1) else "O"
        val valid = validEdgesForToken(es, label, nonOOnly, keepAllIfNoValid)
        var k = i
        while (k < j) { if (valid.contains((edges(k).id1, edges(k).id2))) out += edges(k); k += 1 }
      }
      i = j
    }
    out.toIndexedSeq
  }
}
