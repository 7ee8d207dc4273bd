package graft.kg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-node triangle counting — the local-clustering signal used to score KG
  * neighborhoods (a node whose neighbors also know each other is a community
  * core, not a hub artifact). Complements [[PageRank]] (global salience) and
  * [[Canonicalize]] (identity): together they are the standard KG-quality
  * triple (salience, identity, cohesion).
  *
  * Algorithm: degree-ordered edge orientation + wedge closure (the
  * node-iterator / "compact-forward" scheme of Schank & Wagner 2005, the same
  * shape every distributed triangle system uses). Each undirected edge is
  * oriented from its lower-(degree, id) endpoint to its higher one, making
  * the oriented out-degree of EVERY node ≤ O(√m) regardless of skew — a
  * hub's edges all point INTO it, so the hub generates no wedges. Wedge
  * count is then Σ outdeg² ≤ O(m^1.5) worst case and O(α·m) for real
  * (bounded-arboricity) graphs, instead of the Σ deg² of naive adjacency
  * self-joins, which a single celebrity node makes corpus-quadratic.
  *
  * Scale shape: the edge set shuffles for the distinct, the degree groupBy,
  * the wedge join on the pivot, and the closure join on (u,v) — all on keys Spark
  * co-partitions; no per-node adjacency materialization, no driver state.
  * The closure join's probe side is the wedge stream, bounded as above.
  * Exact integer output — every triangle {a,b,c} is found exactly once (as
  * its unique orientation a→b→c with (deg,id) increasing), so per-node
  * counts hash-match a relational replay.
  */
object Triangles {

  /** edges: (src, dst) UNDIRECTED — pairs are normalized (least, greatest)
    * and deduplicated here, so callers may pass either or both directions;
    * self-loops are dropped. Returns (node: long, n_tri: long) for every
    * node in ≥1 triangle. */
  def perNodeCounts(edges: DataFrame): DataFrame = {
    // localCheckpoint: the normalized edge set feeds THREE consumers (the
    // degree build and both sides of the orientation joins) — without a cut
    // Catalyst duplicates the whole upstream pair-build subtree per consumer
    // (verified in the plan: 3 copies of the input join + distinct)
    val e = edges.select(
        least(col("src"), col("dst")).cast("long").as("pa"),
        greatest(col("src"), col("dst")).cast("long").as("pb"))
      .filter(col("pa") =!= col("pb") && col("pa").isNotNull)
      .distinct()
      .localCheckpoint(false)
    // degree per endpoint (one explode + map-side-combined groupBy), then
    // orient low→high by (deg, id): ties MUST break on id or an equal-degree
    // edge would orient both ways / neither way
    val deg = e.select(explode(array(col("pa"), col("pb"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("d"))
    val fwd = col("da") < col("db") || (col("da") === col("db") && col("pa") < col("pb"))
    val oe = e
      .join(deg.select(col("node").as("pa"), col("d").as("da")), "pa")
      .join(deg.select(col("node").as("pb"), col("d").as("db")), "pb")
      .select(when(fwd, col("pa")).otherwise(col("pb")).as("u"),
              when(fwd, col("pb")).otherwise(col("pa")).as("v"))
      .persist() // read 3× below; the oriented edge set is the whole state
    val tri = oe.as("e1")
      .join(oe.as("e2"), col("e1.v") === col("e2.u"))                  // wedges u→v→w
      .join(oe.as("e3"), col("e3.u") === col("e1.u") && col("e3.v") === col("e2.v")) // close u→w
      .select(col("e1.u").as("a"), col("e1.v").as("b"), col("e2.v").as("c"))
    val counts = tri
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))
      .localCheckpoint() // eager: lets the oriented edge cache drop now
    oe.unpersist(false)
    counts
  }
}
