package graft.kg

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** k-core decomposition by synchronous peeling, fixed rounds — the
  * density-filtering member of the graph-analytics group (PageRank =
  * salience, LPA = communities, triangles = local clustering, k-core =
  * "drop the sparse fringe"): vertices with induced degree < k are removed
  * each round, shrinking the graph toward its k-core. On a KG this prunes
  * weakly-connected entity noise before the quadratic-ish analytics run.
  *
  * Fixed-iteration contract (the PageRank/LabelProp convention — the DuckDB
  * oracle unrolls the same number of rounds as CTEs, so results are
  * bit-comparable): exactly `rounds` peel rounds run; the returned set is
  * the round-R survivors with their degree in the round-R induced subgraph.
  * For a true fixpoint, size `rounds` to the graph's peeling depth — each
  * round strictly shrinks the alive set or the next rounds are no-ops, so
  * convergence is detectable by one extra round changing nothing.
  *
  * Scale shape: the symmetrized edge set is partitioned by `u` and persisted
  * ONCE; each round is two broadcast-or-shuffle semi-joins against the
  * (shrinking, vertex-sized) alive set plus one map-side-combined degree
  * count — edges never re-shuffle after the initial partition, and the only
  * per-round driver interaction is the lineage cut (localCheckpoint), the
  * same per-round economics as PageRank.run. Hot hubs are harmless: degree
  * counting is a partial-agg groupBy, never a neighbor collect.
  */
object KCore {

  /** edges: (src: long, dst: long), undirected — each edge once in either
    * orientation (symmetrized + deduped internally; nulls and self-loops
    * dropped, same normalization as Triangles/LabelProp). Returns
    * (node: long, core_deg: long): round-`rounds` survivors with ≥ 1
    * induced edge and their induced degree. */
  def run(spark: SparkSession, edges: DataFrame, k: Int,
          rounds: Int = 3): DataFrame = {
    require(k >= 1, s"k-core needs k >= 1, got $k")
    require(rounds >= 1, s"need at least one peel round, got $rounds")
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .na.drop().filter(col("src") =!= col("dst"))
    // repartition on the join key FIRST, then dedup — the partition-local
    // distinct is globally complete (same-key rows co-located) and plans no
    // exchange of its own; one edge shuffle instead of two (the
    // PageRank/LabelProp static-build fusion)
    val sym = e.select(col("src").as("u"), col("dst").as("v"))
      .union(e.select(col("dst").as("u"), col("src").as("v")))
      .repartition(col("u"))
      .distinct()
      .persist()
    var alive = sym.select(col("u")).distinct()
    for (_ <- 1 to rounds) {
      val induced = sym
        .join(alive, Seq("u"), "left_semi")
        .join(alive.select(col("u").as("v")), Seq("v"), "left_semi")
      alive = induced.groupBy("u").agg(count(lit(1)).as("d"))
        .filter(col("d") >= k).select("u")
        .localCheckpoint()
    }
    val out = sym
      .join(alive, Seq("u"), "left_semi")
      .join(alive.select(col("u").as("v")), Seq("v"), "left_semi")
      .groupBy(col("u").as("node"))
      .agg(count(lit(1)).as("core_deg"))
      .localCheckpoint()
    sym.unpersist(false)
    out
  }
}
