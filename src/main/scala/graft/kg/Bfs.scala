package graft.kg

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-source BFS levels — the reachability member of the graph-analytics
  * group (PageRank = salience, CC = identity, k-core = density, triangles =
  * clustering, BFS = distance): every vertex reachable from a seed set gets
  * its hop distance, capped at `maxRounds`. On a KG this answers "which
  * entities are within h hops of these seeds" — neighborhood extraction for
  * subgraph sampling, provenance radius checks, and entity-context
  * assembly for retrieval.
  *
  * Frontier iteration, NOT an all-pairs or matrix approach: each round
  * expands only the CURRENT frontier (vertices first reached last round)
  * one hop, then anti-joins the visited set — the per-round join cost is
  * O(Σ deg(frontier)), never edge-set-squared, and on small-diameter web/KG
  * graphs the loop ends in a handful of rounds. The loop exits early when a
  * round discovers nothing (the one per-round driver action is the
  * frontier-count check, metadata-scale like the CC fixpoint test).
  *
  * Scale shape: the edge set is normalized (symmetrized + deduped), hash
  * partitioned by `src` and persisted ONCE — every round's frontier join
  * reuses that layout, so edges never re-shuffle; the frontier/visited sets
  * are vertex-sized and carry two longs per row. Hot hubs cost one join
  * row per (hub, frontier-neighbor), handled by the same AQE skew split as
  * every equi-join here. Per-round lineage is cut with localCheckpoint —
  * the CC/PageRank/KCore convention.
  */
object Bfs {

  /** edges: (src, dst) undirected — each edge once in either orientation
    * (symmetrized internally; nulls + self-loops dropped). seeds: (id).
    * Returns (id: long, level: int): hop distance from the nearest seed,
    * 0 for the seeds themselves, only vertices reached within `maxRounds`
    * hops. Seeds absent from the edge set still appear at level 0. */
  def levels(spark: SparkSession, edges: DataFrame, seeds: DataFrame,
             maxRounds: Int = 8): DataFrame = {
    require(maxRounds >= 0, s"need maxRounds >= 0, got $maxRounds")
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .na.drop().filter(col("src") =!= col("dst"))
    // repartition on the frontier-join key FIRST, then dedup — the
    // partition-local distinct plans no exchange of its own; one edge
    // shuffle instead of two (the PageRank/LabelProp static-build fusion)
    val sym = e.union(e.select(col("dst"), col("src")))
      .repartition(col("src"))
      .distinct()
      .localCheckpoint()
    var visited = seeds.select(col("id").cast("long")).na.drop().distinct()
      .select(col("id"), lit(0).as("level"))
      .localCheckpoint()
    var frontier = visited.select("id")
    var round = 1
    var grew = true
    while (round <= maxRounds && grew) {
      val next = sym.join(frontier.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id")).distinct()
        .join(visited.select("id"), Seq("id"), "left_anti")
        .localCheckpoint()
      grew = next.limit(1).count() > 0 // frontier-sized existence probe
      if (grew) {
        visited = visited.union(next.select(col("id"), lit(round).as("level")))
          .localCheckpoint()
        frontier = next
        round += 1
      }
    }
    visited
  }
}
