package graft.kg

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixed-point PageRank — entity-salience scoring over a KG edge set
  * (the graph-analytics companion to [[Canonicalize.connectedComponents]]:
  * CC decides which mentions are the same entity, PageRank decides which
  * entities matter).
  *
  * All arithmetic is EXACT INTEGER so two engines agree bit-for-bit: ranks
  * are scaled by `scale` (default 10⁶), a node's contribution is
  * `rank div out_degree` (truncating), and the damping update is
  * `0.15·scale + (85·Σ incoming) div 100`. Floating-point PageRank differs
  * across summation orders; this one is verifiable by a DuckDB replay with
  * unrolled iterations. Fixed iteration count (no float convergence test) for
  * the same reason.
  *
  * Shuffle shape per iteration: one join of ranks onto edges by src (both
  * sides hash-partitioned on the same key — AQE reuses the exchange), one
  * map-side-combined groupBy dst, one left join back onto the vertex set.
  * `localCheckpoint` per iteration cuts the lineage (iterative-Dataset plans
  * otherwise grow per loop). Edges and degrees are computed once and
  * checkpointed. Dangling nodes (out-degree 0) keep receiving rank but leak
  * their own mass — the standard simplification, applied identically in the
  * oracle replay.
  */
object PageRank {

  /** edges: (src: long, dst: long) DIRECTED (symmetrize upstream for an
    * undirected graph). Returns (node: long, rank: long) with Σ rank ≈
    * nNodes·scale. `scale` must be a multiple of 100 so the teleport term
    * 0.15·scale is exact. */
  def run(spark: SparkSession, edges: DataFrame, iterations: Int = 5,
          scale: Long = 1000000L): DataFrame = {
    require(scale % 100L == 0L, "scale must be a multiple of 100")
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .distinct().localCheckpoint()
    val verts = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().localCheckpoint()
    val outdeg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg")).localCheckpoint()
    val teleport = 15L * scale / 100L

    var ranks = verts.withColumn("rank", lit(scale)).localCheckpoint()
    var iter = 0
    while (iter < iterations) {
      val contribs = e
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .join(outdeg.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), expr("rank div deg").as("contrib"))
        .groupBy("node").agg(sum("contrib").as("inc"))
      ranks = verts.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(teleport) + expr("(85 * coalesce(inc, 0L)) div 100")).as("rank"))
        .localCheckpoint()
      iter += 1
    }
    ranks
  }
}
