package graft.kg

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synchronous label-propagation community detection — the clustering
  * member of the KG graph-analytics set (CC answers "same entity",
  * PageRank "how central", triangles "how clustered", link prediction
  * "what edge is missing"; this answers "which entities form a module").
  * Communities over the canonical-entity co-occurrence graph are the
  * standard topic/domain grouping signal for KG curation.
  *
  * Semantics are fully deterministic so a DuckDB replay hash-matches:
  * every vertex starts labeled with its own id; each round, every vertex
  * simultaneously adopts the most frequent label among its neighbors, ties
  * broken by the SMALLEST label (the classic deterministic LPA variant —
  * random-order asynchronous LPA is irreproducible by design and would be
  * unverifiable). A fixed iteration count replaces a convergence test for
  * the same reason as PageRank's.
  *
  * Scale shape (mirrors [[PageRank.run]]): the symmetrized edge set is
  * deduped, hash-partitioned on `src`, and persisted ONCE — every
  * iteration reuses that partitioning and shuffles only label-sized rows:
  * one map-side-combined groupBy counting (vertex, neighbor-label) pairs
  * (a hub's fan-in collapses to ≤ distinct-labels rows per map task —
  * the partial agg IS the skew guard), then ONE more exchange of those
  * count rows for the per-vertex argmax. The argmax itself is
  * `max(struct(cnt, -label))` — an ordinary aggregate, NOT a row_number
  * window, so no per-vertex sort and no window buffering; struct ordering
  * compares count first, then −label, which is exactly (count DESC,
  * label ASC). A lineage cut per round bounds plan growth. Driver holds
  * nothing; label state lives distributed, one long per vertex.
  */
object LabelProp {

  /** edges: (src: long, dst: long), undirected — each edge listed once in
    * either orientation (symmetrized + deduped internally). Returns
    * (node: long, community: long) after `iterations` synchronous rounds.
    * Isolated vertices don't exist in an edge list; every vertex keeps
    * receiving labels because symmetrization gives it an in-edge. */
  def run(spark: SparkSession, edges: DataFrame, iterations: Int = 3,
          checkpointEvery: Int = 1): DataFrame = {
    require(iterations >= 1 && checkpointEvery >= 1)
    // same input normalization as Triangles: null endpoints and self-loops
    // carry no community information and are dropped
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .na.drop().filter(col("src") =!= col("dst"))
    // repartition on the iteration key FIRST, then dedup: rows sharing
    // (src, dst) share src, so the partition-local distinct is globally
    // complete and needs no exchange of its own (HashPartitioning(src)
    // satisfies ClusteredDistribution(src, dst)) — one edge shuffle where
    // the previous distinct-then-repartition shape paid two
    val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      .repartition(col("src"))
      .distinct()
      .persist()
    // sym is partitioned on src, so this distinct is also partition-local
    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("lab", col("node"))
    var iter = 0
    while (iter < iterations) {
      labels = sym
        .join(labels.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"), col("lab"))
        .agg(count(lit(1)).as("c"))
        // argmax by (c DESC, lab ASC) as a plain aggregate: max over
        // struct(c, -lab) — no window sort, partial agg on both shuffles
        .groupBy("node")
        .agg(max(struct(col("c"), (-col("lab")).as("neg"))).as("m"))
        .select(col("node"), (-col("m.neg")).as("lab"))
      iter += 1
      if (iter % checkpointEvery == 0 && iter < iterations)
        labels = labels.localCheckpoint()
    }
    // one eager cut at the end (same contract as PageRank.run): callers get
    // a materialized, lineage-free result and the static edge set drops now
    val out = labels.select(col("node"), col("lab").as("community"))
      .localCheckpoint()
    sym.unpersist(false)
    out
  }
}
