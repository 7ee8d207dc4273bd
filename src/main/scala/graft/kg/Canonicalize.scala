package graft.kg

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Entity canonicalization (SURVEY §2 C12): connected components over
  * entity-equivalence edges, GraphFrames-free.
  *
  * Algorithm: hash-to-min style label propagation — every node starts with
  * label = own id; each iteration joins labels across edges (both directions)
  * and keeps the min; stops at fixpoint. `localCheckpoint()` per iteration cuts
  * the lineage so plans stay O(1) instead of growing per loop (classic
  * iterative-Dataset failure mode at scale). Convergence is O(log n) iterations
  * on real graphs; edge count ≪ doc count so the per-iteration shuffle is small.
  */
object Canonicalize {

  /** edges: (src: long, dst: long) undirected. Returns (node: long, component:
    * long = min node id of its component). */
  def connectedComponents(spark: SparkSession, edges: DataFrame, maxIter: Int = 50): DataFrame = {
    import spark.implicits._
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint()

    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("component", col("node"))
      .localCheckpoint()

    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      // candidate labels: own + min over neighbors' labels
      val viaNeighbor = sym
        .join(labels.withColumnRenamed("node", "dst2"), col("dst") === col("dst2"))
        .select(col("src").as("node"), col("component"))
      val next = labels.select("node", "component").union(viaNeighbor)
        .groupBy("node").agg(min("component").as("component"))
        .localCheckpoint()
      changed = next.join(labels.withColumnRenamed("component", "old"), "node")
        .filter(col("component") =!= col("old")).count()
      labels = next
      iter += 1
    }
    labels
  }

  /** Build equivalence edges between entities that share a FULL normalized
    * alias (not the first-token blocking key — that is a candidate-generation
    * signature, far too coarse for merging identities), then assign
    * canonical_id = component min. Input: dict DataFrame
    * (entity_id, canonical, aliases, category). Output: dict + canonical_id.
    *
    * Edge generation is STAR-shaped, not all-pairs: every entity of an alias
    * block gets one edge to the block's min entity_id. A degenerate alias
    * shared by k entities emits k−1 edges (all-pairs would emit k²/2 — a
    * quadratic blowup on a hot alias at dictionary scale). The connected
    * components of the star graph equal those of the all-pairs graph by
    * construction (every member reaches every other through the hub). */
  def canonicalize(spark: SparkSession, dict: DataFrame): DataFrame = {
    val blocks = Linker.aliasBlocks(dict)
      .select(col("entity_id"), col("alias_norm").as("block"))
      .distinct()
    val hub = org.apache.spark.sql.expressions.Window.partitionBy("block")
    val edges = blocks
      .withColumn("dst", min("entity_id").over(hub))
      .filter(col("entity_id") =!= col("dst"))
      .select(col("entity_id").as("src"), col("dst"))
      .distinct()
    val comp = connectedComponents(spark, edges)
    dict.join(comp.withColumnRenamed("node", "entity_id"), Seq("entity_id"), "left")
      .withColumn("canonical_id", coalesce(col("component"), col("entity_id")))
      .drop("component")
  }
}
