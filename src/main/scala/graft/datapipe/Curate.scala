package graft.datapipe

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.TableFormat

/** Staged, checkpoint-resumable corpus curation — the datapipe twin of the
  * KG pipeline's `Pipeline.runAll`: every stage materializes to a bucketed
  * table with an atomic manifest (per-partition lineage counts + "complete"
  * marker), so a crashed 100 TB curation run resumes at the first incomplete
  * stage instead of re-reading the corpus.
  *
  * Stages:
  *   (a) verdicts — C4/Gopher composite filter verdict per doc
  *   (b) deduped  — kept docs, exact-dedup keep-one on the content fingerprint
  *   (c) clusters — fuzzy near-dup clusters (LSH pairs → connected components)
  *   (d) curated  — cluster non-representatives dropped, then the
  *       deterministic stratified hash sample (training-mixture rebalance)
  *   (e) packed   — the sequence-packing manifest over the curated set
  *       ([[Pack.concatChunks]]): what a training run consumes
  *
  * Stages (c)–(e) read only the previous stage's (survivor-sized) table;
  * the raw corpus is scanned exactly twice — stage (a) for verdicts and
  * stage (b)'s keep-join, which must recover the text the verdict table
  * deliberately doesn't carry. The fuzzy-cluster stage runs on the already
  * exact-deduped set (exact dups would pollute LSH buckets with guaranteed
  * collisions).
  */
object Curate {

  final case class StagePaths(workDir: String) {
    val verdicts = s"$workDir/verdicts"
    val deduped = s"$workDir/deduped"
    val clusters = s"$workDir/clusters"
    val curated = s"$workDir/curated"
    val packed = s"$workDir/packed"
    def all: Seq[String] = Seq(verdicts, deduped, clusters, curated, packed)
  }

  /** Run the staged curation flow over `docs` (doc_id, text, + passenger
    * columns). `sampleRateBp` is the per-row keep rate in basis points — any
    * Column over the row works; the default is 50% for "en" and 100%
    * otherwise when the corpus HAS a `lang` column, and 100% flat when it
    * doesn't (the contract only requires doc_id + text).
    * Returns the curated DataFrame (read back from the final stage table). */
  def runAll(spark: SparkSession, docs: DataFrame, workDir: String,
             buckets: Int = 32, resume: Boolean = true,
             minTokens: Int = 20, maxDist: Int = 3,
             sampleRateBp: Option[org.apache.spark.sql.Column] = None,
             chunkCapacity: Long = 2048L, packBucketWidth: Long = 4096L): DataFrame = {
    // fail at submit time, not hours into stage (d): the input contract is
    // (doc_id, text, + passengers) — anything else is a caller error
    require(docs.columns.contains("doc_id") && docs.columns.contains("text"),
      s"Curate.runAll input needs doc_id and text columns, got ${docs.columns.mkString(", ")}")

    val paths = StagePaths(workDir)

    // DIRTY CHAIN: once any stage rebuilds, every downstream stage rebuilds
    // too — a stage's manifest only proves it is current w.r.t. the inputs it
    // was built from. (Deleting `curated` to re-sample must also re-derive
    // `packed`, or a trainer reads chunk offsets for a corpus that no longer
    // exists.)
    var dirty = false
    def stage(path: String)(build: => Unit): Unit =
      if (dirty || !(resume && TableFormat.isComplete(path))) { build; dirty = true }

    // (a) verdicts — one narrow pass over the raw corpus
    stage(paths.verdicts) {
      TableFormat.save(TextQuality.c4Filter(docs, "doc_id", "text", minTokens),
        paths.verdicts, "doc_id", buckets, "verdicts")
    }
    val verdicts = TableFormat.load(spark, paths.verdicts)

    // (b) kept + exact dedup keep-one (fingerprint window, min doc_id wins)
    stage(paths.deduped) {
      val kept = docs.join(
        verdicts.filter(col("keep") === 1).select("doc_id"), "doc_id")
      TableFormat.save(
        Dedup.exactDedupBy(kept, "doc_id", TextQuality.fingerprint(col("text"))),
        paths.deduped, "doc_id", buckets, "deduped")
    }
    val deduped = TableFormat.load(spark, paths.deduped)

    // (c) fuzzy near-dup clusters on the exact-deduped survivors
    stage(paths.clusters) {
      TableFormat.save(
        Dedup.nearDupClusters(spark, deduped, "doc_id", "text", maxDist),
        paths.clusters, "doc_id", buckets, "clusters")
    }
    val clusters = TableFormat.load(spark, paths.clusters)

    // (d) drop cluster non-representatives, then the deterministic sample.
    // The drop-set (doc_id ≠ cluster_rep) is the sparse clustered tail —
    // a left_anti join against it is broadcast-sized in practice
    stage(paths.curated) {
      val dropIds = clusters.filter(col("doc_id") =!= col("cluster_rep"))
        .select("doc_id")
      val survivors = deduped.join(dropIds, Seq("doc_id"), "left_anti")
      val rate = sampleRateBp.getOrElse(
        if (docs.columns.contains("lang"))
          when(col("lang") === "en", lit(5000L)).otherwise(lit(10000L))
        else lit(10000L))
      TableFormat.save(
        TextQuality.stratifiedHashSample(survivors, "doc_id", rate, salt = "curate"),
        paths.curated, "doc_id", buckets, "curated")
    }
    val curated = TableFormat.load(spark, paths.curated)

    // (e) packing manifest: the chunk layout a training run reads. Bucketed
    // by chunk_first so a trainer's "give me chunks [a, b)" is a pruned read
    stage(paths.packed) {
      TableFormat.save(
        Pack.concatChunks(spark, curated, "doc_id", "text",
          chunkCapacity, packBucketWidth),
        paths.packed, "chunk_first", buckets, "packed")
    }

    curated
  }
}
