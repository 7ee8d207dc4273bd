package graft.datapipe

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing (concat-and-chunk): lay every document's tokens out on one
  * global token axis in doc_id order and cut the axis into fixed-capacity
  * training chunks — the standard "concatenate and chunk" step that turns a
  * curated corpus into fixed-length LM training sequences.
  *
  * The global token offset is a PREFIX SUM over a total order, which a naive
  * `Window.orderBy(doc_id)` computes on a SINGLE partition (Spark's
  * unpartitioned-window warning — a serialization point that cannot survive
  * 10¹² docs). Instead the classic two-level scan:
  *
  *   1. bucket docs by `doc_id div bucketWidth` and aggregate per-bucket token
  *      totals — one map-side-combined shuffle to ~maxId/bucketWidth rows;
  *   2. cumulative-sum the bucket totals on the driver (size caller-bounded:
  *      at 10¹² docs and bucketWidth 10⁶ that is 10⁶ longs) and broadcast-join
  *      the bucket base offsets back;
  *   3. an intra-bucket window (partitionBy bucket, orderBy doc_id) adds the
  *      local prefix — every bucket scans in parallel.
  *
  * All arithmetic is exact integer (token counts, truncating div), so the
  * resulting manifest is engine-stable and the DuckDB oracle replays it with a
  * single global window — same numbers, different execution shape.
  */
object Pack {

  /** Per-doc packing manifest: (doc_id, n_tokens, tok_offset, chunk_first,
    * chunk_last, chunks_spanned) for chunks of `capacity` tokens. Documents
    * are packed in doc_id order; empty docs (0 tokens) are dropped (they
    * occupy no span). */
  def concatChunks(spark: SparkSession, df: DataFrame, idCol: String,
                   textCol: String, capacity: Long = 2048L,
                   bucketWidth: Long = 4096L): DataFrame = {
    require(capacity > 0 && bucketWidth > 0)
    val counted = df
      .select(col(idCol).cast("long").as("doc_id"),
        TextQuality.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0L)
      .withColumn("bucket", expr(s"doc_id div ${bucketWidth}L"))

    // level 1: per-bucket totals (tiny: maxId/bucketWidth rows), cumsum on
    // the driver, rebroadcast as base offsets
    val totals = counted.groupBy("bucket").agg(sum("n_tokens").as("tot"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val bases = totals.map { case (b, tot) => val base = acc; acc += tot; (b, base) }
    import spark.implicits._
    val baseDf = broadcast(bases.toSeq.toDF("bucket", "bucket_base"))

    // level 2: intra-bucket prefix in parallel windows
    val w = Window.partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    counted.join(baseDf, "bucket")
      .withColumn("tok_offset",
        col("bucket_base") + coalesce(sum("n_tokens").over(w), lit(0L)))
      .withColumn("chunk_first", expr(s"tok_offset div ${capacity}L"))
      .withColumn("chunk_last",
        expr(s"(tok_offset + n_tokens - 1) div ${capacity}L"))
      .withColumn("chunks_spanned", col("chunk_last") - col("chunk_first") + 1L)
      .select("doc_id", "n_tokens", "tok_offset", "chunk_first", "chunk_last",
        "chunks_spanned")
  }

  /** Per-chunk fill summary from a manifest: how many docs contribute to each
    * chunk and how many of its `capacity` slots are filled (the final chunk is
    * the only one allowed to be partial). The explode is bounded: a doc spans
    * at most n_tokens/capacity + 1 chunks, so total exploded rows ≤
    * totalTokens/capacity + nDocs. */
  def chunkSummary(manifest: DataFrame, capacity: Long = 2048L): DataFrame =
    manifest
      .select(col("doc_id"), col("tok_offset"), col("n_tokens"),
        explode(expr("sequence(chunk_first, chunk_last)")).as("chunk_id"))
      .withColumn("tokens_in_chunk",
        least(col("tok_offset") + col("n_tokens"), (col("chunk_id") + 1L) * capacity)
          - greatest(col("tok_offset"), col("chunk_id") * capacity))
      .groupBy("chunk_id")
      .agg(count(lit(1)).as("n_docs"), sum("tokens_in_chunk").as("tokens_filled"))
}
