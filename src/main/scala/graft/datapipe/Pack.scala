package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  *   1. bucket docs with an ORDER-PRESERVING, DETERMINISTIC coarsening of
  *      doc_id and aggregate per-bucket token totals — one map-side-combined
  *      shuffle down to the bucket count;
  *   2. cumulative-sum the bucket totals on the driver (bounded: one long per
  *      bucket) and broadcast-join the bucket base offsets back;
  *   3. an intra-bucket window (partitionBy bucket, orderBy doc_id) adds the
  *      local prefix — every bucket scans in parallel.
  *
  * The bucketing function must be a pure function of the doc_id VALUE, not of
  * the execution: the totals aggregation and the final join are separate jobs
  * that each traverse the bucketing, so an execution-dependent partitioner
  * (`repartitionByRange`, whose sample seed varies with the run) could assign
  * a row to different buckets in the two traversals and corrupt offsets.
  * Hence two value-deterministic paths:
  *
  *   - integral ids: `doc_id div bucketWidth` — arbitrarily fine buckets
  *     (window parallelism scales with the id range, 10⁶+ buckets at
  *     10¹² docs);
  *   - any other orderable id (e.g. string "doc-0017"): FROZEN-BOUNDARY range
  *     bucketing — a deterministic hash-sample of ids is sorted BY SPARK (so
  *     boundary order matches Spark's own comparison semantics), strided into
  *     `rangeBuckets`−1 boundary literals, and every traversal buckets with
  *     the same frozen `doc_id > boundary` count. Bucket count bounds window
  *     parallelism on this path — size `rangeBuckets` to ~cluster cores.
  *
  * All arithmetic is exact integer (token counts, truncating div), so the
  * resulting manifest is engine-stable and the DuckDB oracle replays it with a
  * single global window — same numbers, different execution shape.
  */
object Pack {

  private val integralTypes: Set[org.apache.spark.sql.types.DataType] = Set(
    org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
    org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType)

  /** Frozen range-bucket boundaries for a non-integral id column: a
    * deterministic hash-sample (content-keyed — a retry never redraws),
    * Spark-sorted, strided to ≤ rangeBuckets−1 cut points. */
  private def frozenBounds(counted: DataFrame, rangeBuckets: Int): Array[Any] = {
    val n = counted.count()
    if (n == 0) return Array.empty
    // target ~64 sample ids per bucket; mod 1 collects everything (small data)
    val mod = math.max(1L, n / (rangeBuckets.toLong * 64L))
    val sampled = counted
      .filter(pmod(Dedup.hash48Col(col("doc_id").cast("string")), lit(mod)) === 0L)
      .select("doc_id").orderBy("doc_id").collect().map(_.get(0))
    if (sampled.isEmpty) return Array.empty
    val stride = math.max(1, sampled.length / rangeBuckets)
    sampled.indices.collect { case i if (i + 1) % stride == 0 => sampled(i) }
      .take(rangeBuckets - 1).toArray
  }

  /** Bucket index = #boundaries strictly below doc_id — a binary-search tree
    * of nested CASE WHEN (depth ⌈log₂ buckets⌉ comparisons per row, pure
    * Catalyst, no UDF). Boundaries are literals, so every traversal of the
    * plan buckets identically. */
  private def boundsBucket(id: Column, bounds: Array[Any]): Column = {
    def tree(lo: Int, hi: Int): Column = // bucket for ids in (bounds(lo-1), bounds(hi)]
      if (lo == hi) lit(lo)
      else {
        val mid = (lo + hi) / 2 // compare against bounds(mid): ≤ → left half
        when(id <= lit(bounds(mid)), tree(lo, mid)).otherwise(tree(mid + 1, hi))
      }
    val bucket = if (bounds.isEmpty) lit(0) else tree(0, bounds.length)
    // a null id must surface as a null bucket (caught loudly downstream),
    // not silently fall through the comparison ladder into the last bucket
    when(id.isNull, lit(null)).otherwise(bucket).cast("long")
  }

  /** Guardrailed integral bucket width: the driver-side cumsum collects one
    * (bucket, total) row per NON-EMPTY bucket, but with `doc_id div width` the
    * bucket COUNT is bounded by idRange/width — at 10¹² integral ids the
    * default 4096 width would pull ~2.4×10⁸ rows to the driver (silent OOM at
    * exactly the scale the two-level scan exists for). So the width is derived
    * from the actual id range: widened (never narrowed — the caller's width is
    * a lower bound on granularity) until ≤ `maxBuckets` buckets cover the
    * range. One column-pruned min/max scan of the id column; the result is a
    * driver-side literal, so every traversal of the plan buckets identically. */
  private[graft] def effectiveBucketWidth(df: DataFrame, idCol: String,
                                             bucketWidth: Long, maxBuckets: Long): Long = {
    val mm = df.agg(min(col(idCol)).cast("long").as("lo"),
      max(col(idCol)).cast("long").as("hi")).head()
    if (mm.isNullAt(0)) bucketWidth // empty input: any width works
    else {
      val range = math.max(mm.getLong(1) - mm.getLong(0) + 1L, 1L)
      val needed = (range + maxBuckets - 1L) / maxBuckets // ceil(range / maxBuckets)
      math.max(bucketWidth, needed)
    }
  }

  /** Per-doc packing manifest: (doc_id, n_tokens, tok_offset, chunk_first,
    * chunk_last, chunks_spanned) for chunks of `capacity` tokens. Documents
    * are packed in ascending doc_id order under the column's NATIVE ordering
    * (no hidden numeric cast — string ids pack in string order, matching the
    * SQL replay); ids must be distinct and non-null; empty docs (0 tokens)
    * are dropped (they occupy no span). */
  def concatChunks(spark: SparkSession, df: DataFrame, idCol: String,
                   textCol: String, capacity: Long = 2048L,
                   bucketWidth: Long = 4096L, rangeBuckets: Int = 256,
                   maxBuckets: Long = 1L << 20): DataFrame = {
    require(capacity > 0 && bucketWidth > 0 && rangeBuckets > 0 && maxBuckets > 0)
    val counted1 = df
      .select(col(idCol).as("doc_id"),
        TextQuality.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0L)
    val integral = integralTypes.contains(counted1.schema("doc_id").dataType)
    // generic path: cut the lineage once — count(), the boundary sample, the
    // totals aggregation and the final join would otherwise each re-tokenize
    // the corpus (4 full passes); the checkpoint makes it one. The integral
    // path keeps its two lazy traversals (no boundary jobs to amortize).
    val counted0 = if (integral) counted1 else counted1.localCheckpoint()
    val bucketCol =
      if (integral) expr(s"doc_id div ${effectiveBucketWidth(df, idCol, bucketWidth, maxBuckets)}L")
      else boundsBucket(col("doc_id"), frozenBounds(counted0, rangeBuckets))
    val counted = counted0.withColumn("bucket", bucketCol)

    // level 1: per-bucket totals (tiny), cumsum on the driver, rebroadcast
    // as base offsets. The bucket count is GUARDRAILED (effectiveBucketWidth /
    // rangeBuckets), so this collect is bounded at ≤ maxBuckets+1 (long, long)
    // rows — never a function of the corpus size or a caller-mis-sized width.
    val totals = counted.groupBy("bucket").agg(sum("n_tokens").as("tot"))
      .collect().map { r =>
        require(!r.isNullAt(0), s"concatChunks: null $idCol — ids must be non-null")
        (r.getLong(0), r.getLong(1))
      }.sortBy(_._1)
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

  /** Per-document OVERLAPPING window chunking — the RAG / long-context
    * preprocessing twin of [[concatChunks]]' packing: each doc is cut into
    * windows of `size` tokens starting every `stride` tokens (overlap =
    * size − stride), with the last window clipped at the doc end. Start
    * positions: 0, stride, …, stride·ceil((n−size)/stride) — so every token
    * is covered, the final window reaches exactly the doc end, and no start
    * begins past it. Docs with 0 tokens emit nothing.
    * Emits (doc_id, chunk_id, start_tok, end_tok, n_toks) boundaries —
    * token-slice materialization composes downstream.
    * Scale: narrow per-row explode bounded by n/stride + 1 rows per doc; no
    * shuffle, no window, text never leaves the row. */
  def overlapChunks(df: DataFrame, idCol: String, textCol: String,
                    size: Int = 128, stride: Int = 96): DataFrame = {
    require(size >= 1 && stride >= 1 && stride <= size,
      s"need 1 <= stride <= size, got size=$size stride=$stride")
    val n = s"size(filter(split(lower($textCol), '\\\\s+'), t -> t <> ''))"
    // ceil((n - size)/stride) in integer math, clamped at 0
    val lastStartIdx = s"greatest(0, ($n - $size + $stride - 1) div $stride)"
    df.selectExpr(idCol, s"$n AS n_doc_toks")
      .filter(col("n_doc_toks") > 0)
      .select(col(idCol), col("n_doc_toks"),
        posexplode(expr(s"sequence(0, greatest(0, (n_doc_toks - $size + $stride - 1) div $stride))"))
          .as(Seq("chunk_id", "start_idx")))
      .withColumn("start_tok", col("chunk_id") * stride)
      .withColumn("end_tok", least(col("start_tok") + size, col("n_doc_toks")))
      .withColumn("n_toks", col("end_tok") - col("start_tok"))
      .select(col(idCol), col("chunk_id"), col("start_tok"), col("end_tok"), col("n_toks"))
  }
}
