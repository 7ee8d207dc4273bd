package graft.streaming

import graft.datapipe.TextQuality
import graft.io.TableFormat
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** Streaming curation — the ingest-time twin of `datapipe/Curate.runAll`,
  * built from the SAME per-row expressions so a doc admitted by the stream is
  * exactly the doc the batch pipeline would admit:
  *
  *   1. C4/Gopher verdict ([[TextQuality.c4Reason]]) — stateless, applied
  *      directly on the stream (rejects never enter state).
  *   2. Exact dedup within the watermark: `dropDuplicatesWithinWatermark` on
  *      the content fingerprint — the watermark bounds state (an unbounded
  *      dropDuplicates would OOM a long-running ingest). First-seen wins,
  *      which equals the batch min-id keep-one whenever ids are assigned in
  *      ingest order.
  *   3. Deterministic stratified hash sample — stateless, hash of the key.
  *
  * Fuzzy near-dup CLUSTERING deliberately stays batch (`Curate.runAll` stage
  * c): transitive clusters are a corpus-global fixpoint, not a bounded-state
  * stream computation — the standard split (streaming hygiene at ingest,
  * periodic batch compaction for global structure).
  *
  * Curated docs append under `outDir/epoch=N` with manifests — a replayed
  * epoch overwrites itself (same idempotent epoch-keyed contract as
  * [[StreamPipeline.run]]).
  */
object StreamCurate {

  /** The stateless+watermarked curation transform (shared by run() and
    * tests): docs must carry (doc_id, text, ingest_ts). */
  def curate(docs: DataFrame, watermark: String = "1 hour",
             minTokens: Int = 20,
             sampleRateBp: Column = lit(10000L)): DataFrame =
    docs
      .filter(TextQuality.c4Reason(col("text"), minTokens) === "ok")
      .withColumn("fp", TextQuality.fingerprint(col("text")))
      .withWatermark("ingest_ts", watermark)
      .dropDuplicatesWithinWatermark("fp")
      .drop("fp")
      .filter(TextQuality.hashBucket(col("doc_id"), "curate") < sampleRateBp)

  def run(spark: SparkSession, docs: DataFrame, outDir: String,
          checkpointDir: String, watermark: String = "1 hour",
          minTokens: Int = 20, sampleRateBp: Column = lit(10000L),
          trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    // checkpoint-scoped stream identity: lets Compact recognize a replayed
    // epoch as already merged even after its directory was compacted away
    val streamId = graft.io.Compact.streamInstanceId(checkpointDir)
    curate(docs, watermark, minTokens, sampleRateBp).writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        TableFormat.save(batch.drop("ingest_ts"), s"$outDir/epoch=$epochId",
          "doc_id", buckets = 8, stage = s"curated-epoch-$epochId",
          extra = Map("stream_id" -> streamId))
        ()
      }
      .start()
  }
}
