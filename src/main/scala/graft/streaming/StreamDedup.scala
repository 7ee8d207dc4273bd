package graft.streaming

import graft.datapipe.Dedup
import graft.io.Snapshots
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** Streaming ingest dedup against a PERSISTENT fingerprint store — the
  * streaming face of `Dedup.incrementalDedup` (d_incr_dedup) and the
  * complement of `StreamPipeline.dedupStream`'s watermarked dedup:
  * `dropDuplicatesWithinWatermark` can only promise in-WINDOW dedup (its
  * state must expire to stay bounded), while a corpus store must reject a
  * duplicate that arrives a month later. Here the admission state IS the
  * admitted table: each micro-batch is deduped within itself (min id wins),
  * anti-joined against the store's fingerprints, and the admitted rows —
  * carrying their `fp` column — commit as ONE snapshot per epoch.
  *
  * Exactly-once: the snapshot stage records (stream instance, epoch); a
  * replayed epoch finds its stage in the log and skips (the StreamUpsert
  * contract). Because admitted docs and their fingerprints land in one
  * atomic commit, there is no half-state for a crash to expose: a replay
  * either sees the committed epoch (skips) or re-runs the identical
  * admission against the identical store.
  *
  * Scale: per epoch one batch-sized keep-one window + one fp-equi anti-join
  * against the store (bucketed ON fp, so the probe reads co-located buckets
  * and a column-pruned scan ships 16-byte hashes only — never text);
  * per-epoch cost is O(batch) for the life of the stream.
  */
object StreamDedup {

  /** Admit one micro-batch; returns true if a snapshot was committed,
    * false if skipped (replayed epoch, or nothing admitted). Exposed for
    * direct reuse/testing; [[run]] wires it under foreachBatch. */
  def admitBatch(batch: DataFrame, tableDir: String, idCol: String,
                 fp: Column, buckets: Int, stage: String): Boolean = {
    val snaps = Snapshots.snapshots(tableDir) // one log read per epoch
    if (snaps.exists(_.stage == stage))
      return false // replayed epoch — already committed exactly once
    val spark = batch.sparkSession
    val history =
      if (snaps.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("fp",
              org.apache.spark.sql.types.StringType))))
      else Snapshots.load(spark, tableDir).select("fp")
    // localCheckpoint: isEmpty + the commit's bucketed write would otherwise
    // re-execute the window + anti-join (and re-read the store) twice
    val admitted = Dedup.incrementalDedup(history, batch, idCol, fp)
      .localCheckpoint()
    if (admitted.isEmpty) return false // idempotent: a replay re-admits nothing
    Snapshots.commit(admitted, tableDir, "fp", buckets, stage)
    true
  }

  /** Run the dedup-admission sink over a streaming docs frame. The admitted
    * table accumulates one snapshot per non-empty epoch, bucketed on `fp`. */
  def run(spark: SparkSession, docs: DataFrame, tableDir: String,
          idCol: String, fp: Column, checkpointDir: String,
          buckets: Int = 8,
          trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val streamId = graft.io.Compact.streamInstanceId(checkpointDir)
    docs.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        admitBatch(batch, tableDir, idCol, fp, buckets,
          stage = s"dedup-$streamId-epoch-$epochId")
        ()
      }
      .start()
  }
}
