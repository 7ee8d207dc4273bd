package graft.streaming

import graft.io.Snapshots
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** Streaming keyed upsert into a snapshot table: each micro-batch becomes
  * ONE copy-on-write [[Snapshots.merge]] snapshot — the streaming face of
  * the table format's row-level MERGE, i.e. a CDC-apply sink (Iceberg's
  * MERGE INTO driven by a change stream).
  *
  * Semantics:
  *  - within a batch, several updates for the same key are resolved BEFORE
  *    the merge: the row with the greatest `versionCol` wins. A tie at the
  *    WINNING version fails loudly — two contradictory top rows have no
  *    deterministic winner, and committing either would be a silent coin
  *    flip; ties among superseded lower versions are simply discarded (they
  *    lose to the winner either way);
  *  - across batches, later epochs simply merge over earlier ones;
  *  - exactly-once per epoch: the merge snapshot's stage records
  *    (stream instance, epoch); a replayed epoch — restart after the commit
  *    but before the checkpoint ack — is detected in the snapshot log and
  *    skipped, the same idempotence contract as Pipeline.runIncremental's
  *    batchId-keyed commits;
  *  - the FIRST batch of an empty table is a plain commit (merge needs a
  *    snapshot to merge into); empty batches are no-ops.
  *
  * Scale: per epoch the work is one delta-sized merge — candidate dirs
  * gated by key-bounds stats + the one-job semi probe — so a key-clustered
  * CDC stream rewrites one or two batch dirs per epoch, never the table.
  */
object StreamUpsert {

  /** Apply one delta as an upsert (plus deletes when `opCol` is set);
    * returns true if a snapshot was committed, false if skipped (empty
    * delta or replayed stage). With `opCol`, each row carries "upsert" or
    * "delete"; last-writer-wins picks the key's winning OP too, so an
    * upsert after a delete (by version) re-inserts and vice versa. Exposed
    * for direct reuse/testing; [[run]] wires it under foreachBatch. */
  def upsertBatch(delta: DataFrame, tableDir: String, keyCol: String,
                  versionCol: String, buckets: Int, stage: String,
                  statsCols: Seq[String] = Nil,
                  opCol: Option[String] = None): Boolean = {
    if (Snapshots.snapshots(tableDir).exists(_.stage == stage))
      return false // replayed epoch — already committed exactly once
    // EXACT duplicate rows collapse first: an at-least-once source (Kafka
    // redelivery inside one micro-batch) re-emitting the identical row is
    // benign and must not trip the contradiction check below — only rows
    // that share (key, version) while DISAGREEING elsewhere are fatal
    val deduped = delta.distinct()
    // last-writer-wins WITHIN the delta: keep each key's max-version row; a
    // tie at the WINNING version is contradictory input — fail, don't
    // coin-flip (superseded lower-version duplicates just lose)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(versionCol).desc)
    val ranked = deduped
      .withColumn("_su_rk", row_number().over(w))
      .withColumn("_su_n", count(lit(1))
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy(col(keyCol), col(versionCol))))
    // localCheckpoint: the dedup window + source would otherwise re-execute
    // for every downstream action (isEmpty, merge's bounds agg, the probe,
    // the rewrite, the delta save) — the same materialize-once reasoning as
    // merge's own deltaKeys checkpoint
    val resolved = ranked.filter(col("_su_rk") === 1)
      .withColumn(keyCol, when(col("_su_n") > 1,
        raise_error(concat(lit(s"StreamUpsert: conflicting rows share ($keyCol, "
          + s"$versionCol) = ("), col(keyCol).cast("string"), lit(", "),
          col(versionCol).cast("string"), lit(")")))).otherwise(col(keyCol)))
      .drop("_su_rk", "_su_n")
      .localCheckpoint()
    val (upserts, deletes) = opCol match {
      case None => (resolved, None)
      case Some(oc) =>
        val ops = resolved.select(col(oc)).distinct().collect()
          .map(_.getString(0)).toSet
        require(ops.subsetOf(Set("upsert", "delete")),
          s"StreamUpsert: unknown $oc values ${ops -- Set("upsert", "delete")}")
        val del = resolved.filter(col(oc) === "delete").select(col(keyCol))
        (resolved.filter(col(oc) === "upsert").drop(oc),
          if (del.isEmpty) None else Some(del))
    }
    val haveUpserts = !upserts.isEmpty
    if (!haveUpserts && deletes.isEmpty) return false
    if (Snapshots.snapshots(tableDir).isEmpty) {
      // first batch of an empty table: deletes have nothing to delete
      if (!haveUpserts) return false
      Snapshots.commit(upserts, tableDir, keyCol, buckets, stage,
        statsCols = statsCols)
    } else
      Snapshots.merge(upserts, tableDir, keyCol, buckets, stage, statsCols,
        deleteKeys = deletes)
    true
  }

  /** Run the upsert sink over a streaming `updates` frame. `updates` must
    * carry `keyCol` and `versionCol` (plus the payload columns of the
    * target table); with `opCol` set, also an "upsert"/"delete" marker per
    * row — the full CDC-apply shape (inserts, updates, AND deletes) driven
    * off one change stream. */
  def run(spark: SparkSession, updates: DataFrame, tableDir: String,
          keyCol: String, versionCol: String, checkpointDir: String,
          buckets: Int = 8, statsCols: Seq[String] = Nil,
          opCol: Option[String] = None,
          trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val streamId = graft.io.Compact.streamInstanceId(checkpointDir)
    updates.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        upsertBatch(batch, tableDir, keyCol, versionCol, buckets,
          stage = s"upsert-$streamId-epoch-$epochId", statsCols = statsCols,
          opCol = opCol)
        ()
      }
      .start()
  }
}
