package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream interval join — event attribution: each CLICK
  * event is joined to every VIEW by the same user within `lagMaxS` seconds
  * BEFORE the click (the impressions⋈clicks shape of ad attribution, and the
  * last missing Structured Streaming surface next to the windowed agg,
  * dedup-in-watermark, sessionize, and curation twins).
  *
  * ONE function serves batch and stream: the join condition is an EQUI key
  * (user_id) plus a residual time-range predicate, so batch plans a plain
  * SortMergeJoin/broadcast on user_id — per-user pair count is bounded by
  * activity density × window, never corpus-quadratic — and streaming plans
  * Spark's StreamingSymmetricHashJoin. Watermarks are applied only when the
  * input IS a stream (a no-op wrapper on batch inputs would still widen the
  * plan); together with the time-range condition they bound BOTH join-state
  * buffers: a view older than watermark − lagMaxS can never match a future
  * click and is evicted, which is what makes the join runnable on an
  * unbounded ingest. Inner-join semantics — results emit as soon as both
  * sides arrive; the watermark governs state cleanup, not emission — so
  * stream output equals the batch join on the same rows (asserted in
  * StreamingSpec).
  *
  * Output: (click_id, view_id, user_id, lag_s) with lag_s an exact integer
  * second count (cross-engine hash-stable).
  */
object StreamJoin {

  /** `events` must carry (event_id, ts: timestamp, user_id, event_type).
    * `watermarkDelay` is the max expected out-of-orderness of EACH side's
    * event time (streaming only). */
  def attributeViews(events: DataFrame, lagMaxS: Long,
                     watermarkDelay: String = "1 hour"): DataFrame = {
    val wm = (df: DataFrame, tsCol: String) =>
      if (df.isStreaming) df.withWatermark(tsCol, watermarkDelay) else df
    val clicks = wm(events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("ts").as("click_ts"),
        col("user_id")), "click_ts")
    val views = wm(events.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("ts").as("view_ts"),
        col("user_id").as("v_user_id")), "view_ts")
    clicks.join(views,
        col("user_id") === col("v_user_id") &&
        col("view_ts") <= col("click_ts") &&
        col("view_ts") >= col("click_ts") - expr(s"INTERVAL $lagMaxS SECONDS"))
      .select(col("click_id"), col("view_id"), col("user_id"),
        (unix_timestamp(col("click_ts")) - unix_timestamp(col("view_ts")))
          .as("lag_s"))
  }
}
