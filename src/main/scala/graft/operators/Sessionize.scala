package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Gap-and-island sessionization (batch form): consecutive events of the same
  * user with inter-arrival gap ≤ `gapSeconds` form one session.
  *
  * Scale shape: ONE shuffle on the user key; both windows (lag + running sum)
  * and the final aggregate share that partitioning, so Catalyst plans a single
  * Exchange. Session count per user is unbounded-state-free — this is the
  * batch twin of the streaming `flatMapGroupsWithState` sessionizer
  * (graft.streaming.StreamSessionize), which must bound its state with an
  * event-time timeout instead.
  */
object Sessionize {

  /** events(userCol, tsCol timestamp) → (user, session_start, session_end,
    * n_events), one row per session. */
  def sessions(events: DataFrame, userCol: String, tsCol: String, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol))
    val run = Window.partitionBy(userCol).orderBy(col(tsCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(col(userCol), col(tsCol))
      .withColumn("prev_ts", lag(col(tsCol), 1).over(w))
      // exact integer microseconds — a seconds cast would truncate sub-second
      // timestamps and disagree with the oracle's epoch_us at gap boundaries
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          unix_micros(col(tsCol).cast("timestamp")) -
            unix_micros(col("prev_ts").cast("timestamp")) > gapSeconds * 1000000L, 1)
          .otherwise(0))
      .withColumn("sess_idx", sum("new_sess").over(run))
      .groupBy(col(userCol), col("sess_idx"))
      .agg(min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"))
      .drop("sess_idx")
  }
}
