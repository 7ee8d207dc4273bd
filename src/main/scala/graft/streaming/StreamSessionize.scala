package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization — the custom-state Structured Streaming operator
  * (`flatMapGroupsWithState`, SURVEY §2 H streaming note): per-user sessions
  * with gap `gapSeconds`, state bounded by an EVENT-TIME timeout so a
  * long-running ingest cannot accumulate unbounded open sessions (the
  * streaming analog of the batch gap-and-island in operators.Sessionize).
  *
  * Emission contract (Append mode): a session row is emitted when it CLOSES —
  * either a same-user event arrives beyond the gap, or the watermark passes
  * session_end + gap (timeout). Closed sessions equal the batch operator's
  * output for the same input once the watermark has passed everything.
  */
object StreamSessionize {

  final case class Event(user_id: Long, ts: java.sql.Timestamp)
  final case class Session(user_id: Long, session_start: java.sql.Timestamp,
                           session_end: java.sql.Timestamp, n_events: Long)
  /** Open-session state (public: the state encoder's generated code needs a
    * visible constructor). */
  final case class Open(startMs: Long, endMs: Long, n: Long)

  def sessions(spark: SparkSession, events: Dataset[Event],
               gapSeconds: Long, watermark: String = "10 seconds"): Dataset[Session] = {
    import spark.implicits._
    val gapMs = gapSeconds * 1000L
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Open, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, it: Iterator[Event], state: GroupState[Open]) =>
          if (state.hasTimedOut) {
            // watermark passed end+gap: the open session is final — emit it
            val s = state.get
            state.remove()
            Iterator.single(Session(user, new java.sql.Timestamp(s.startMs),
              new java.sql.Timestamp(s.endMs), s.n))
          } else {
            val sorted = it.toArray.sortBy(_.ts.getTime)
            val closed = scala.collection.mutable.ArrayBuffer.empty[Session]
            var open = state.getOption
            for (e <- sorted) {
              val t = e.ts.getTime
              open match {
                case Some(o) if t - o.endMs <= gapMs =>
                  open = Some(Open(o.startMs, math.max(o.endMs, t), o.n + 1))
                case Some(o) =>
                  closed += Session(user, new java.sql.Timestamp(o.startMs),
                    new java.sql.Timestamp(o.endMs), o.n)
                  open = Some(Open(t, t, 1))
                case None =>
                  open = Some(Open(t, t, 1))
              }
            }
            open match {
              case Some(o) =>
                state.update(o)
                // state lives until the watermark passes the gap boundary;
                // clamped AFTER the current watermark — setTimeoutTimestamp
                // throws (killing the whole query) if handed a timestamp the
                // watermark has already passed. EventTimeTimeout drops rows
                // older than the watermark before this function, so endMs+gap
                // normally exceeds the watermark, but the boundary (an event
                // timestamped exactly at the watermark, or a gap of 0) is
                // exactly-equal — and "not later than" is the fatal condition
                state.setTimeoutTimestamp(
                  math.max(o.endMs + gapMs, state.getCurrentWatermarkMs + 1))
              case None => state.remove()
            }
            closed.iterator
          }
      }
  }
}
