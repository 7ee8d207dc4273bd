package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization — the custom-state Structured Streaming operator
  * (`flatMapGroupsWithState`, SURVEY §2 H streaming note): per-user sessions
  * with gap `gapSeconds`, state bounded by an EVENT-TIME timeout so a
  * long-running ingest cannot accumulate unbounded open sessions (the
  * streaming analog of the batch gap-and-island in operators.Sessionize).
  *
  * Design: events are BUFFERED per user until the watermark proves their
  * session final, then gap-split with exactly the batch operator's integer
  * microsecond arithmetic. Eagerly folding each event into one running open
  * session (the obvious implementation) is WRONG under the reordering the
  * watermark explicitly allows: an in-watermark event EARLIER than the open
  * session start would be silently absorbed (the signed gap test passes for
  * any t ≤ end) instead of lowering the start or forming its own earlier
  * session — diverging from the batch output the contract promises to equal.
  *
  * Emission contract (Append mode): a session is emitted once the watermark
  * passes session_end + gap — from that point no admissible event (all
  * arrivals are ≥ watermark) can extend it or merge anything into it. Closed
  * sessions equal the batch operator's output for the same input once the
  * watermark has passed everything. State per user is bounded by the
  * watermark horizon (events within `watermark` of the stream head).
  */
object StreamSessionize {

  final case class Event(user_id: Long, ts: java.sql.Timestamp)
  final case class Session(user_id: Long, session_start: java.sql.Timestamp,
                           session_end: java.sql.Timestamp, n_events: Long)
  /** Buffered event times in MICROSECONDS (public: the state encoder's
    * generated code needs a visible constructor). Micros, not millis — the
    * batch twin deliberately computes exact unix_micros so gap boundaries on
    * sub-millisecond timestamps agree with the oracle. */
  final case class Buf(us: Array[Long])

  private def toMicros(ts: java.sql.Timestamp): Long =
    math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L

  private def toTs(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  def sessions(spark: SparkSession, events: Dataset[Event],
               gapSeconds: Long, watermark: String = "10 seconds"): Dataset[Session] = {
    import spark.implicits._
    val gapUs = gapSeconds * 1000000L
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Buf, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, it: Iterator[Event], state: GroupState[Buf]) =>
          val incoming =
            if (state.hasTimedOut) Array.empty[Long]
            else it.map(e => toMicros(e.ts)).toArray
          val buf = state.getOption.map(_.us).getOrElse(Array.empty[Long]) ++ incoming
          if (buf.isEmpty) { state.remove(); Iterator.empty }
          else {
            val wmUs = state.getCurrentWatermarkMs * 1000L
            val sorted = buf.sorted
            // gap-split islands over the full in-watermark buffer — identical
            // arithmetic to the batch operator (split when t − prevEnd > gap)
            val islands = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
            var s = 0
            var i = 1
            while (i < sorted.length) {
              if (sorted(i) - sorted(i - 1) > gapUs) { islands += ((s, i - 1)); s = i }
              i += 1
            }
            islands += ((s, sorted.length - 1))
            // final iff watermark passed end+gap: every future event arrives
            // ≥ watermark, so it can neither extend this island nor bridge
            // into it (bridging would need t ≤ end + gap < watermark)
            val (done, kept) = islands.partition { case (_, e) => sorted(e) + gapUs < wmUs }
            val out = done.map { case (a, b) =>
              Session(user, toTs(sorted(a)), toTs(sorted(b)), (b - a + 1).toLong)
            }
            if (kept.isEmpty) state.remove()
            else {
              val held = kept.flatMap { case (a, b) => sorted.slice(a, b + 1) }.toArray
              state.update(Buf(held))
              // wake when the EARLIEST retained island becomes final; the
              // flush is idempotent, so ms rounding at the boundary just
              // costs one extra no-op wakeup. Clamped after the current
              // watermark — setTimeoutTimestamp throws (killing the whole
              // query) if handed a timestamp the watermark already passed.
              val nextMs = kept.map { case (_, e) => sorted(e) + gapUs }.min / 1000L + 1L
              state.setTimeoutTimestamp(
                math.max(nextMs, state.getCurrentWatermarkMs + 1))
            }
            out.iterator
          }
      }
  }
}
