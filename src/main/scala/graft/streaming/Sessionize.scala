package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap sessionization as a CUSTOM stateful operator —
  * `flatMapGroupsWithState` with an EVENT-TIME timeout — emitting each
  * session exactly once, when it is provably complete.
  *
  * `session_window` (q18) gives the same grouping declaratively; this
  * operator is the template for session logic the built-in can't
  * express (per-session derived state, early emission rules, custom
  * merge semantics) and for the timeout discipline any long-running
  * keyed state needs at scale:
  *
  *  - state is ONE open session per key — O(active keys), not
  *    O(events); completed sessions leave state immediately;
  *  - a session closes in-stream when a same-key event arrives more
  *    than `gap` after the session's last event, and via
  *    `setTimeoutTimestamp(last + gap)` when the WATERMARK passes
  *    that point with no successor — quiet keys cannot pin state
  *    forever (the leak that kills week-long streaming jobs);
  *  - event-time (not processing-time) timeouts make the operator
  *    replay-deterministic: a checkpoint restart re-derives the same
  *    sessions because closure depends on data time, not wall time.
  *
  * Within-batch events are sorted by time before folding (micro-batch
  * iterators carry no order guarantee); cross-batch late events are
  * bounded by the input watermark, which must be at least `gap` for
  * out-of-order events to regroup correctly.
  */
object Sessionize {

  case class Ev(user_id: Long, ts: java.sql.Timestamp, value: Double) {
    def ts_ms: Long = ts.getTime
  }
  case class OpenSession(start_ms: Long, last_ms: Long, n: Long, sum: Double)
  case class Session(user_id: Long, session_start: java.sql.Timestamp,
                     session_end: java.sql.Timestamp, n_events: Long, sum_value: Double)

  private def close(key: Long, s: OpenSession, gapMs: Long): Session =
    Session(key, new java.sql.Timestamp(s.start_ms),
      // session_window semantics: end = last event + gap
      new java.sql.Timestamp(s.last_ms + gapMs), s.n, s.sum)

  private[streaming] def update(gapMs: Long)(
      key: Long, events: Iterator[Ev], state: GroupState[OpenSession]): Iterator[Session] = {
    if (state.hasTimedOut) {
      // watermark passed last+gap with no successor: the open session
      // is complete and no on-time event can extend it
      val done = close(key, state.get, gapMs)
      state.remove()
      Iterator.single(done)
    } else {
      val sorted = events.toArray.sortBy(_.ts_ms)
      var completed = List.empty[Session]
      var open = state.getOption
      sorted.foreach { e =>
        open match {
          case Some(s) if e.ts_ms > s.last_ms + gapMs =>
            completed ::= close(key, s, gapMs)
            open = Some(OpenSession(e.ts_ms, e.ts_ms, 1L, e.value))
          case Some(s) =>
            open = Some(OpenSession(math.min(s.start_ms, e.ts_ms),
              math.max(s.last_ms, e.ts_ms), s.n + 1, s.sum + e.value))
          case None =>
            open = Some(OpenSession(e.ts_ms, e.ts_ms, 1L, e.value))
        }
      }
      open.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.last_ms + gapMs)
      }
      completed.reverseIterator
    }
  }

  /** Completed sessions per user_id from a WATERMARKED stream with
    * `user_id`/`ts`/`value` columns. `gap` e.g. "30 minutes"; the
    * stream's watermark should be >= the expected disorder. */
  def sessions(spark: SparkSession, events: DataFrame, gapMs: Long): Dataset[Session] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // `ts` must pass through UNTRANSFORMED (even a no-op cast builds a
    // new expression and drops the event-time tag): the watermark rides
    // on the column, and EventTimeTimeout requires it to reach this
    // operator
    events
      .select(col("user_id").cast("long").as("user_id"), col("ts"),
        col("value").cast("double").as("value"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update(gapMs))
  }
}
