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
  * iterators carry no order guarantee); the standing open session and
  * the batch's events are then merged as intervals — two pieces join
  * iff they are within `gap` — so a late event disjoint BEFORE the open
  * session becomes its own (immediately emitted) session instead of
  * silently widening the open one across a > `gap` void.
  *
  * Watermark discipline: with watermark delay <= `gap`, a late event
  * more than `gap` before the open session's start is always below the
  * watermark (the session's own events have advanced it past
  * start - gap) and Spark drops it upstream, so this operator matches
  * `session_window` exactly. With delay > `gap`, such stragglers DO
  * reach the operator; they emit as separate earlier sessions when
  * observed — the right grouping for pieces that never come within
  * `gap` of each other — though a later bridging event can no longer
  * re-merge an already-emitted fragment (the price of exactly-once
  * emission with O(1) state per key).
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
      // standard interval merge: the standing open session and each
      // event (as a singleton piece), sorted by start, merge iff within
      // `gap`. Unlike a left-to-right fold against the open session,
      // this groups stragglers older than the open session correctly.
      val pieces = (state.getOption.toList ++
        events.map(e => OpenSession(e.ts_ms, e.ts_ms, 1L, e.value)))
        .sortBy(_.start_ms)
      var merged = List.empty[OpenSession] // reverse chronological
      pieces.foreach { p =>
        merged match {
          case h :: t if p.start_ms <= h.last_ms + gapMs =>
            merged = OpenSession(math.min(h.start_ms, p.start_ms),
              math.max(h.last_ms, p.last_ms), h.n + p.n, h.sum + p.sum) :: t
          case _ =>
            merged = p :: merged
        }
      }
      merged match {
        case latest :: earlier =>
          state.update(latest)
          state.setTimeoutTimestamp(latest.last_ms + gapMs)
          earlier.reverseIterator.map(close(key, _, gapMs))
        case Nil => Iterator.empty // no state and an empty batch group
      }
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
