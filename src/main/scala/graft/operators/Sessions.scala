package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-user session summaries (q182) as maintainable state — the
  * closed/provisional decomposition (the attribution-maintainer
  * pattern): closed sessions fold into per-user AGGREGATES
  * (count / event sum / max size / exact duration-µs sum — all
  * merge-by-addition or max), while the OPEN (last) session rides as
  * explicit state (start ts, last ts + id, event count) that the next
  * batch either extends (gap ≤ 30 min) or closes. Serving combines
  * closed aggregates with the open session exactly the way a batch
  * run treats the feed's last session — so the served summary equals
  * declared q182 bit for bit under any event-time-ordered split
  * (SessionsStreamSpec).
  *
  * The store is ONE row per user:
  *   (user_id, closed_n, closed_events, closed_max_ev, closed_sum_us,
  *    open_start_ts, open_last_ts, open_last_event_id, open_n_ev)
  * — user-grain forever, never event- or session-grain.
  */
object Sessions {

  /** One micro-batch fold: (previous store ∪ batch) → next store.
    * The carried open session joins the frame as a marker row at its
    * last event (ordered arrival ⇒ it sorts first for its user), so
    * the shared [[Transitions.flags]] gap logic decides continuation
    * vs close exactly as the batch query would. */
  def fold(store: Option[DataFrame], batch: DataFrame): DataFrame = {
    val b = batch.select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("__carry", lit(false))
    val uni = store match {
      case Some(st) => b.unionByName(st.select(col("user_id"),
        col("open_last_ts").as("ts"), col("open_last_event_id").as("event_id"),
        lit(true).as("__carry")))
      case None => b
    }
    val flagged = Transitions.flags(uni.withColumn("event_type", lit("")), chunked = false)
    // per-(user, session): size, span, carry marker
    val sess = flagged.groupBy(col("user_id"), col("sid"))
      .agg(count(lit(1)).as("n_rows"),
        max(when(col("__carry"), 1L).otherwise(0L)).as("has_carry"),
        min(col("ts")).as("min_ts"), max(col("ts")).as("max_ts"),
        max(struct(col("ts"), col("event_id"))).getField("event_id").as("last_eid"))
      .withColumn("last_sid",
        max(col("sid")).over(org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))))
      .localCheckpoint(true) // session-grain; two consumers below (closed delta + open)
    // graft the carried open-session state onto its continuation
    val st0 = store.getOrElse(emptyStore(batch))
    val withOpen = sess.join(st0, Seq("user_id"), "left")
      .withColumn("s_start",
        when(col("has_carry") === 1L, col("open_start_ts")).otherwise(col("min_ts")))
      .withColumn("s_n_ev",
        (col("n_rows") - col("has_carry"))
          + when(col("has_carry") === 1L, col("open_n_ev")).otherwise(lit(0L)))
      .withColumn("s_dur_us",
        unix_micros(col("max_ts")) - unix_micros(col("s_start")))
    // newly closed sessions fold into the per-user aggregates
    val closedDelta = withOpen.filter(col("sid") < col("last_sid"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("d_n"), sum(col("s_n_ev")).as("d_events"),
        max(col("s_n_ev")).as("d_max_ev"), sum(col("s_dur_us")).as("d_sum_us"))
    val open = withOpen.filter(col("sid") === col("last_sid"))
      .select(col("user_id"),
        coalesce(col("closed_n"), lit(0L)).as("closed_n"),
        coalesce(col("closed_events"), lit(0L)).as("closed_events"),
        coalesce(col("closed_max_ev"), lit(0L)).as("closed_max_ev"),
        coalesce(col("closed_sum_us"), lit(0L)).as("closed_sum_us"),
        col("s_start").as("open_start_ts"), col("max_ts").as("open_last_ts"),
        col("last_eid").as("open_last_event_id"), col("s_n_ev").as("open_n_ev"))
    open.join(closedDelta, Seq("user_id"), "left")
      .select(col("user_id"),
        (col("closed_n") + coalesce(col("d_n"), lit(0L))).as("closed_n"),
        (col("closed_events") + coalesce(col("d_events"), lit(0L))).as("closed_events"),
        greatest(col("closed_max_ev"), coalesce(col("d_max_ev"), lit(0L))).as("closed_max_ev"),
        (col("closed_sum_us") + coalesce(col("d_sum_us"), lit(0L))).as("closed_sum_us"),
        col("open_start_ts"), col("open_last_ts"), col("open_last_event_id"),
        col("open_n_ev"))
  }

  private def emptyStore(like: DataFrame): DataFrame = {
    val s = like.sparkSession
    import s.implicits._
    Seq.empty[(Long, Long, Long, Long, Long, java.sql.Timestamp, java.sql.Timestamp, Long, Long)]
      .toDF("user_id", "closed_n", "closed_events", "closed_max_ev", "closed_sum_us",
        "open_start_ts", "open_last_ts", "open_last_event_id", "open_n_ev")
  }

  /** q182's per-user summary from a store: the open session counts as
    * a session, exactly as a batch run counts the feed's last
    * session. */
  def summary(store: DataFrame): DataFrame = {
    def r4(c: org.apache.spark.sql.Column) =
      floor(c * lit(10000d) + lit(0.5d)) / lit(10000d)
    store.select(col("user_id"),
      (col("closed_n") + 1L).as("n_sessions"),
      (col("closed_events") + col("open_n_ev")).as("total_events"),
      greatest(col("closed_max_ev"), col("open_n_ev")).as("max_session_events"),
      (col("closed_sum_us")
        + (unix_micros(col("open_last_ts")) - unix_micros(col("open_start_ts"))))
        .as("sum_us"))
      .select(col("user_id"), col("n_sessions"), col("total_events"),
        col("max_session_events"),
        r4(col("sum_us").cast("double") / col("n_sessions").cast("double") / lit(1e6))
          .as("avg_session_secs"))
  }
}
