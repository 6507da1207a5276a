package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Strict-order funnel (view → click → purchase) — ONE code path for
  * the batch query (q183) and the streaming maintainer
  * (StreamPipeline.funnelMaintain): the stream folds each micro-batch
  * through exactly [[stageTimes]] over (carry-as-events ∪ batch), so
  * stream ≡ batch is structural (FunnelStreamSpec pins exact equality
  * of the 4-row summary under any batch split).
  *
  * The per-user state (first view, first qualifying click, first
  * qualifying purchase) is MERGEABLE under the feed's event-time-
  * ordered arrival contract (the transitionMaintain assumption): new
  * events never precede the carried stage times, so re-running the
  * gating over the carried times replayed AS events plus the new
  * batch reproduces the full-history result — a carried click is by
  * construction after the carried view, and a new click qualifies
  * against the carried view exactly as it would against the full
  * history.
  *
  * Scale shape: three partial-agg shuffles on user_id plus user-keyed
  * joins (user cardinality scales with volume — well-distributed);
  * the summary is 4 rows from one aggregate over the user-grain
  * store.
  */
object Funnel {

  /** Per-user funnel state: one row per user with ANY event;
    * `t_view` = first view, `t_click` = first click strictly after
    * `t_view`, `t_purch` = first purchase strictly after `t_click`
    * (nulls where the user never reached the stage). Input needs
    * (user_id, ts, event_type); rows of other event types count for
    * presence only. */
  def stageTimes(events: DataFrame): DataFrame = {
    val v = events.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
    val c = events.filter(col("event_type") === "click").join(v, Seq("user_id"))
      .filter(col("ts") > col("t_view"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_click"))
    val p = events.filter(col("event_type") === "purchase").join(c, Seq("user_id"))
      .filter(col("ts") > col("t_click"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_purch"))
    events.select(col("user_id")).distinct()
      .join(v, Seq("user_id"), "left")
      .join(c, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
  }

  /** q183's closing arithmetic: the 4-row funnel summary (stage
    * counts, step conversion, conversion from the top) from a
    * [[stageTimes]] store. */
  def summary(st: DataFrame): DataFrame = {
    val row = st.agg(count(lit(1)).as("n0"),
      count(col("t_view")).as("n1"),
      count(col("t_click")).as("n2"),
      count(col("t_purch")).as("n3"))
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    def r4(c: org.apache.spark.sql.Column) =
      floor(c * lit(10000d) + lit(0.5d)) / lit(10000d)
    row.select(explode(array(
        struct(lit(1).as("stage_no"), lit("any_event").as("stage"),
          col("n0").as("n_users"),
          lit(null).cast("double").as("pct_prev"),
          when(col("n0") > 0, r4(d(col("n0")) / d(col("n0")))).as("pct_first")),
        struct(lit(2).as("stage_no"), lit("view").as("stage"),
          col("n1").as("n_users"),
          when(col("n0") > 0, r4(d(col("n1")) / d(col("n0")))).as("pct_prev"),
          when(col("n0") > 0, r4(d(col("n1")) / d(col("n0")))).as("pct_first")),
        struct(lit(3).as("stage_no"), lit("click_after_view").as("stage"),
          col("n2").as("n_users"),
          when(col("n1") > 0, r4(d(col("n2")) / d(col("n1")))).as("pct_prev"),
          when(col("n0") > 0, r4(d(col("n2")) / d(col("n0")))).as("pct_first")),
        struct(lit(4).as("stage_no"), lit("purchase_after_click").as("stage"),
          col("n3").as("n_users"),
          when(col("n2") > 0, r4(d(col("n3")) / d(col("n2")))).as("pct_prev"),
          when(col("n0") > 0, r4(d(col("n3")) / d(col("n0")))).as("pct_first")))).as("r"))
      .select(col("r.stage_no").as("stage_no"), col("r.stage").as("stage"),
        col("r.n_users").as("n_users"), col("r.pct_prev").as("pct_prev"),
        col("r.pct_first").as("pct_first"))
  }

  /** q191's closing arithmetic: among completed funnels, the first-
    * view → purchase latency distribution — count, mean from an exact
    * decimal sum, and exact discrete median / P90 selected by
    * [[ChunkedFrame.globalRank]] (keys × day-buckets parallelism, no
    * single-task sort at any user count). Serves from a maintained
    * [[stageTimes]] store as-is: the store carries exactly the
    * (t_view, t_purch) pairs the batch query derives. */
  def timeToConvert(st: DataFrame): DataFrame = {
    def r4(c: org.apache.spark.sql.Column) =
      floor(c * lit(10000d) + lit(0.5d)) / lit(10000d)
    val durs = st.filter(col("t_purch").isNotNull)
      .select(col("user_id"),
        (unix_micros(col("t_purch")) - unix_micros(col("t_view"))).as("dur_us"))
      .withColumn("__k", lit(1))
    val ranked = ChunkedFrame.globalRank(
      durs, "__k", expr("dur_us DIV 86400000000"), Seq("dur_us", "user_id"))
      .withColumn("rn", col("__g") + 1)
    val cnt = durs.agg(count(lit(1)).as("n_conv"),
      sum(col("dur_us").cast("decimal(38,0)")).as("sum_us"))
    val med = ranked.join(broadcast(cnt), expr("rn = (n_conv + 1) DIV 2"))
      .select(col("dur_us").as("med_us"))
    val p90 = ranked.join(broadcast(cnt), expr("rn = (n_conv * 9 + 9) DIV 10"))
      .select(col("dur_us").as("p90_us"))
    cnt.crossJoin(broadcast(med)).crossJoin(broadcast(p90))
      .select(col("n_conv"),
        r4(col("sum_us").cast("double") / col("n_conv").cast("double") / lit(1e6))
          .as("mean_secs"),
        r4(col("med_us").cast("double") / lit(1e6)).as("median_secs"),
        r4(col("p90_us").cast("double") / lit(1e6)).as("p90_secs"))
  }

  /** A [[stageTimes]] store replayed AS events, so the maintainer can
    * run the store ∪ batch through the one shared gating pass: each
    * carried stage time becomes one event of its stage's type; a user
    * who reached no stage contributes a presence-only row (null ts,
    * type "presence") so the any-event count survives the round trip. */
  def storeAsEvents(store: DataFrame): DataFrame = {
    def stage(t: String, ev: String) = store.filter(col(t).isNotNull)
      .select(col("user_id"), col(t).as("ts"), lit(ev).as("event_type"))
    stage("t_view", "view")
      .unionByName(stage("t_click", "click"))
      .unionByName(stage("t_purch", "purchase"))
      .unionByName(store.filter(col("t_view").isNull)
        .select(col("user_id"), lit(null).cast("timestamp").as("ts"),
          lit("presence").as("event_type")))
  }
}
