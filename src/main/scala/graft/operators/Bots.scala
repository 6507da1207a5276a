package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** q205's bot-likelihood cadence profile factored into mergeable
  * per-user state plus ONE shared closing, so the declared batch
  * query and the streaming maintainer (StreamPipeline.botMaintain /
  * botServe) are the same code path — the Rfm/Sessions pattern.
  *
  * State decomposition (all exactly mergeable under the ordered-
  * arrival contract the transition/paths maintainers already use):
  *
  *  - gap counters (n_events, n_sessions, n_gaps, Σgap, Σgap² in
  *    decimal(38,0)) are ADDITIVE once the session boundary decision
  *    is made — and the boundary decision only needs each user's
  *    LAST event carried into the next batch (the pathsBatch
  *    carry-row trick with one row instead of two);
  *  - the busiest-minute rate needs only (current minute, its count,
  *    max over CLOSED minutes): under ordered arrival a minute never
  *    reopens, so the state is three numbers per user, not a
  *    (user, minute) table. Serving takes greatest(closed, current).
  *
  * Reference anchor: the profile itself is q205's (BehaviorQueries);
  * the metronome rule (population sd < 1 s over ≥ 20 within-session
  * gaps) is documented there.
  */
object Bots {

  /** Per-user cadence counters over a Transitions.flags frame.
    * `countRow` restricts accounting to rows that may be counted —
    * batch passes lit(true); the streaming merge passes !__carried so
    * a carried marker row only SUPPLIES the lag, never re-counts. */
  def gapState(flagged: DataFrame, countRow: Column): DataFrame = {
    val gapUs = unix_micros(col("ts")) - unix_micros(col("prev"))
    val inSess = when(col("new_s") === 0L, gapUs)
    flagged.filter(countRow)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("new_s")).as("n_sessions"),
        count(inSess).as("n_gaps"),
        sum(inSess).as("sg"),
        sum((inSess * inSess).cast("decimal(38,0)")).as("sg2"))
  }

  /** Per-(user, minute) event counts — the peak-rate branch's base. */
  def minuteCounts(events: DataFrame): DataFrame =
    events.groupBy(col("user_id"), date_trunc("minute", col("ts")).as("m"))
      .agg(count(lit(1)).as("epm"))

  /** Whole-feed per-user state (the declared q205 path): gap counters
    * from the shared chunked session window + the minute-rate max. */
  def state(events: DataFrame): DataFrame =
    gapState(Transitions.flags(events, chunked = true), lit(true))
      .join(minuteCounts(events)
        .groupBy(col("user_id")).agg(max(col("epm")).as("epm_max")), Seq("user_id"))

  /** The shared closing: mean/population-sd of within-session gaps
    * (the q175 raw→central IEEE sequence), the documented metronome
    * rule. Expects (user_id, n_events, n_sessions, n_gaps, sg, sg2,
    * epm_max). */
  def profile(state: DataFrame): DataFrame = {
    def r4(c: Column) = floor(c * lit(10000d) + lit(0.5d)) / lit(10000d)
    def d(c: Column) = c.cast("double")
    val n    = d(col("n_gaps"))
    val mean = d(col("sg")) / n
    val sd   = sqrt(greatest(lit(0d), d(col("sg2")) / n - mean * mean))
    state.select(col("user_id"), col("n_events"), col("n_sessions"),
      col("n_gaps"), col("epm_max"),
      when(col("n_gaps") > 0, r4(mean / lit(1e6))).as("mean_gap_s"),
      when(col("n_gaps") > 0, r4(sd / lit(1e6))).as("sd_gap_s"),
      (col("n_gaps") >= 20 && sd < lit(1e6)).as("is_metronomic"))
  }
}
