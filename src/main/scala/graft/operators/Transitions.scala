package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-sessionization flags and within-session transition counts —
  * ONE code path for the batch queries (q182 sessions, q185
  * transition matrix, q190 session lift) and the streaming maintainer
  * (StreamPipeline.transitionMaintain): the stream's per-batch counts
  * come from exactly this window logic over (carry ∪ batch), so
  * stream ≡ batch is structural, not coincidental.
  *
  * TWO bitwise-equal evaluation strategies (TransitionsChunkedSpec
  * pins chunked ≡ direct on both testdata corpora):
  *
  *  - [[flagsDirect]] — one `Window.partitionBy(user_id)` pass. Per-
  *    key parallelism: each user's ENTIRE history sorts in one task.
  *    Right for micro-batch-sized frames (the streaming maintainer's
  *    carry ∪ batch) and for feeds whose key cardinality grows with
  *    volume.
  *  - [[flagsChunked]] — the ChunkedFrame two-level idiom. The lag-1
  *    flag is chunk-local-with-halo ([[ChunkedFrame.withTrailingEval]],
  *    halo 1) and the session id is a running flag sum
  *    ([[ChunkedFrame.withRunningSum]] — exact long addition, so the
  *    split evaluation reassociates bitwise). Parallelism is
  *    volume/blockSize, NOT per-key: a single bot user carrying 50%
  *    of the feed — the realistic skew in event data — costs two
  *    extra shuffles instead of serializing that user's history into
  *    one task (the q108/q109 dominant-key ceiling). The batch
  *    queries route here unconditionally: at 100 TB a dominant key is
  *    when the answer matters most, and the chunked plan is
  *    bitwise-identical at any scale.
  *
  * Chunk granularity is `date_trunc("hour", ts)` — monotone in the
  * (ts, event_id) order, and the (user, hour) offset table stays
  * broadcastable (bounded by keys × hours, one row per NONEMPTY
  * pair).
  */
object Transitions {

  val GapUs: Long = 1800L * 1000000L // 30 minutes

  /** One per-user window pass: previous-event timestamp AND type,
    * the new-session flag on a > 30 min gap, and the session id
    * (running flag sum). `chunked` selects the evaluation strategy
    * (identical output bit for bit — see class doc). */
  def flags(events: DataFrame, chunked: Boolean = false): DataFrame =
    if (chunked) flagsChunked(events) else flagsDirect(events)

  /** Direct single-window evaluation — per-key-history tasks. */
  def flagsDirect(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    withNewSessionFlag(events
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w)))
      .withColumn("sid", sum(col("new_s"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Two-level evaluation — volume-proportional tasks, immune to a
    * dominant key. Bitwise equal to [[flagsDirect]]: the lag is
    * exact under the halo contract, the flag is per-row arithmetic,
    * and the running sum is over exact longs (reassociation-safe). */
  def flagsChunked(events: DataFrame): DataFrame = {
    val hour = date_trunc("hour", col("ts"))
    val lagged = ChunkedFrame.withTrailingEval(
      events, "user_id", hour, Seq("ts", "event_id"), haloWidth = 1) { (d, w) =>
      d.withColumn("prev", lag(col("ts"), 1).over(w))
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
    }
    ChunkedFrame.withRunningSum(withNewSessionFlag(lagged),
      "user_id", hour, Seq("ts", "event_id"), "new_s", "sid")
  }

  /** The gap flag itself — shared per-row arithmetic over the lagged
    * columns, so the two strategies cannot drift. */
  private def withNewSessionFlag(lagged: DataFrame): DataFrame =
    lagged.withColumn("new_s",
      when(col("prev").isNull ||
        unix_micros(col("ts")) - unix_micros(col("prev")) > GapUs, 1L).otherwise(0L))

  /** Within-session consecutive-pair counts: exactly the rows whose
    * new-session flag is 0. */
  def counts(events: DataFrame, chunked: Boolean = false): DataFrame =
    flags(events, chunked)
      .filter(col("new_s") === 0L)
      .groupBy(col("prev_type").as("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n_trans"))
}
