package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-sessionization flags and within-session transition counts —
  * ONE code path for the batch queries (q182 sessions, q185
  * transition matrix) and the streaming maintainer
  * (StreamPipeline.transitionMaintain): the stream's per-batch counts
  * come from exactly this window logic over (carry ∪ batch), so
  * stream ≡ batch is structural, not coincidental.
  *
  * Scale note: per-USER windows — user cardinality grows with volume
  * in this domain (150 at sf0.01 → 1500 at sf0.1), so key-partitioned
  * sorts parallelize with the data; a single dominant bot user would
  * need the ChunkedFrame treatment (the flag is lag-1-local and the
  * session id is a running sum — both have chunked siblings).
  */
object Transitions {

  val GapUs: Long = 1800L * 1000000L // 30 minutes

  /** One per-user window pass: previous-event timestamp AND type,
    * the new-session flag on a > 30 min gap, and the session id
    * (running flag sum). */
  def flags(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .withColumn("new_s",
        when(col("prev").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev")) > GapUs, 1L).otherwise(0L))
      .withColumn("sid", sum(col("new_s"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Within-session consecutive-pair counts: exactly the rows whose
    * new-session flag is 0. */
  def counts(events: DataFrame): DataFrame =
    flags(events)
      .filter(col("new_s") === 0L)
      .groupBy(col("prev_type").as("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n_trans"))
}
