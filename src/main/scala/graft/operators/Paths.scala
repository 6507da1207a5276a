package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Within-session navigation trigrams — ONE code path for the batch
  * query (q204 session path mining) and the streaming maintainer
  * (StreamPipeline.pathsMaintain): both run [[triples]] over a
  * session-flagged frame (the shared Transitions gap logic), so
  * stream ≡ batch is structural.
  *
  * The maintainer's carry is the last TWO events per user: a trigram
  * needs three rows, so no trigram can form entirely inside the
  * carry — every NEW trigram in (carry ∪ batch) terminates at a batch
  * row, which makes incremental counting exact under the event-time-
  * ordered arrival contract (the transitionMaintain contract; the
  * terminal-row carry filter also makes a late-arrival violation
  * under-count rather than double-count).
  */
object Paths {

  /** Adds step1/step2/step3 to every row that terminates a
    * within-session trigram (lag(1) + lag(2) in ONE (user, sid)
    * window pass — the skew-safe session-bounded partition); keeps
    * the input columns so callers can filter on row provenance. */
  def triples(flags: DataFrame): DataFrame = {
    val wOrd = Window.partitionBy(col("user_id"), col("sid"))
      .orderBy(col("ts"), col("event_id"))
    flags
      .withColumn("step2", lag(col("event_type"), 1).over(wOrd))
      .withColumn("step1", lag(col("event_type"), 2).over(wOrd))
      .filter(col("step1").isNotNull)
      .withColumn("step3", col("event_type"))
  }

  /** Exact trigram counts — ≤ |types|³ rows at any volume. */
  def countTriples(tri: DataFrame): DataFrame =
    tri.groupBy(col("step1"), col("step2"), col("step3"))
      .agg(count(lit(1)).as("n_paths"))

  /** q204's closing: support shares over the (bounded) count table.
    * The unpartitioned window touches ≤ |types|³ rows. */
  def close(counts: DataFrame): DataFrame = {
    val support = floor(col("n_paths").cast("double") / col("total").cast("double")
      * lit(10000d) + lit(0.5d)) / lit(10000d)
    counts
      .withColumn("total", sum(col("n_paths")).over(Window.partitionBy()))
      .select(col("step1"), col("step2"), col("step3"), col("n_paths"),
        support.as("support"))
  }
}
