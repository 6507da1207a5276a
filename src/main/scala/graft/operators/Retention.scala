package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention (q184) — ONE code path for the batch query and
  * the streaming maintainer (StreamPipeline.retentionMaintain).
  *
  * The state is the distinct (user, day) ACTIVITY SET — everything
  * else (first-seen cohort day, cohort sizes, the triangle) derives
  * from it. Set union and per-user min are fully ORDER-INSENSITIVE,
  * so unlike the transition/funnel maintainers this one needs no
  * event-time-ordered arrival contract: late events, replays, and
  * arbitrary batch shuffles all converge to the same store
  * (RetentionStreamSpec pins a SHUFFLED split against batch q184).
  *
  * Scale shape: the store is user×active-days grain (bounded by
  * |users| × |days|, far below event grain); each micro-batch merge
  * is one distinct over (store ∪ batch-days) — a map-side-combined
  * shuffle of day-grain rows. The triangle is (days²)/2 rows at any
  * volume.
  */
object Retention {

  /** Distinct per-user active days from an event feed — the mergeable
    * state. Input needs (user_id, ts). */
  def activity(events: DataFrame): DataFrame =
    events.select(col("user_id"), to_date(col("ts")).as("day")).distinct()

  /** An activity store replayed AS events (midnight timestamps), so
    * the maintainer can fold store ∪ batch through [[activity]] — the
    * one shared pass. */
  def storeAsEvents(store: DataFrame): DataFrame =
    store.select(col("user_id"), col("day").cast("timestamp").as("ts"))

  /** q184's closing logic: the (cohort_day × day-offset) retention
    * triangle from an activity store. */
  def triangle(act: DataFrame): DataFrame = {
    def r4(c: org.apache.spark.sql.Column) =
      floor(c * lit(10000d) + lit(0.5d)) / lit(10000d)
    val first = act.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    val sizes = first.groupBy(col("cohort_day")).agg(count(lit(1)).as("cohort_users"))
    act
      .join(first, Seq("user_id"))
      .withColumn("offset_d", datediff(col("day"), col("cohort_day")))
      .groupBy(col("cohort_day"), col("offset_d"))
      .agg(count_distinct(col("user_id")).as("n_active"))
      .join(broadcast(sizes), Seq("cohort_day"))
      .select(col("cohort_day"), col("offset_d"), col("n_active"), col("cohort_users"),
        r4(col("n_active").cast("double") / col("cohort_users").cast("double"))
          .as("retention"))
  }
}
