package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot grouping keys.
  *
  * AQE's skew-join handling covers joins; for aggregations over a
  * pathological hot key (one symbol carrying most of the volume — a
  * realistic tick-stream shape), `saltedAgg` runs the classic
  * two-stage pattern: a random-ish salt spreads the hot key over
  * `saltBuckets` reducers for the partial stage, and a second, cheap
  * aggregation over (keys) merges the per-salt partials. Only
  * algebraic aggregates compose this way — which is exactly what the
  * engine's partial-aggregation design (StreamPipeline) produces.
  *
  * The salt is derived from a hash of stable row content when
  * `saltCol` is given (deterministic, replayable) — never from rand()
  * in pipelines that must be idempotent.
  */
object Skew {

  /** Two-stage count/sum aggregation with salting. `sumCols` maps
    * output name -> column to sum. */
  def saltedAgg(df: DataFrame, keys: Seq[String], saltSource: Column, saltBuckets: Int,
                sumCols: Map[String, Column]): DataFrame = {
    val salted = df.withColumn("__salt", pmod(xxhash64(saltSource), lit(saltBuckets.toLong)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(
        count(lit(1)).as("__n"),
        sumCols.toSeq.map { case (n, c) => sum(c).as(s"__s_$n") }: _*
      )
    partial
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("__n")).as("n"),
        sumCols.keys.toSeq.map(n => sum(col(s"__s_$n")).as(n)): _*
      )
  }

  /** Round-16: fan a NARROW scan out to the session's parallelism —
    * parquet can't split below row-group boundaries, so a small file
    * pins every operator fused into its scan stage (explode, hashing,
    * heavy per-row expressions) to a handful of tasks however many
    * cores are idle (guide §2.5 "input skew: fix at the source ...
    * otherwise repartition immediately after the read"). ADAPTIVE:
    * a no-op whenever the scan already meets the session's
    * parallelism, which is every real deployment — the round-robin
    * exchange exists only in the small-file regime where its cost is
    * trivially small. Use on inputs whose downstream per-row work
    * dominates the scan (profiling stacks, tokenizers), not on thin
    * partial-agg paths. */
  def fanOut(df: DataFrame): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    // Round-17 guard (r16 advice): `.rdd` on a plan containing an
    // Exchange would — with AQE on — materialize every upstream query
    // stage eagerly at plan-CONSTRUCTION time, and the repartitioned
    // frame would recompute them at action time. fanOut exists for
    // raw scans only; a post-exchange frame is already spread to
    // shuffle.partitions (= session parallelism), so return it
    // unchanged rather than probe it.
    val exchangeFree = !df.queryExecution.sparkPlan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.Exchange])
    if (exchangeFree && df.rdd.getNumPartitions < cores) df.repartition(cores) else df
  }
}
