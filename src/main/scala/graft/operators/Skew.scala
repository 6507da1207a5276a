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
}
