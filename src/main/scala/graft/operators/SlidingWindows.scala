package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sliding (hopping) window aggregation + the windowed-metrics join.
  *
  * Reference: spark_stream_processor.py:164-221 — two sliding window
  * aggregates per symbol (15 min / 5 min and 1 h / 10 min; avg price,
  * sample stddev "volatility", sum volume) inner-joined on
  * (symbol, window_start). The reference declares the join over two
  * *streaming* aggregates, which Spark's UnsupportedOperationChecker
  * rejects; the batch form here is the exact intended semantics, and
  * graft.streaming.StreamPipeline implements the legal streaming
  * version via mergeable 5-minute partials.
  *
  * Window starts follow Spark's `window()` alignment: starts are
  * multiples of `slide` (epoch-anchored); every event lands in
  * duration/slide windows. `window_start` is emitted as epoch seconds
  * (BIGINT) so results are timezone-representation-free.
  *
  * Scale: one shuffle per agg on (key, window) after an in-map explode
  * of duration/slide window assignments; partial aggregation applies.
  * The join of the two aggregates is tiny relative to input (one row
  * per key × window) — AQE will broadcast the smaller side.
  */
object SlidingWindows {

  /** Sliding-window metrics over `valueCol` keyed by `keyCol`.
    * Output: key, window_start (epoch sec), avg_value, volatility
    * (sample stddev, null for 1-row windows), sum_value, n_events.
    *
    * Money exactness: sum and avg run through fixed-point decimal
    * (scale 2 — tick prices are cents), so they are EXACT and
    * independent of partitioning/summation order — a distributed run
    * reproduces bit-for-bit on any cluster size. Double sums would
    * drift in the last ulp with partition count, which matters both
    * for reproducibility at 100 TB and for oracle comparison.
    * Volatility keeps double Welford stddev (its true value is
    * irrational; order noise cannot sit on a decimal boundary). */
  def metrics(df: DataFrame, keyCol: Column, keyName: String, tsCol: Column, valueCol: Column,
              duration: String, slide: String, suffix: String,
              includeMinMax: Boolean = false): DataFrame = {
    val base = Seq(
      (sum(valueCol.cast("decimal(18,2)")).cast("double") / count(lit(1))).as(s"avg_value$suffix"),
      stddev(valueCol).as(s"volatility$suffix"),
      sum(valueCol.cast("decimal(18,2)")).cast("double").as(s"sum_value$suffix"),
      count(lit(1)).as(s"n_events$suffix")
    ) ++ (if (includeMinMax)
      // A4: the reference declares then comments out per-window
      // min(today_low)/max(today_high) (spark_stream_processor.py:
      // 174-175) — available behind this flag
      Seq(min(valueCol).as(s"min_value$suffix"), max(valueCol).as(s"max_value$suffix"))
    else Nil)
    df.groupBy(keyCol.as(keyName), window(tsCol, duration, slide).as("__w"))
      .agg(base.head, base.tail: _*)
      .withColumn("window_start", col("__w.start").cast("long"))
      .withColumn(s"window_end$suffix", col("__w.end").cast("long"))
      .drop("__w")
  }

  /** The J1 join: short-window metrics ⋈ long-window metrics on
    * (key, window_start). Only window starts on both slide grids
    * survive the inner join — a documented property of the reference
    * (15m/5m vs 1h/10m align only every 10 minutes). */
  def joined(df: DataFrame, keyCol: Column, keyName: String, tsCol: Column, valueCol: Column): DataFrame = {
    val short = metrics(df, keyCol, keyName, tsCol, valueCol, "15 minutes", "5 minutes", "_15m")
    val long  = metrics(df, keyCol, keyName, tsCol, valueCol, "1 hour", "10 minutes", "_1h")
    short
      .join(long, Seq(keyName, "window_start"), "inner")
      .select(
        col(keyName),
        col("window_start"),
        col("window_end_15m").as("window_15m_end"),
        col("window_end_1h").as("window_1h_end"),
        col("avg_value_15m").as("moving_avg_price_15m"),
        col("avg_value_1h").as("moving_avg_price_1h"),
        col("volatility_15m").as("price_volatility_15m"),
        col("volatility_1h").as("price_volatility_1h"),
        col("sum_value_15m").as("total_volume_15m"),
        col("sum_value_1h").as("total_volume_1h")
      )
  }
}
