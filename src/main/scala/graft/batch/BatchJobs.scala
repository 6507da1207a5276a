package graft.batch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Ohlcv}

/** The reference's batch pipeline (spark_batch_processor.py:42-153) as
  * pure DataFrame transforms: dedup -> daily OHLCV rollup ->
  * daily_change -> the declared 8-column projection, plus the
  * partitioned writers (S9).
  */
object BatchJobs {

  /** Daily metrics with the reference's declared output schema
    * (load_to_snowflake.py:72-85). Deterministic open/close via the
    * `order` columns (the reference's unordered first/last is
    * nondeterministic — SURVEY.md §2 A5); the input is deduped on
    * (symbol, date) first, exactly as spark_batch_processor.py:83. */
  def dailyMetrics(bars: DataFrame, order: Seq[Column]): DataFrame = {
    val deduped = Dedup.keepFirst(bars, Seq("symbol", "date"), order)
    Ohlcv.rollup(
      deduped,
      keys = Seq(col("symbol"), col("date")),
      keyNames = Seq("symbol", "date"),
      valueCol = col("close"),
      order = order,
      volCol = Some(col("volume"))
    ).join(
      // open/high/low come from their own source columns per the
      // reference (first(open), max(high), min(low)), not from close
      deduped.groupBy(col("symbol"), col("date")).agg(
        first(col("open")).as("daily_open"),
        max(col("high")).as("daily_high"),
        min(col("low")).as("daily_low")
      ),
      Seq("symbol", "date")
    ).select(
      col("symbol"), col("date"),
      col("daily_open"), col("daily_high"), col("daily_low"),
      col("volume").as("daily_volume"),
      col("close").as("daily_close"),
      Ohlcv.dailyChange(col("daily_open"), col("close")).as("daily_change")
    )
  }

  /** S9: overwrite CSV partitioned by symbol under a date=... path. */
  def writeDaily(df: DataFrame, basePath: String, date: String): Unit =
    df.write
      .option("header", "true")
      .partitionBy("symbol")
      .mode("overwrite")
      .csv(s"$basePath/date=$date")

  /** S8: append parquet partitioned by symbol. */
  def writeProcessed(df: DataFrame, path: String): Unit =
    df.write.mode("append").partitionBy("symbol").parquet(path)
}
