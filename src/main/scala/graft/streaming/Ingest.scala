package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingest normalization for the tick stream.
  *
  * Raw wire schema (spark_stream_processor.py:61-73): string-typed
  * volume / change_percent / timestamp, double prices. The reference
  * reads CSV with positional binding, which silently maps the
  * producer's `percent_change` to the schema's `change_percent`
  * (SURVEY.md §1.2); our Kafka-JSON ingest binds by name, so the
  * rename is explicit here.
  *
  * Cleaning (P7-P10, spark_stream_processor.py:129-137): ISO string ->
  * timestamp, `%`-strip + cast for change_percent, numeric casts.
  * Volume is widened to long (not the reference's int) for 100 TB-safe
  * sums — documented deviation, SURVEY.md §1.3.
  */
object Ingest {

  /** The reference's declared raw schema, with `percent_change` as the
    * producer emits it. */
  val rawSchema: StructType = StructType(Seq(
    StructField("symbol", StringType, nullable = false),
    StructField("price", DoubleType),
    StructField("change", DoubleType),
    StructField("percent_change", StringType),
    StructField("volume", StringType),
    StructField("today_low", DoubleType),
    StructField("today_high", DoubleType),
    StructField("timestamp", StringType)
  ))

  /** Decode Kafka-shaped (key, value) JSON bytes into raw tick rows
    * (name-bound, so the producer field name is used, then renamed). */
  def fromKafkaJson(kafka: DataFrame): DataFrame =
    kafka
      .select(from_json(col("value").cast("string"), rawSchema).as("t"))
      .select(col("t.*"))

  /** Rows `clean` will lose: empty/null symbol (filtered explicitly)
    * or unparseable event time (window() later drops null timestamps
    * SILENTLY — at 100 TB silent loss is an incident, so pipelines
    * side-output these to a dead-letter sink instead). Returns the
    * RAW rows, unmodified, for replay after a parser fix. */
  def deadLetters(raw: DataFrame): DataFrame = {
    val named =
      if (raw.columns.contains("percent_change"))
        raw.withColumnRenamed("percent_change", "change_percent")
      else raw
    named.filter(col("symbol").isNull || col("symbol") === ""
      || to_timestamp(col("timestamp")).isNull)
  }

  /** P7-P10 cleaning: normalize names, parse event time, strip `%`,
    * cast numerics. Works on both batch and streaming frames. Rows
    * with unparseable timestamps keep flowing with a null event time
    * (captured by `deadLetters`; dropped by the windowed aggregate). */
  def clean(raw: DataFrame): DataFrame = {
    val named =
      if (raw.columns.contains("percent_change"))
        raw.withColumnRenamed("percent_change", "change_percent")
      else raw
    named
      .withColumn("timestamp", to_timestamp(col("timestamp")))
      .withColumn("price", col("price").cast(DoubleType))
      .withColumn("change", col("change").cast(DoubleType))
      .withColumn("change_percent",
        regexp_replace(col("change_percent"), "%", "").cast(DoubleType))
      .withColumn("volume", col("volume").cast(LongType))
      .withColumn("today_low", col("today_low").cast(DoubleType))
      .withColumn("today_high", col("today_high").cast(DoubleType))
      .filter(col("symbol").isNotNull && col("symbol") =!= "")
  }
}
