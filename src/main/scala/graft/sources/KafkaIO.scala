package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Kafka wire-format shaping (S2/S3/S4/S7).
  *
  * The reference producers JSON-serialize each record with the entity
  * key as the Kafka key (stream_data_producer.py:112-142,
  * batch_data_producer.py:106-137); consumers json.loads the value
  * (realtime_data_consumer.py:92). In-engine both directions are
  * columnar: to_json(struct(...)) / from_json(value, schema) — and,
  * unlike the reference's positional CSV hop, binding is BY NAME, so
  * the producer-side field name normalization lives in
  * graft.streaming.Ingest.
  *
  * The `format("kafka")` source/sink itself is attached by the caller
  * (the connector jar ships with the cluster, not this library):
  *   toWire(df, $"symbol").writeStream.format("kafka")
  *     .option("kafka.bootstrap.servers", ...).option("topic", ...)
  *   fromWire(spark.readStream.format("kafka")...load(), schema)
  */
object KafkaIO {

  /** Encode rows to Kafka (key, value) wire shape: key = `keyCol` as
    * string, value = JSON of ALL columns (the reference's message body
    * repeats the key field — stream_data_producer.py:99-108). */
  def toWire(df: DataFrame, keyCol: Column): DataFrame =
    df.select(keyCol.cast("string").as("key"),
      to_json(struct(df.columns.map(col).toIndexedSeq: _*)).as("value"))

  /** Decode Kafka (key, value) rows by name against `schema`. Rows
    * whose value fails to parse yield nulls (dead-letter them upstream
    * with `filter(col("symbol").isNull)` if needed). */
  def fromWire(kafka: DataFrame, schema: StructType): DataFrame =
    kafka
      .select(from_json(col("value").cast("string"), schema).as("r"))
      .select(col("r.*"))
}
