package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV ingestion (S6/S7) with the reference's two modes, plus the
  * partition-pruning-friendly layout.
  *
  * POSITIONAL BINDING is load-bearing (SURVEY.md §1.2): with a
  * user-supplied schema and header=true, Spark CSV skips the header
  * row and binds columns BY POSITION (default enforceSchema=true) —
  * which is how the reference survives the producer emitting
  * `percent_change` while the schema says `change_percent`
  * (stream_data_producer.py:103 vs spark_stream_processor.py:68).
  * `readFixed` reproduces that contract and CsvSourceSpec pins it.
  */
object CsvSource {

  /** Fixed-schema read, positional binding (spark_stream_processor.py:
    * 102-126 batch twin). */
  def readFixed(spark: SparkSession, schema: StructType, path: String): DataFrame =
    spark.read
      .schema(schema)
      .option("header", "true")
      .option("enforceSchema", "true")
      .csv(path)

  /** Schema-inference read (spark_batch_processor.py:58-60). Note the
    * inference pass costs one extra full scan — prefer readFixed in
    * production paths. */
  def readInferred(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("inferSchema", "true")
      .csv(path)

  /** Streaming fixed-schema file source (S7). */
  def readStreamFixed(spark: SparkSession, schema: StructType, path: String): DataFrame =
    spark.readStream
      .schema(schema)
      .option("header", "true")
      .csv(path)

  /** Partitioned read with REAL partition columns: instead of the
    * reference's client-side glob construction
    * (spark_batch_processor.py:45-52 builds `year=Y/month=M/day=D`
    * into the path string), set basePath and filter on the recovered
    * partition columns — Catalyst partition pruning then skips
    * directories at plan time, and the same query serves any date
    * range. */
  def readPartitioned(spark: SparkSession, basePath: String, schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.option("header", "true").option("basePath", basePath)
    schema.fold(r.option("inferSchema", "true"))(s => r.schema(s)).csv(basePath)
  }
}
