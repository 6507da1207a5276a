package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Readers for the driver testdata (TESTDATA.md): one parquet per table
  * under `sfDir`. All timestamp columns are normalized to session-TZ
  * (UTC) `TimestampType` so that window/epoch functions behave
  * identically to the DuckDB oracle, which reads the same parquet as
  * naive timestamps. (Spark 4 infers parquet `isAdjustedToUTC=false`
  * as TIMESTAMP_NTZ by default; under a UTC session the cast is
  * instant-preserving.)
  */
object Tables {
  /** Columns stored as parquet TIMESTAMP(NANOS) (unsupported by Spark's
    * vectorized reader): read as long ns-since-epoch and truncated to
    * microseconds with integral division (a double division would lose
    * precision above 2^53 ns). The DuckDB oracle applies the matching
    * `::TIMESTAMP` (ns->us truncation) cast. */
  private val nanosCols: Map[String, Seq[String]] = Map("events" -> Seq("ts"))

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Read isAdjustedToUTC=false parquet timestamps as TimestampType
    // DIRECTLY instead of TIMESTAMP_NTZ + cast: under the UTC session
    // the values are identical, but the cast-free schema lets every
    // shipdate/orderdate range predicate reach the parquet scan as a
    // PushedFilter — with the cast Project in between, NO date filter
    // in the battery pushed down (PlanAuditSpec q111 caught it).
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    val tsFixed = nanosCols.getOrElse(name, Nil).foldLeft(df) { (d, c) =>
      if (d.schema.fieldNames.contains(c) && d.schema(c).dataType == LongType)
        d.withColumn(c, expr(s"timestamp_micros($c DIV 1000)"))
      else d
    }
    tsFixed.schema.fields.foldLeft(tsFixed) { (d, f) =>
      f.dataType match {
        case TimestampNTZType => d.withColumn(f.name, col(f.name).cast(TimestampType))
        case _                => d
      }
    }
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = apply(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "region")
  def events(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}
