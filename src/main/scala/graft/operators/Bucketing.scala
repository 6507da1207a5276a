package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout for shuffle-free co-located joins.
  *
  * At 100 TB the fact⋈fact join (lineitem⋈orders-shaped) is the
  * dominant shuffle; persisting both sides bucketed AND sorted on the
  * join key lets every future join/aggregation on that key run with
  * ZERO exchange — the cost is paid once at write. BucketingSpec pins
  * the no-Exchange plan shape.
  */
object Bucketing {

  /** Persist `df` as a bucketed+sorted managed table (parquet). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key — planned as a
    * sort-merge join with no Exchange when bucket counts match. */
  def colocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                    leftKey: String, rightKey: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable),
      spark.table(leftTable)(leftKey) === spark.table(rightTable)(rightKey))
}
