package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed deduplication.
  *
  * The reference deduplicates twice, both with nondeterministic
  * survivors: `df.dropDuplicates(["symbol","date"])`
  * (spark_batch_processor.py:83 — arbitrary row per key) and pandas
  * `drop_duplicates(subset, keep='last')` (load_to_snowflake.py:162 —
  * file-order artifact). This engine offers the strict-parity form plus
  * deterministic variants whose survivor is pinned by an explicit
  * ordering; tests and the oracle suite use the deterministic ones.
  *
  * Scale notes: all variants compile to a single hash-shuffle on the
  * key columns (hash aggregate for `exact`, window over a
  * shuffle+local-sort for the deterministic ones). Map-side partial
  * aggregation applies to `exact`; no driver-side state anywhere.
  */
object Dedup {

  /** Strict parity with the reference's dropDuplicates: arbitrary
    * survivor per key. Fast (partial-agg-able) but nondeterministic. */
  def exact(df: DataFrame, keys: Seq[String]): DataFrame =
    df.dropDuplicates(keys)

  /** Deterministic dedup: keep the first row per key under `order`. */
  def keepFirst(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Deterministic keep-last (pandas `keep='last'` semantics, pinned):
    * keep the last row per key under `order`. */
  def keepLast(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame =
    keepFirst(df, keys, order.map(_.desc))
}
