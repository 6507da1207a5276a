package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — the canonical financial-data operator
  * Spark lacks natively: for every left row, attach the latest right
  * row with right.ts <= left.ts per key (e.g. each tick gets the most
  * recent quote/bar).
  *
  * Implementation is the union + running-last-value rewrite, chosen
  * over (a) a per-key range cross join (quadratic per key) and (b) a
  * custom SparkPlan (unnecessary — built-ins express it exactly):
  * both sides union into one frame ordered by (key, ts, side), and a
  * running `last(_, ignoreNulls)` window carries each right payload
  * forward onto subsequent left rows. ONE shuffle on the key, sort
  * within partitions, linear in |L|+|R| — survives 100 TB provided
  * keys are not degenerate (salt upstream if one key dominates).
  *
  * Right rows must be unique per (key, ts) for determinism (pre-dedup
  * with Dedup.keepLast otherwise) — the same contract DuckDB's native
  * ASOF JOIN has, which the oracle uses to cross-check this operator.
  */
object AsOfJoin {

  /** Left as-of join. Output: all left columns + the right payload
    * columns (null when no right row at or before the left ts).
    * `rightTs` also appears in the output (the matched timestamp). */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String): DataFrame = {
    val leftPayload = left.columns.filterNot(keys.contains).toSeq
    val rightPayload = right.columns.filterNot(c => keys.contains(c) || c == rightTs).toSeq :+ rightTs
    require(leftPayload.intersect(rightPayload).isEmpty,
      s"overlapping non-key columns: ${leftPayload.intersect(rightPayload).mkString(",")}")

    def nullOf(df: DataFrame, c: String): Column =
      lit(null).cast(df.schema(c).dataType).as(c)

    // the right payload travels as ONE struct so a match is atomic —
    // per-column carry would mix rows when a newer right row holds a
    // null in some payload column
    val rStructType = org.apache.spark.sql.types.StructType(
      rightPayload.map(c => right.schema(c)))
    val lPart = left.select(
      (keys.map(col) :+ col(leftTs).as("__t") :+ lit(1).as("__side"))
        ++ leftPayload.map(col)
        :+ lit(null).cast(rStructType).as("__r"): _*)
    val rPart = right.select(
      (keys.map(col) :+ col(rightTs).as("__t") :+ lit(0).as("__side"))
        ++ leftPayload.map(c => nullOf(left, c))
        :+ struct(rightPayload.map(col): _*).as("__r"): _*)

    // right rows sort before left rows at equal ts -> `<=` semantics
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    lPart.unionByName(rPart)
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select((keys.map(col) ++ leftPayload.map(col)
        ++ rightPayload.map(c => col(s"__r.$c").as(c))): _*)
  }
}
