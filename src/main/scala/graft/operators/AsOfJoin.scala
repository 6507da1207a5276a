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

  /** Hot-key (skew-safe) as-of join: identical semantics to `asOf`,
    * but the per-event sort runs per (key, TIME BUCKET) instead of per
    * key, so a single degenerate key (one symbol holding 90% of the
    * ticks) splits across buckets instead of funneling into one
    * reducer — the documented skew caveat of `asOf` made code.
    *
    * Dataflow: (1) per-(key, bucket) last right payload via max_by —
    * one partial-agg shuffle; (2) a carry table over the per-bucket
    * rows (window per key, but over BUCKET-cardinality rows, not
    * events) yields each bucket's incoming state = last right payload
    * of any earlier bucket; (3) the main union sorts per (key, bucket)
    * with the carry row seeded at bucket start, so every left row sees
    * in-bucket right rows plus the carried state. Cost: two extra
    * narrow shuffles of bucket-cardinality data buys per-event work
    * bounded by bucket size.
    *
    * `bucketSec` trades skew resistance (smaller buckets) against
    * carry-table size (larger buckets).
    */
  def asOfBucketed(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTs: String, rightTs: String, bucketSec: Long = 3600L): DataFrame = {
    import org.apache.spark.sql.types.{StructType, TimestampType}
    val leftPayload = left.columns.filterNot(keys.contains).toSeq
    val rightPayload = right.columns.filterNot(c => keys.contains(c) || c == rightTs).toSeq :+ rightTs
    require(leftPayload.intersect(rightPayload).isEmpty,
      s"overlapping non-key columns: ${leftPayload.intersect(rightPayload).mkString(",")}")
    def nullOf(df: DataFrame, c: String): Column = lit(null).cast(df.schema(c).dataType).as(c)
    val rStructType = StructType(rightPayload.map(c => right.schema(c)))

    // internal event-time axis: µs for timestamps (exact), double
    // otherwise; `unit` is the bucket width on that axis
    val isTs = left.schema(leftTs).dataType == TimestampType
    def axis(c: Column): Column = if (isTs) unix_micros(c) else c.cast("double")
    val unit: Column = if (isTs) lit(bucketSec * 1000000L) else lit(bucketSec.toDouble)

    val kCols = keys.map(col)
    val rb = right.withColumn("__t", axis(col(rightTs)))
      .withColumn("__b", floor(col("__t") / unit).cast("long"))
    val lb = left.withColumn("__t", axis(col(leftTs)))
      .withColumn("__b", floor(col("__t") / unit).cast("long"))

    // (1) last right payload per (key, bucket)
    val bucketLast = rb.groupBy(kCols :+ col("__b"): _*)
      .agg(max_by(struct(rightPayload.map(col): _*), col("__t")).as("__last"))
    // (2) bucket spine (all buckets either side touches) + carry-in
    val spine = lb.select(kCols :+ col("__b"): _*)
      .unionByName(rb.select(kCols :+ col("__b"): _*)).distinct()
    val wCarry = Window.partitionBy(kCols: _*).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val seeds = spine.join(bucketLast, keys :+ "__b", "left")
      .withColumn("__seed", last(col("__last"), ignoreNulls = true).over(wCarry))
      .filter(col("__seed").isNotNull)
      .select(kCols
        ++ Seq((col("__b") * unit).as("__t"), col("__b"), lit(-1).as("__side"))
        ++ leftPayload.map(c => nullOf(left, c))
        :+ col("__seed").cast(rStructType).as("__r"): _*)

    // (3) per-(key, bucket) union + running last
    val lPart = lb.select(kCols
      ++ Seq(col("__t"), col("__b"), lit(1).as("__side"))
      ++ leftPayload.map(col)
      :+ lit(null).cast(rStructType).as("__r"): _*)
    val rPart = rb.select(kCols
      ++ Seq(col("__t"), col("__b"), lit(0).as("__side"))
      ++ leftPayload.map(c => nullOf(left, c))
      :+ struct(rightPayload.map(col): _*).as("__r"): _*)
    val w = Window.partitionBy(kCols :+ col("__b"): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    lPart.unionByName(rPart).unionByName(seeds)
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select((keys.map(col) ++ leftPayload.map(col)
        ++ rightPayload.map(c => col(s"__r.$c").as(c))): _*)
  }
}
