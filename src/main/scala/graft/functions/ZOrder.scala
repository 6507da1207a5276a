package graft.functions

import org.apache.spark.sql.{Column, DataFrame, GraftColumnShim}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType}

/** Z-order (Morton) curve utilities for multi-dimensional data
  * layout: interleaving the bits of two dimension keys gives a single
  * sort key whose CONSECUTIVE ranges cover small axis-aligned boxes
  * in BOTH dimensions — so range-partitioned files each carry tight
  * min/max footer stats on every z-ordered column, and a predicate on
  * EITHER dimension prunes most files at the scan. A plain
  * `orderBy(x)` gives perfect x-pruning but every file spans the full
  * y range; z-order trades a few bits of each for pruning on all.
  * This is the layout story for 100 TB: clustering is decided at
  * WRITE time, and the probe-side benefit is free forever after.
  *
  * `LayoutSpec` quantifies it: per-bucket bounding boxes under
  * z-order vs linear order on the same data.
  */
case class InterleaveBitsExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "interleave_bits"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZOrder.eval(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ZOrder.eval($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): InterleaveBitsExpr =
    copy(left = newLeft, right = newRight)
}

object ZOrder {
  /** Morton-interleave the low 32 bits of two non-negative longs:
    * bit j of `a` lands at position 2j, bit j of `b` at 2j+1.
    * Static entry point shared by interpreted eval and codegen. */
  def eval(a: Long, b: Long): Long = {
    var z = 0L
    var j = 0
    while (j < 32) {
      z |= ((a >>> j) & 1L) << (2 * j)
      z |= ((b >>> j) & 1L) << (2 * j + 1)
      j += 1
    }
    z
  }

  def zvalue(a: Column, b: Column): Column =
    GraftColumnShim.column(InterleaveBitsExpr(
      GraftColumnShim.expression(a.cast("long")), GraftColumnShim.expression(b.cast("long"))))

  /** Scale a long-castable column from [lo, hi] onto the 10-bit grid
    * [0, 1023] — the per-column normalization that keeps one wide key
    * from monopolizing the interleave's high bits (an UN-normalized
    * curve over an 11-bit key and a 7-bit key sorts almost purely by
    * the wide key, and the narrow dimension prunes nothing —
    * StatsCatalogSpec caught exactly that). Double arithmetic is safe
    * to |key span| ~2^43 (1024 × span must stay under 2^53); the
    * least() clamp absorbs the top-of-range rounding edge. */
  def normalized(c: Column, lo: Long, hi: Long): Column =
    least(lit(1023L), greatest(lit(0L),
      floor((c.cast("double") - lit(lo.toDouble)) * 1024d / lit((hi - lo + 1).toDouble)).cast("long")))

  /** N-DIMENSIONAL Morton value over 10-bit-normalized inputs: bit j
    * of dimension d lands at position j*n + d (for n = 2 this is
    * exactly [[eval]]'s layout — LayoutSpec pins the equivalence).
    * Built from plain shift/and/add Columns, so the whole interleave
    * stays inside whole-stage codegen with no custom expression; at
    * 10 bits x n dims that is 10n three-op terms, folded at codegen
    * time. 10n must fit a long's 63 value bits -> n <= 6. */
  def zvalueN(cols: Seq[Column]): Column = {
    val n = cols.size
    require(n >= 2 && n <= 6, s"2..6 dimensions (10 bits each), got $n")
    cols.zipWithIndex.flatMap { case (c, d) =>
      (0 until 10).map(j =>
        shiftleft(shiftright(c.cast("long"), j).bitwiseAND(lit(1L)), j * n + d))
    }.reduce(_ + _)
  }

  /** [[cluster]] for 2..6 dimensions: every key normalizes onto the
    * shared 10-bit grid, the curve interleaves them evenly, and a
    * range predicate on ANY clustered column prunes files
    * (StatsCatalogSpec asserts it for 3). More dimensions dilute each
    * one's pruning power (10 bits split n ways per curve prefix) —
    * the standard z-order trade, worth it up to the handful of
    * columns queries actually filter on. */
  def clusterN(df: DataFrame, cols: Seq[Column], numFiles: Int): DataFrame = {
    val aggs = cols.flatMap(c => Seq(min(c.cast("long")), max(c.cast("long"))))
    val bounds = df.agg(aggs.head, aggs.tail: _*).head()
    if (bounds.isNullAt(0)) return df
    val normed = cols.zipWithIndex.map { case (c, i) =>
      normalized(c, bounds.getLong(2 * i), bounds.getLong(2 * i + 1))
    }
    df.withColumn("__z", zvalueN(normed))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /** Cluster `df` for multi-dim pruning on (a, b): normalize both
    * keys to the shared 10-bit grid (bounds from one write-time
    * 1-row aggregate), then range-partition by the Morton value into
    * `numFiles` partitions and sort within each — the write-side half
    * of z-order layout (one global range exchange, the same cost
    * class as any orderBy write; file footers then carry tight
    * min/max on BOTH columns). */
  def cluster(df: DataFrame, a: Column, b: Column, numFiles: Int): DataFrame = {
    val r = df.agg(
      min(a.cast("long")), max(a.cast("long")),
      min(b.cast("long")), max(b.cast("long"))).head()
    if (r.isNullAt(0) || r.isNullAt(2)) return df // empty input: nothing to cluster
    val z = zvalue(normalized(a, r.getLong(0), r.getLong(1)),
      normalized(b, r.getLong(2), r.getLong(3))).as("__z")
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
