package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftColumnShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, LongType}

/** SimHash aggregate: folds 64-bit token hashes into the 64
  * per-position one-counts plus the total count, emitting the packed
  * simhash (bit j set iff ones(j) > n/2, i.e. the +1/−1 bit sum is
  * positive — bitwise identical to the 64×`sum(when(...))`
  * formulation it replaces).
  *
  * One buffer of long[65] per group instead of 64 separate sum
  * aggregates: the wide-agg form pays a 64-buffer update per input row
  * and a multi-second whole-stage-codegen compile of the 64-way
  * aggregate (4.4 s first run at sf0.1); this runs under
  * ObjectHashAggregate with partial aggregation (map-side combine,
  * exchange carries one 520-byte buffer per group per map task) and a
  * flat 64-iteration update loop.
  *
  * Null inputs are skipped (sum() semantics: a null contributes to no
  * bit sum and not to the count).
  */
case class SimHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "simhash_agg"

  // counts(0..63) = ones per bit position; counts(64) = n inputs
  override def createAggregationBuffer(): Array[Long] = new Array[Long](65)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var j = 0
      while (j < 64) {
        buf(j) += (h >>> j) & 1L
        j += 1
      }
      buf(64) += 1L
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var j = 0
    while (j < 65) { buf(j) += other(j); j += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    val n = buf(64)
    var out = 0L
    var j = 0
    while (j < 64) {
      // ones > zeros  <=>  2*ones > n  <=>  sum(+1/-1) > 0
      if (2L * buf(j) > n) out |= (1L << j)
      j += 1
    }
    out
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(65 * 8)
    var j = 0
    while (j < 65) { bb.putLong(buf(j)); j += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](65)
    var j = 0
    while (j < 65) { buf(j) = bb.getLong(); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SimHashAgg =
    copy(child = newChild)
}

object SimHashAgg {
  /** simhash of a column of 64-bit token hashes (aggregate). */
  def column(hash: Column): Column =
    GraftColumnShim.column(
      SimHashAgg(GraftColumnShim.expression(hash)).toAggregateExpression())
}
