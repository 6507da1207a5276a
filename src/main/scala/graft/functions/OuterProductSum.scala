package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftColumnShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Exact integer scatter-matrix aggregate for PCA/covariance (q186):
  * folds each row's quantized component vector into ONE flat buffer
  * of dim² outer-product sums (Σ x_i·x_j) + dim component sums (Σ
  * x_i) + the row count — i.e. the Gram matrix and first moments in a
  * single ObjectHashAggregate pass with map-side combine, where the
  * explode-to-(i, j)-rows formulation materializes dim² rows PER
  * VECTOR through the shuffle (measured 179.9 s vs 3.6 s at the 100x
  * probe, 500k × 64-dim vectors — the exchange carries one ~33 KB
  * buffer per map task either way, but the explode pays 2·10⁹
  * generated rows of per-row overhead).
  *
  * Overflow bound, documented: entries accumulate in long — with
  * 1e-4-quantized unit-scale components (|x_fp| ≲ 1e5) the per-pair
  * product is ≤ 1e10, so a single aggregate stays exact to ~9·10⁸
  * rows; beyond that (the full-100 TB single-table regime) promote
  * the merge side to BigInt — the buffer layout is already the
  * partial-sums form that upgrade needs.
  *
  * Null vectors are skipped (sum semantics); rows shorter than `dim`
  * are rejected — a silent truncation would skew the matrix.
  */
case class OuterProductSum(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  private val size = dim * dim + dim + 1

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "outer_product_sum"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](size)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      require(arr.numElements() >= dim,
        s"outer_product_sum: vector of ${arr.numElements()} elements, need $dim")
      var i = 0
      // addExact/multiplyExact (JIT intrinsics, ~free) make the
      // documented ~9e8-row overflow bound a loud ArithmeticException
      // instead of a silent wrap degrading a maintained Gram store
      while (i < dim) {
        val xi = arr.getLong(i)
        val row = i * dim
        var j = 0
        while (j < dim) {
          buf(row + j) = Math.addExact(buf(row + j), Math.multiplyExact(xi, arr.getLong(j)))
          j += 1
        }
        buf(dim * dim + i) = Math.addExact(buf(dim * dim + i), xi)
        i += 1
      }
      buf(dim * dim + dim) += 1L
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var k = 0
    while (k < size) { buf(k) = Math.addExact(buf(k), other(k)); k += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(size * 8)
    var k = 0
    while (k < size) { bb.putLong(buf(k)); k += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](size)
    var k = 0
    while (k < size) { buf(k) = bb.getLong(); k += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): OuterProductSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): OuterProductSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): OuterProductSum =
    copy(child = newChild)
}

object OuterProductSum {
  /** Flat [dim² outer sums | dim component sums | count] over a
    * column of array<long> vectors (aggregate). */
  def column(vec: Column, dim: Int): Column =
    GraftColumnShim.column(
      OuterProductSum(GraftColumnShim.expression(vec), dim).toAggregateExpression())
}
