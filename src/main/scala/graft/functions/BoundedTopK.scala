package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftColumnShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Bounded-heap top-k aggregate: keeps the `k` entries with the
  * SMALLEST `key` (callers negate a score for "largest"), emitting
  * their `payload`s as an array sorted by key ascending.
  *
  * This is the scale-out replacement for the
  * `row_number() OVER (PARTITION BY q ORDER BY score)  <= k` pattern:
  * that plan shuffles the ENTIRE scored set and funnels each
  * partition key through a single reducer that sorts everything. As a
  * TypedImperativeAggregate this runs under ObjectHashAggregate with
  * partial aggregation — every map task reduces its slice to at most
  * k rows per group BEFORE the exchange, so the shuffle carries
  * O(numPartitions * k) rows per group instead of the corpus, and no
  * reducer ever sorts more than what it receives.
  *
  * Determinism: callers must make `key` a total order (e.g. include an
  * id tiebreak); with a total order the surviving set and its output
  * order are partitioning-invariant.
  *
  * Null keys are DROPPED (like aggregate inputs, unlike a ranking
  * window): `row_number() ... ORDER BY key` ranks null-key rows last
  * and would still emit them when a group has fewer than k non-null
  * rows, so "identical to the window form" holds only for non-null
  * keys. The internal callers (Similarity.topK) build non-nullable
  * struct keys; general callers wanting window parity must coalesce
  * nulls to a sentinel that sorts last.
  */
case class BoundedTopKAgg(
    key: Expression,
    payload: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[UnsafeRow]] with BinaryLike[Expression] {

  require(k > 0, s"bounded_top_k requires k > 0, got $k")

  override def left: Expression = key
  override def right: Expression = payload

  override def dataType: DataType = ArrayType(payload.dataType, containsNull = payload.nullable)
  override def nullable: Boolean = false
  override def prettyName: String = "bounded_top_k"

  @transient private lazy val keyType: DataType = key.dataType
  @transient private lazy val keyOrd: Ordering[Any] = TypeUtils.getInterpretedOrdering(keyType)
  // max-heap on key: head is the current WORST (largest) of the k kept
  @transient private lazy val entryOrd: Ordering[UnsafeRow] = new Ordering[UnsafeRow] {
    override def compare(a: UnsafeRow, b: UnsafeRow): Int =
      keyOrd.compare(a.get(0, keyType), b.get(0, keyType))
  }
  @transient private lazy val entryProj: UnsafeProjection =
    UnsafeProjection.create(Array(key.dataType, payload.dataType))

  override def createAggregationBuffer(): mutable.PriorityQueue[UnsafeRow] =
    new mutable.PriorityQueue[UnsafeRow]()(entryOrd)

  override def update(buf: mutable.PriorityQueue[UnsafeRow], input: InternalRow): mutable.PriorityQueue[UnsafeRow] = {
    val k0 = key.eval(input)
    if (k0 != null) {
      if (buf.size < k) {
        buf.enqueue(entryProj(InternalRow(k0, payload.eval(input))).copy())
      } else if (keyOrd.compare(k0, buf.head.get(0, keyType)) < 0) {
        buf.dequeue()
        buf.enqueue(entryProj(InternalRow(k0, payload.eval(input))).copy())
      }
    }
    buf
  }

  override def merge(buf: mutable.PriorityQueue[UnsafeRow], other: mutable.PriorityQueue[UnsafeRow]): mutable.PriorityQueue[UnsafeRow] = {
    other.foreach { row =>
      if (buf.size < k) buf.enqueue(row)
      else if (entryOrd.compare(row, buf.head) < 0) { buf.dequeue(); buf.enqueue(row) }
    }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[UnsafeRow]): Any = {
    val arr = buf.clone().dequeueAll.toArray // descending by key
    val out = new Array[Any](arr.length)
    var i = 0
    while (i < arr.length) { // reverse -> ascending by key (best first)
      out(arr.length - 1 - i) = arr(i).get(1, payload.dataType)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: mutable.PriorityQueue[UnsafeRow]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { row =>
      val bytes = row.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[UnsafeRow] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val rowBytes = new Array[Byte](len)
      in.readFully(rowBytes)
      val row = new UnsafeRow(2)
      row.pointTo(rowBytes, len)
      buf.enqueue(row)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): BoundedTopKAgg =
    copy(key = newLeft, payload = newRight)
}

object BoundedTopK {
  /** Aggregate column: array of the `k` payloads with smallest `key`,
    * sorted by key ascending. Negate score columns for "top by score". */
  def column(key: Column, payload: Column, k: Int): Column =
    GraftColumnShim.column(
      BoundedTopKAgg(GraftColumnShim.expression(key), GraftColumnShim.expression(payload), k)
        .toAggregateExpression())
}
