package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftColumnShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** The `k` smallest DISTINCT long hashes as ONE aggregate — the KMV
  * sketch build without either exchange the window formulation pays.
  *
  * `kmvSketchBy`'s plan is distinct → row_number ≤ k: the distinct
  * shuffles EVERY unique hash (15M 8-byte keys per column at the q193
  * 100× probe), and only then does the group-limit window cut to k.
  * The k-min of a multiset equals the k-min of its distinct set as
  * long as the heap itself dedupes — which a bounded ordered set does
  * for free — so the whole build collapses to one ObjectHashAggregate
  * with map-side combine: every map task reduces its slice to ≤ k
  * distinct hashes per group BEFORE the exchange, and the shuffle
  * carries O(maps × k) longs per group instead of the unique-value
  * universe. Same output set, bit for bit (SketchSpec pins it against
  * kmvSketchBy on the real corpus), so estimates and their DuckDB
  * oracles are unchanged.
  *
  * Null hashes are dropped (aggregate semantics; the callers filter
  * nulls anyway). The buffer is a size-capped ordered set: insert,
  * and if over k evict the largest — O(log k) per input against the
  * JVM's red-black tree.
  */
case class KmvMinsAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[Long]] with UnaryLike[Expression] {

  require(k > 0, s"kmv_mins requires k > 0, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_mins"

  override def createAggregationBuffer(): mutable.TreeSet[Long] = mutable.TreeSet.empty[Long]

  private def add(buf: mutable.TreeSet[Long], h: Long): Unit =
    if (buf.size < k) buf += h
    else if (h < buf.last && !buf.contains(h)) { buf -= buf.last; buf += h }

  override def update(buf: mutable.TreeSet[Long], input: InternalRow): mutable.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: mutable.TreeSet[Long], other: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    other.foreach(add(buf, _))
    buf
  }

  override def eval(buf: mutable.TreeSet[Long]): Any =
    new GenericArrayData(buf.toArray) // TreeSet iterates ascending

  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf += in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMinsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMinsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvMinsAgg =
    copy(child = newChild)
}

object KmvMins {
  /** Aggregate column: ascending array of the k smallest distinct
    * values of `hash` (a LONG column). */
  def column(hash: Column, k: Int): Column =
    GraftColumnShim.column(
      KmvMinsAgg(GraftColumnShim.expression(hash), k).toAggregateExpression())
}
