package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Column, GraftColumnShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Bounded sorted-distinct buffer for [[KmvMinsAgg]]: the k smallest
  * distinct longs seen so far, kept ascending in one primitive array.
  *
  * Round-17 (guide: per-row allocation/boxing in the hot path): the
  * former `mutable.TreeSet[Long]` boxed every probe (`last`,
  * `contains`, insert each allocate or unbox `java.lang.Long` nodes)
  * on EVERY input row of every KMV consumer. The common case at
  * volume — h >= current k-th minimum — is now a single primitive
  * array read; the rare insert is a binary search plus an
  * O(k) arraycopy (k = 64 everywhere in the engine, i.e. one
  * cache-line-friendly 512-byte shift at worst). Semantics identical:
  * same k smallest distinct values, ascending.
  */
final class KmvBuffer(val k: Int) {
  val arr: Array[Long] = new Array[Long](k)
  var n: Int = 0

  def add(h: Long): Unit = {
    if (n == k && h >= arr(k - 1)) return // common case: not a new minimum
    val idx = java.util.Arrays.binarySearch(arr, 0, n, h)
    if (idx >= 0) return // already present (distinct semantics)
    val ins = -idx - 1
    if (n < k) {
      System.arraycopy(arr, ins, arr, ins + 1, n - ins)
      arr(ins) = h
      n += 1
    } else {
      // full: h < arr(k-1) here, so the largest falls off the end
      System.arraycopy(arr, ins, arr, ins + 1, k - 1 - ins)
      arr(ins) = h
    }
  }

  def toArray: Array[Long] = java.util.Arrays.copyOf(arr, n)
}

/** The `k` smallest DISTINCT long hashes as ONE aggregate — the KMV
  * sketch build without either exchange the window formulation pays.
  *
  * `kmvSketchBy`'s plan is distinct → row_number ≤ k: the distinct
  * shuffles EVERY unique hash (15M 8-byte keys per column at the q193
  * 100× probe), and only then does the group-limit window cut to k.
  * The k-min of a multiset equals the k-min of its distinct set as
  * long as the heap itself dedupes — which a bounded sorted-distinct
  * buffer does for free — so the whole build collapses to one
  * ObjectHashAggregate with map-side combine: every map task reduces
  * its slice to ≤ k distinct hashes per group BEFORE the exchange,
  * and the shuffle carries O(maps × k) longs per group instead of the
  * unique-value universe. Same output set, bit for bit (SketchSpec
  * pins it against kmvSketchBy on the real corpus), so estimates and
  * their DuckDB oracles are unchanged.
  *
  * Null hashes are dropped (aggregate semantics; the callers filter
  * nulls anyway). The buffer is a size-capped sorted primitive array
  * ([[KmvBuffer]]): a rejected row costs one array read, an accepted
  * one a binary search + bounded arraycopy.
  */
case class KmvMinsAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] with UnaryLike[Expression] {

  require(k > 0, s"kmv_mins requires k > 0, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_mins"

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    var i = 0
    while (i < other.n) { buf.add(other.arr(i)); i += 1 }
    buf
  }

  override def eval(buf: KmvBuffer): Any =
    new GenericArrayData(buf.toArray) // ascending by construction

  override def serialize(buf: KmvBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.n)
    var i = 0
    while (i < buf.n) { out.writeLong(buf.arr(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    // the serialized form is ascending and distinct: bulk-load it
    var i = 0
    while (i < n) { buf.arr(i) = in.readLong(); i += 1 }
    buf.n = n
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
