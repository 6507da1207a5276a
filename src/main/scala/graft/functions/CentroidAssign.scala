package graft.functions

import org.apache.spark.sql.{Column, DataFrame, GraftColumnShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DataType, LongType}

/** Nearest-centroid assignment as ONE codegen expression — the
  * k-means/IVF assign kernel, the [[PqArgminExpr]] pattern applied to
  * the coarse quantizer.
  *
  * The join formulation of assignment (`crossJoin(broadcast(cents))`
  * then `groupBy(id).agg(min_by(...))`) materializes |corpus| * k
  * intermediate rows, each dragging the full query vector through the
  * aggregation — at the 100x probe of the growing-k semantic dedup
  * (200k vectors, k=2000) that is 400M wide rows per Lloyd round and
  * measured a 10 GB sort spill. Assignment is conceptually a single
  * map pass: the centroid table is broadcast-sized BY CONSTRUCTION
  * at sane k (k rows — the whole point of coarse quantization), so
  * this expression carries it as primitive arrays and emits the
  * argmax directly — zero intermediate rows, zero shuffle, inside
  * whole-stage codegen. Callers gate on k and keep the join plan as
  * the unbounded-k fallback (the BpeTrain/ConnectedComponents regime
  * pattern).
  *
  * BITWISE-equality contract with the join plan (FunctionsSpec pins
  * it): the kernel replays `floor(cosine(v, c) * 1e4 + 0.5) / 1e4`
  * + `min_by(struct(cb, simr), struct(-simr, cb))` exactly —
  * sequential dot accumulation in [[DotProduct.eval]]'s order for
  * both the pair dot and each norm, `dot / (nv * nc)` in that
  * association, Spark's FLOOR-on-double (`(long) Math.floor(x)`),
  * and the highest-simr / lowest-bucket tiebreak. The rounded sim's
  * NUMERATOR is an integer in [-10000, 10000], so (bucket, sim) pack
  * losslessly into one long — `bucket * 100000 + (s + 10000)` — and
  * unpack with exact integer column arithmetic; `s / 1e4` as a
  * long-to-double divide is the join plan's own final op. */
case class CentroidAssignExpr(child: Expression, book: CentroidBook)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "centroid_assign"

  override protected def nullSafeEval(v: Any): Any =
    book.assignPacked(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centBook", book, classOf[CentroidBook].getName)
    defineCodeGen(ctx, ev, v => s"$ref.assignPacked($v)")
  }

  override protected def withNewChildInternal(newChild: Expression): CentroidAssignExpr =
    copy(child = newChild)
}

/** The centroid table in kernel form, sorted by bucket id (the
  * tiebreak scan order). `norms(i)` is sqrt(<c,c>) summed in
  * [[DotProduct.eval]]'s sequential order — bitwise the
  * `l2norm(centroid)` the join plan computes. */
final class CentroidBook(val buckets: Array[Long],
                         val cents: Array[Array[Double]],
                         val norms: Array[Double]) extends Serializable {
  require(buckets.nonEmpty, "empty centroid book")
  // the packed (bucket, sim) long needs non-negative buckets; a
  // negative label would alias another bucket's packing
  require(buckets.head >= 0, s"bucket ids must be non-negative, got ${buckets.head}")

  /** argmax of rounded cosine (lowest-bucket tiebreak), packed as
    * `bucket * 100000 + (floor(sim*1e4 + 0.5) + 10000)`. Scanning in
    * ascending-bucket order with a strict `>` makes the tiebreak
    * implicit. */
  def assignPacked(v: ArrayData): Long = {
    var nv = 0d
    val nV = v.numElements()
    var j = 0
    while (j < nV) { val x = v.getDouble(j); nv += x * x; j += 1 }
    nv = math.sqrt(nv)
    var bestS = Long.MinValue
    var bestB = 0L
    var i = 0
    while (i < buckets.length) {
      val c = cents(i)
      val n = math.min(nV, c.length)
      var dot = 0d
      j = 0
      while (j < n) { dot += v.getDouble(j) * c(j); j += 1 }
      val sim = dot / (nv * norms(i))
      val s = math.floor(sim * 1e4 + 0.5).toLong
      if (s > bestS) { bestS = s; bestB = buckets(i) }
      i += 1
    }
    bestB * 100000L + (bestS + 10000L)
  }
}

object CentroidAssign {

  /** Materialize a (bucket, centroid) frame into kernel form. The
    * collect is the gated regime call: callers only take this path
    * when k is broadcast-sized (the centroid table has exactly k
    * rows); the join plan remains the unbounded-k fallback. */
  def fromCentroids(cents: DataFrame): CentroidBook = {
    val rows = cents
      .select(col("bucket").cast("long"), col("centroid").cast("array<double>"))
      .collect()
      .sortBy(_.getLong(0))
    val buckets = rows.map(_.getLong(0))
    val cs = rows.map(_.getSeq[Double](1).toArray)
    val norms = cs.map { c =>
      var acc = 0d; var i = 0
      while (i < c.length) { acc += c(i) * c(i); i += 1 }
      math.sqrt(acc)
    }
    new CentroidBook(buckets, cs, norms)
  }

  def column(vec: Column, book: CentroidBook): Column =
    GraftColumnShim.column(
      CentroidAssignExpr(GraftColumnShim.expression(vec), book))
}
