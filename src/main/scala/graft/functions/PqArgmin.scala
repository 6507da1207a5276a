package graft.functions

import org.apache.spark.sql.{Column, DataFrame, GraftColumnShim}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DataType, LongType}

/** Nearest-codebook-cell assignment as ONE codegen expression — the
  * PQ encode kernel (Jégou et al., TPAMI 2011, §"quantizer").
  *
  * The join formulation of encode scores |corpus| * nSub * cells
  * intermediate rows (a 4096x row fan-out at nSub=16, cells=256: at
  * 100x testdata that measured 819 M scored rows and a 22 GB shuffle
  * spill) and then shuffles a groupBy(id, m) to keep the min — for
  * what is conceptually a single map pass. A PQ codebook is tiny BY
  * CONSTRUCTION (<= nSub * cells centroids — the whole point of
  * product quantization is that it broadcasts), so this expression
  * carries the codebook's primitive arrays and emits the argmin code
  * directly: zero intermediate rows, zero shuffle, inside whole-stage
  * codegen (the [[WinnowFpsExpr]]/[[DotProductExpr]] pattern; the
  * codebook rides as a codegen reference object, ~130 KB at the q104
  * config — task-binary freight, same regime as any broadcast scalar).
  *
  * BITWISE-equality contract with the join plan (PQSpec pins it): the
  * kernel replays the exact float story of
  * `r4d(cc - 2d * DotProduct(sv, cent))` + `min_by(code, (d, code))`
  * — sequential dot accumulation in [[DotProduct.eval]]'s order,
  * `cc - 2.0 * dot` in that association, Spark's FLOOR-on-double
  * (`(long) Math.floor(x)`) then long->double divide for the 1e-4
  * rounding, and the ascending-code tiebreak. IEEE arithmetic is
  * deterministic given operand order, so codes match the join plan
  * bit for bit and the DuckDB oracle replay (q104/q118) is untouched.
  */
case class PqArgminExpr(left: Expression, right: Expression, book: PqCodebook)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "pq_argmin"

  override protected def nullSafeEval(sv: Any, m: Any): Any =
    book.argmin(sv.asInstanceOf[ArrayData], m.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqBook", book, classOf[PqCodebook].getName)
    defineCodeGen(ctx, ev, (sv, m) => s"$ref.argmin($sv, $m)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): PqArgminExpr =
    copy(left = newLeft, right = newRight)
}

/** The codebook in kernel form: per subspace m, entry arrays sorted by
  * code. `ccs(m)(i)` is the precomputed <cent,cent> of entry i —
  * summed in [[DotProduct.eval]]'s sequential order so the value is
  * bitwise the one the join plan's `Similarity.dot(cent, cent)`
  * column carried. */
final class PqCodebook(val codes: Array[Array[Long]],
                       val cents: Array[Array[Array[Double]]],
                       val ccs: Array[Array[Double]]) extends Serializable {

  /** Argmin over this subspace's cells of the 1e-4-rounded
    * `|c|^2 - 2<sv,c>` L2 objective, ascending-code tiebreak. */
  def argmin(sv: ArrayData, m: Int): Long = {
    val cos = codes(m); val cs = cents(m); val cc = ccs(m)
    var best = Double.PositiveInfinity
    var bestCode = Long.MaxValue
    var i = 0
    while (i < cos.length) {
      val cent = cs(i)
      val n = math.min(sv.numElements(), cent.length)
      var dot = 0d
      var j = 0
      while (j < n) { dot += sv.getDouble(j) * cent(j); j += 1 }
      val d = math.floor((cc(i) - 2d * dot) * 1e4 + 0.5).toLong.toDouble / 1e4
      if (d < best || (d == best && cos(i) < bestCode)) { best = d; bestCode = cos(i) }
      i += 1
    }
    bestCode
  }
}

object PqArgmin {

  /** Materialize a codebook frame (m, code, cent) into kernel form.
    * The collect is the same regime call as
    * [[ProductQuant.trainCodebooksGrid]]'s materialization: the frame
    * is <= nSub * cells rows by construction and every consumer
    * broadcasts it anyway; collecting here also truncates the Lloyd
    * loop's lineage once per round instead of nesting it. */
  def fromBook(book: DataFrame): PqCodebook = {
    val rows = book
      .select(col("m").cast("int"), col("code").cast("long"), col("cent").cast("array<double>"))
      .collect()
    require(rows.nonEmpty, "empty codebook")
    val byM = rows.groupBy(_.getInt(0))
    val nM = byM.keysIterator.max + 1
    val codes = Array.ofDim[Array[Long]](nM)
    val cents = Array.ofDim[Array[Array[Double]]](nM)
    val ccs = Array.ofDim[Array[Double]](nM)
    for (m <- 0 until nM) {
      val entries = byM.getOrElse(m, Array.empty).sortBy(_.getLong(1))
      codes(m) = entries.map(_.getLong(1))
      cents(m) = entries.map(_.getSeq[Double](2).toArray)
      ccs(m) = cents(m).map { c =>
        var acc = 0d; var i = 0
        while (i < c.length) { acc += c(i) * c(i); i += 1 }
        acc
      }
    }
    new PqCodebook(codes, cents, ccs)
  }

  def column(sv: Column, m: Column, book: PqCodebook): Column =
    GraftColumnShim.column(
      PqArgminExpr(GraftColumnShim.expression(sv), GraftColumnShim.expression(m), book))
}
