package graft.functions

import org.apache.spark.sql.{Column, GraftColumnShim}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Intersection cardinality of two SORTED array<long> columns via a
  * linear merge scan — the hot inner loop of set-similarity
  * verification. Replaces `size(array_intersect(a, b))`, which builds
  * a hash set and materializes the intersection array per pair; this
  * is a branch-only two-pointer walk generated inline by whole-stage
  * codegen. Inputs MUST be sorted ascending and duplicate-free
  * (array_sort(array_distinct(...)) upstream).
  */
case class IntersectCountExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    IntersectCount.eval(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.IntersectCount.eval($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): IntersectCountExpr =
    copy(left = newLeft, right = newRight)
}

object IntersectCount {
  /** Static entry point shared by interpreted eval and generated code. */
  def eval(a: ArrayData, b: ArrayData): Int = {
    val (na, nb) = (a.numElements(), b.numElements())
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  def column(a: Column, b: Column): Column =
    GraftColumnShim.column(IntersectCountExpr(GraftColumnShim.expression(a), GraftColumnShim.expression(b)))
}
