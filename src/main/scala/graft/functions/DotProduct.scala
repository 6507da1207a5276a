package graft.functions

import org.apache.spark.sql.{Column, GraftColumnShim}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native dot product over two array<double> columns.
  *
  * The HOF formulation (`aggregate(zip_with(a,b,*),0,+)`) materializes
  * an intermediate array per row and dispatches per element through
  * generic array code; this expression is a tight primitive loop over
  * the two ArrayData buffers, generated inline in whole-stage codegen.
  * Summation order is identical to the HOF version (sequential), so
  * results are bitwise unchanged — the DuckDB oracle keeps passing.
  */
case class DotProductExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  // ArrayData.getDouble on a non-double array BIT-REINTERPRETS the
  // backing buffer (an array<long> of small integers reads as ~1e-318
  // denormals — silently-wrong cosines, not an error). Refuse anything
  // but array<double> at analysis time.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case org.apache.spark.sql.types.ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<double> inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.eval(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.DotProduct.eval($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Static entry point shared by interpreted eval and generated code. */
  def eval(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0d
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  def column(a: Column, b: Column): Column =
    GraftColumnShim.column(DotProductExpr(GraftColumnShim.expression(a), GraftColumnShim.expression(b)))
}
