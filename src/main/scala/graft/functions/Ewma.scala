package graft.functions

import org.apache.spark.sql.{Column, GraftColumnShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Exponentially-weighted moving average over an ORDERED series:
  * y_0 = x_0; y_i = alpha * x_i + (1 - alpha) * y_{i-1}.
  *
  * EWMA is the canonical order-dependent recursion that windowed
  * aggregates cannot express (every output depends on the entire
  * prefix), and the closed-form rewrite sum(x_j * (1-alpha)^(i-j))
  * overflows double for long series. The scale-correct Spark shape is
  * per-key: sort_array(collect_list(struct(order, x))) per group,
  * then this one-pass O(n) expression over the value array —
  * the GROUP is the parallelism unit (same argument as any per-key
  * sequential scan: no global order exists across keys).
  *
  * Cross-engine parity is exact-by-construction: the fold performs
  * the identical IEEE multiply/add sequence in the identical order on
  * any engine, so results are bitwise reproducible (oracle q82
  * replays the same fold with DuckDB list_reduce prefixes).
  *
  * Null elements propagate the previous smoothed value (gap-carry)
  * and emit null at positions before any value arrived.
  */
case class EwmaExpr(child: Expression, alpha: Double) extends UnaryExpression {
  require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def prettyName: String = "ewma"

  override protected def nullSafeEval(input: Any): Any =
    Ewma.eval(input.asInstanceOf[ArrayData], alpha)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Ewma.eval($c, $alpha)")

  override protected def withNewChildInternal(newChild: Expression): EwmaExpr =
    copy(child = newChild)
}

object Ewma {
  /** Static entry point shared by interpreted eval and generated code. */
  def eval(xs: ArrayData, alpha: Double): ArrayData = {
    val n = xs.numElements()
    val out = new Array[Any](n)
    var y = 0.0
    var seeded = false
    var i = 0
    while (i < n) {
      if (!xs.isNullAt(i)) {
        val x = xs.getDouble(i)
        y = if (seeded) alpha * x + (1.0 - alpha) * y else x
        seeded = true
      }
      out(i) = if (seeded) java.lang.Double.valueOf(y) else null
      i += 1
    }
    new GenericArrayData(out)
  }

  def column(c: Column, alpha: Double): Column =
    GraftColumnShim.column(EwmaExpr(GraftColumnShim.expression(c), alpha))
}
