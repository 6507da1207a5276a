package graft.functions

import org.apache.spark.sql.{Column, GraftColumnShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash over a string's UTF-8 bytes:
  * h = sum(b_i * B^i) mod P with B=257, P=1_000_000_007.
  *
  * A native Catalyst expression with whole-stage codegen (not a Scala
  * UDF): the generated code calls the static `eval` below, so the hot
  * path stays inside the codegen'd stage with no serialization or
  * closure dispatch. Used for document fingerprinting and as the
  * shingle hash in content-defined chunking.
  */
case class RollingHashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override protected def nullSafeEval(input: Any): Any =
    RollingHash.eval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHash.eval($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingHashExpr =
    copy(child = newChild)
}

object RollingHash {
  final val Base = 257L
  final val Mod  = 1000000007L

  /** Static entry point shared by interpreted eval and generated code. */
  def eval(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * Base + (bytes(i) & 0xff)) % Mod
      i += 1
    }
    h
  }

  def column(c: Column): Column = GraftColumnShim.column(RollingHashExpr(GraftColumnShim.expression(c)))
}
