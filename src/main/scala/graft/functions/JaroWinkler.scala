package graft.functions

import org.apache.spark.sql.{Column, GraftColumnShim}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler string similarity (Winkler 1990) as a native codegen
  * expression — the entity-resolution scorer for spelling-variant /
  * fuzzy-key matching where edit distance is too coarse (it weights
  * shared prefixes and tolerates transpositions).
  *
  * Semantics pinned to DuckDB's `jaro_winkler_similarity` so the
  * oracle replays the SAME double bit for bit (verified over 20k
  * random pairs + the textbook vectors):
  *   - match window = max(|a|,|b|)/2 − 1 (floored at 0);
  *   - transpositions = half the out-of-order matched positions;
  *   - jaro = (m/|a| + m/|b| + (m−t)/m) / 3, exactly that IEEE
  *     grouping, left to right;
  *   - Winkler bonus jw = jaro + l·0.1·(1−jaro) (that grouping) for
  *     the common prefix l ≤ 4, applied only when jaro > 0.7;
  *   - either side empty ⇒ 0.0 (DuckDB's convention — INCLUDING the
  *     both-empty case, where the textbook says 1.0).
  *
  * Byte-granular (UTF8String bytes): identical to character-granular
  * on the ASCII tokens this battery feeds it; non-ASCII callers must
  * normalize first (documented contract, not checked).
  */
case class JaroWinklerExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == org.apache.spark.sql.types.StringType &&
        right.dataType == org.apache.spark.sql.types.StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two string inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.eval(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.JaroWinkler.eval($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerExpr =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  /** Static entry point shared by interpreted eval and generated code. */
  def eval(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.getBytes
    val b = ub.getBytes
    val l1 = a.length
    val l2 = b.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2, i + window + 1)
      var j = lo
      var found = false
      while (j < hi && !found) {
        if (!m2(j) && a(i) == b(j)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: walk both matched sequences in order
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (a(i) != b(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val jaro = (m.toDouble / l1 + m.toDouble / l2 + (m - t).toDouble / m) / 3.0
    if (jaro > 0.7) {
      var l = 0
      val maxP = math.min(4, math.min(l1, l2))
      while (l < maxP && a(l) == b(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    } else jaro
  }

  def column(a: Column, b: Column): Column =
    GraftColumnShim.column(JaroWinklerExpr(
      GraftColumnShim.expression(a), GraftColumnShim.expression(b)))
}
