package graft.functions

import org.apache.spark.sql.{Column, GraftColumnShim}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Tight long-field extraction from a flat JSON object column.
  *
  * Spark 4.1's `get_json_object` constructs an InputStreamReader +
  * Jackson parser PER ROW (GetJsonObjectEvaluator.evaluate →
  * CreateJacksonParser.utf8String), which a thread-stack sample showed
  * dominating the q126/q158 scans at the 100x probe — 80–220 s of
  * allocation storm + Jackson BufferRecycler ThreadLocal contention
  * across 32 threads for a two-field `{"k": N}` blob, vs ~3 s of
  * actual aggregate work. At 100 TB the per-row parser IS the query
  * cost, so the feed's fixed-shape numeric field gets a zero-allocation
  * byte scan instead, inlined into whole-stage codegen. Scope is
  * deliberate and documented: top-level unquoted integer fields of a
  * flat object (the reference feed's props shape, stream_data_producer
  * .py's metadata blob). Nested paths / string values / scientific
  * notation stay on `from_json` with a schema (parser reused per
  * partition) — NOT on get_json_object.
  *
  * Semantics match `get_json_object(j, "$.key")::long` on this shape:
  * missing key, null/non-integer value, or malformed input → null.
  */
case class JsonLongFieldExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "json_long_field"

  override protected def nullSafeEval(json: Any, key: Any): Any =
    JsonField.evalLong(json.asInstanceOf[UTF8String], key.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (j, k) => {
      s"""
         |Object ${ev.value}_r = graft.functions.JsonField.evalLong($j, $k);
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ((Long) ${ev.value}_r).longValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): JsonLongFieldExpr =
    copy(left = newLeft, right = newRight)
}

object JsonField {
  /** Scan `json` for `"key"` (top-level, first occurrence), skip
    * `: \t\n\r`, parse an optional-minus integer run. Null on any
    * deviation. Zero allocation on the hot path. */
  def evalLong(json: UTF8String, key: UTF8String): java.lang.Long = {
    val b = json.getBytes
    val k = key.getBytes
    val n = b.length
    var i = 0
    while (i + k.length + 1 < n) {
      // match "key" with surrounding quotes
      if (b(i) == '"' && i + k.length + 1 < n && b(i + k.length + 1) == '"' &&
          matches(b, i + 1, k)) {
        var j = i + k.length + 2
        while (j < n && isWs(b(j))) j += 1
        if (j >= n || b(j) != ':') {
          // the quoted key bytes appeared without a following colon
          // (e.g. as a string VALUE) — keep scanning, don't give up
          i = j
          // (the while condition re-checks bounds)
        } else {
        j += 1
        while (j < n && isWs(b(j))) j += 1
        if (j >= n) return null
        var neg = false
        if (b(j) == '-') { neg = true; j += 1 }
        if (j >= n || b(j) < '0' || b(j) > '9') return null
        var v = 0L
        while (j < n && b(j) >= '0' && b(j) <= '9') {
          v = v * 10 + (b(j) - '0')
          j += 1
        }
        // the value must END the number: , } or whitespace (a decimal
        // point / exponent means non-integer -> null, matching the
        // ::long cast contract on this shape only for integers)
        if (j < n && b(j) != ',' && b(j) != '}' && !isWs(b(j))) return null
        return java.lang.Long.valueOf(if (neg) -v else v)
        }
      }
      i += 1
    }
    null
  }

  @inline private def isWs(c: Byte): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r'

  @inline private def matches(b: Array[Byte], off: Int, k: Array[Byte]): Boolean = {
    var i = 0
    while (i < k.length) {
      if (b(off + i) != k(i)) return false
      i += 1
    }
    true
  }

  /** `json_long_field(json, key)` as a Column. */
  def longField(json: Column, key: String): Column =
    GraftColumnShim.column(JsonLongFieldExpr(
      GraftColumnShim.expression(json),
      GraftColumnShim.expression(org.apache.spark.sql.functions.lit(key))))
}
