package graft.functions

import org.apache.spark.sql.{Column, GraftColumnShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprints (Schleimer, Wilkerson, Aiken — "Winnowing:
  * Local Algorithms for Document Fingerprinting", the MOSS
  * algorithm) as ONE native codegen expression: for a document's
  * UTF-8 bytes, hash every `gramBytes`-byte gram with the polynomial
  * rolling-hash family ([[RollingHash.Base]]/[[RollingHash.Mod]]),
  * slide a `window`-gram window and keep each window's MINIMUM hash,
  * returning the DISTINCT selected fingerprints.
  *
  * Guarantee: two documents sharing any substring of at least
  * `gramBytes + window - 1` bytes select at least one identical
  * fingerprint from it, regardless of where the substring sits in
  * either document (contrast aligned fixed-stride blocks, which any
  * upstream insertion shifts out of phase).
  *
  * Replaces a 5-operator HOF pipeline (per-position `md5(substring)`
  * + `slice`/`array_min` over 32-char hex strings) that allocated two
  * O(n) string arrays per row; this is a single O(n) pass over the
  * byte array with long arithmetic only. Cross-engine parity: the
  * gram hash is a left fold `h = (h*B + byte) % P` — expressible in
  * DuckDB as `list_reduce` over the hex-decoded byte list, so the
  * winnowed output is strictly oracle-checkable (q73).
  *
  * Degenerate inputs follow the subset semantics of the HOF form:
  * fewer than `gramBytes` bytes -> empty; fewer than `window` grams
  * (but >= 1) -> the single global-min gram hash.
  */
case class WinnowFpsExpr(child: Expression, gramBytes: Int, window: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fps"

  override protected def nullSafeEval(input: Any): Any =
    Winnow.eval(input.asInstanceOf[UTF8String], gramBytes, window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Winnow.eval($c, $gramBytes, $window)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFpsExpr =
    copy(child = newChild)
}

object Winnow {
  import RollingHash.{Base, Mod}

  /** Static entry point shared by interpreted eval and generated code. */
  def eval(s: UTF8String, gramBytes: Int, window: Int): ArrayData = {
    val bytes = s.getBytes
    val nGrams = bytes.length - gramBytes + 1
    if (nGrams <= 0) return new GenericArrayData(Array.empty[Long])
    // per-position gram hashes: fresh 8-byte fold per position (a few
    // multiplies) rather than a remove-leading-term rolling update —
    // identical to the oracle's list_reduce fold, no modular-inverse
    // subtleties, still O(n * gramBytes) long ops.
    val grams = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      var h = 0L
      var j = 0
      while (j < gramBytes) {
        h = (h * Base + (bytes(i + j) & 0xff)) % Mod
        j += 1
      }
      grams(i) = h
      i += 1
    }
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    if (nGrams < window) {
      var m = grams(0)
      i = 1
      while (i < nGrams) { if (grams(i) < m) m = grams(i); i += 1 }
      out.add(m)
    } else {
      // window-min per position; w is small (4), so the direct scan
      // beats a deque on constant factors and matches the oracle's
      // list_min(grams[j:j+w-1]) structure term for term.
      i = 0
      while (i <= nGrams - window) {
        var m = grams(i)
        var j = 1
        while (j < window) { if (grams(i + j) < m) m = grams(i + j); j += 1 }
        out.add(m)
        i += 1
      }
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    i = 0
    while (it.hasNext) { arr(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(arr)
  }

  def column(c: Column, gramBytes: Int = 8, window: Int = 4): Column =
    GraftColumnShim.column(WinnowFpsExpr(GraftColumnShim.expression(c), gramBytes, window))
}
