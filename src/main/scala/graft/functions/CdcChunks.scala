package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, GraftColumnShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking: split a document where the Rabin-style
  * rolling hash of the trailing `window` bytes satisfies
  * `hash % modulus == 0`, bounded to [minSize, maxSize] bytes.
  *
  * Unlike fixed-size chunking (TextAnalysis.chunks), boundaries are a
  * function of local CONTENT: inserting or deleting text early in a
  * document shifts only the chunks up to the next content-defined cut
  * — every later chunk is byte-identical, so chunk-level dedup between
  * document versions actually hits (the rsync/LBFS/FastCDC principle;
  * expected chunk size ≈ minSize + modulus bytes).
  *
  * A native codegen'd expression: one pass over the UTF-8 bytes per
  * row inside whole-stage codegen, no UDF serialization. Cuts are
  * snapped forward to UTF-8 codepoint starts so chunks stay valid
  * strings and concat(chunks) == document.
  */
case class CdcChunksExpr(child: Expression, window: Int, modulus: Int,
                         minSize: Int, maxSize: Int) extends UnaryExpression {
  require(window > 0 && modulus > 0 && 0 < minSize && minSize <= maxSize,
    s"bad CDC params: window=$window modulus=$modulus min=$minSize max=$maxSize")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "cdc_chunks"

  override protected def nullSafeEval(input: Any): Any =
    CdcChunks.eval(input.asInstanceOf[UTF8String], window, modulus, minSize, maxSize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CdcChunks.eval($c, $window, $modulus, $minSize, $maxSize)")

  override protected def withNewChildInternal(newChild: Expression): CdcChunksExpr =
    copy(child = newChild)
}

object CdcChunks {
  final val Base = 257L
  final val Mod = 1000000007L

  /** Static entry point shared by interpreted eval and generated code. */
  def eval(s: UTF8String, window: Int, modulus: Int, minSize: Int, maxSize: Int): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    // B^(window-1) mod P for removing the outgoing byte
    var bw = 1L
    var p = 0
    while (p < window - 1) { bw = (bw * Base) % Mod; p += 1 }
    val out = ArrayBuffer.empty[Any]
    var start = 0
    var h = 0L
    var i = 0
    while (i < n) {
      val in = bytes(i) & 0xff
      h = (h * Base + in) % Mod
      val filled = i - start + 1
      if (filled > window) {
        val outByte = bytes(i - window) & 0xff
        h = ((h - (outByte * bw) % Mod % Mod * Base) % Mod + Mod * Base) % Mod
      }
      val size = i - start + 1
      // candidate cut AFTER byte i; snap forward to a codepoint start
      val boundary = size >= minSize &&
        (size >= maxSize || (filled >= window && h % modulus == 0)) &&
        (i + 1 >= n || (bytes(i + 1) & 0xc0) != 0x80)
      if (boundary) {
        out += UTF8String.fromBytes(java.util.Arrays.copyOfRange(bytes, start, i + 1))
        start = i + 1
        h = 0L
      }
      i += 1
    }
    if (start < n) out += UTF8String.fromBytes(java.util.Arrays.copyOfRange(bytes, start, n))
    new GenericArrayData(out.toArray)
  }

  def column(c: Column, window: Int = 16, modulus: Int = 64,
             minSize: Int = 32, maxSize: Int = 256): Column =
    GraftColumnShim.column(
      CdcChunksExpr(GraftColumnShim.expression(c), window, modulus, minSize, maxSize))
}
