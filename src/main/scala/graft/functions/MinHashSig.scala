package graft.functions

import org.apache.spark.sql.{Column, GraftColumnShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** One-pass MinHash signature over a pre-hashed token array.
  *
  * Bitwise-identical to the HOF formulation
  * `array((0 until n).map(i => array_min(transform(toks, t => xxhash64(lit(i), t)))))`
  * — sig(i) = min over tokens of XXH64(token, XXH64.hashInt(i, 42)), the
  * exact chain Spark's `xxhash64(lit(i), tok)` computes — but in a single
  * tight loop over the array instead of `n` interpreted lambda passes.
  * Higher-order functions are excluded from subexpression elimination and
  * evaluate their lambdas interpreted, so the HOF version costs
  * n_hashes × n_tokens boxed dispatches per row (~760 µs/row at n=64);
  * this expression stays inside whole-stage codegen and runs the same
  * arithmetic in ~20 µs/row. `array_distinct` is dropped entirely:
  * duplicate tokens cannot change a minimum.
  *
  * Null semantics match the HOF form exactly: a null or empty input
  * array → a (non-null) array of n nulls — `array(...)` over null
  * `array_min`s is itself non-null — and a null token contributes
  * seed(i) (xxhash64 skips null children, leaving the running hash at
  * the seed). The expression is therefore never null.
  */
case class MinHashSigExpr(child: Expression, numHashes: Int) extends UnaryExpression {
  require(numHashes > 0, "numHashes must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = false
  override def prettyName: String = "minhash_sig"

  @transient private lazy val seeds: Array[Long] = MinHashSig.seeds(numHashes)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) MinHashSig.nullSig(numHashes)
    else MinHashSig.sig(v.asInstanceOf[ArrayData], seeds)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val seedsRef = ctx.addReferenceObj("minhashSeeds", seeds, "long[]")
    val childGen = child.genCode(ctx)
    val javaType = org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator.javaType(dataType)
    ev.copy(
      code = code"""
        ${childGen.code}
        $javaType ${ev.value} = ${childGen.isNull}
          ? graft.functions.MinHashSig.nullSig($seedsRef.length)
          : graft.functions.MinHashSig.sig(${childGen.value}, $seedsRef);
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

object MinHashSig {
  /** seed(i) = XXH64 state after hashing the Int literal i from Spark's
    * default seed 42 — the prefix `xxhash64(lit(i), …)` computes. */
  def seeds(numHashes: Int): Array[Long] =
    Array.tabulate(numHashes)(i => XXH64.hashInt(i, 42L))

  /** Signature for a null input array: n null elements. */
  def nullSig(numHashes: Int): ArrayData = new GenericArrayData(new Array[Any](numHashes))

  /** Static entry point shared by interpreted eval and generated code. */
  def sig(arr: ArrayData, seeds: Array[Long]): ArrayData = {
    val n = seeds.length
    val ne = arr.numElements()
    if (ne == 0) return nullSig(n)
    val mins = new Array[Long](n)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var j = 0
    while (j < ne) {
      if (arr.isNullAt(j)) {
        var i = 0
        while (i < n) { if (seeds(i) < mins(i)) mins(i) = seeds(i); i += 1 }
      } else {
        val tok = arr.getLong(j)
        var i = 0
        while (i < n) {
          val h = XXH64.hashLong(tok, seeds(i))
          if (h < mins(i)) mins(i) = h
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  def column(tokens: Column, numHashes: Int): Column =
    GraftColumnShim.column(MinHashSigExpr(GraftColumnShim.expression(tokens), numHashes))
}
