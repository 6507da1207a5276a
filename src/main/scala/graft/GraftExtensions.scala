package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CdcChunksExpr, DotProductExpr, IntersectCountExpr, MinHashSigExpr, RollingHashExpr, SimHashAgg}

/** Cluster-wide installation of the engine's custom Catalyst
  * expressions — the idiomatic Spark deployment path:
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * makes `rolling_hash`, `dot_product` and `intersect_count` available
  * in EVERY session's SQL (and in thriftserver/connect sessions that
  * never touch Scala), without the per-session
  * `Graft.registerFunctions` call. Both paths share the same
  * expression classes, so plans and codegen are identical.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    def info(name: String, usage: String) =
      new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")
    ext.injectFunction((
      FunctionIdentifier("rolling_hash"),
      info("rolling_hash", "rolling_hash(str) - polynomial rolling hash over UTF-8 bytes (B=257, P=1e9+7)"),
      (exprs: Seq[Expression]) => RollingHashExpr(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a, b) - sequential-order dot product of two array<double>"),
      (exprs: Seq[Expression]) => DotProductExpr(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("intersect_count"),
      info("intersect_count", "intersect_count(a, b) - |A ∩ B| of two SORTED distinct arrays (merge scan)"),
      (exprs: Seq[Expression]) => IntersectCountExpr(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("cdc_chunks"),
      info("cdc_chunks", "cdc_chunks(str[, window, modulus, minSize, maxSize]) - content-defined chunks (Rabin rolling window)"),
      (exprs: Seq[Expression]) => GraftExtensions.cdcChunks(exprs)))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(tokens, n) - one-pass n-permutation MinHash signature of an array<bigint>"),
      (exprs: Seq[Expression]) => GraftExtensions.minHashSig(exprs)))
    ext.injectFunction((
      FunctionIdentifier("simhash_agg"),
      info("simhash_agg", "simhash_agg(hash) - aggregate: 64-bit SimHash of a column of token hashes"),
      (exprs: Seq[Expression]) => SimHashAgg(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("winnow_fps"),
      info("winnow_fps", "winnow_fps(str[, gramBytes, window]) - distinct MOSS winnowing fingerprints (poly gram hash + window min)"),
      (exprs: Seq[Expression]) => GraftExtensions.winnowFps(exprs)))
    ext.injectFunction((
      FunctionIdentifier("ewma"),
      info("ewma", "ewma(array<double>, alpha) - exponentially-weighted moving average over an ordered series (per-element output)"),
      (exprs: Seq[Expression]) => GraftExtensions.ewma(exprs)))
    ext.injectFunction((
      FunctionIdentifier("json_long_field"),
      info("json_long_field", "json_long_field(json, key) - zero-allocation long extraction of a top-level unquoted integer field (see JsonField.scala for scope)"),
      (exprs: Seq[Expression]) => graft.functions.JsonLongFieldExpr(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("interleave_bits"),
      info("interleave_bits", "interleave_bits(a, b) - Morton z-value: bit j of a at position 2j, of b at 2j+1 (low 32 bits each)"),
      (exprs: Seq[Expression]) => graft.functions.InterleaveBitsExpr(exprs(0), exprs(1))))
    // optimizer rule: binned range-join rewrite (no-op until
    // spark.graft.rangeJoin.binSize is set to a positive width)
    ext.injectOptimizerRule(_ => graft.plans.BinnedRangeJoin)
  }
}

object GraftExtensions {
  private def intArg(e: Expression, name: String): Int = e.eval(null) match {
    case i: Int => i
    case l: Long => l.toInt
    case s: Short => s.toInt
    case b: Byte => b.toInt
    case other => throw new IllegalArgumentException(s"cdc_chunks: $name must be an integer literal, got $other")
  }

  /** Shared builder for the SQL surface: tokens + int-literal hash
    * count. */
  def minHashSig(exprs: Seq[Expression]): MinHashSigExpr = {
    require(exprs.size == 2, s"minhash_sig takes 2 arguments, got ${exprs.size}")
    MinHashSigExpr(exprs.head, intArg(exprs(1), "numHashes"))
  }

  private def doubleArg(e: Expression, name: String): Double = e.eval(null) match {
    case d: Double => d
    case f: Float => f.toDouble
    case i: Int => i.toDouble
    case l: Long => l.toDouble
    case d: java.math.BigDecimal => d.doubleValue()
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case other => throw new IllegalArgumentException(s"ewma: $name must be a numeric literal, got $other")
  }

  /** Shared builder for the SQL surface: array + numeric-literal
    * smoothing factor. */
  def ewma(exprs: Seq[Expression]): graft.functions.EwmaExpr = {
    require(exprs.size == 2, s"ewma takes 2 arguments, got ${exprs.size}")
    graft.functions.EwmaExpr(exprs.head, doubleArg(exprs(1), "alpha"))
  }

  /** Shared builder for the SQL surface: string + optional int-literal
    * gram/window sizes. */
  def winnowFps(exprs: Seq[Expression]): graft.functions.WinnowFpsExpr = {
    require(exprs.size == 1 || exprs.size == 3,
      s"winnow_fps takes 1 or 3 arguments, got ${exprs.size}")
    if (exprs.size == 1) graft.functions.WinnowFpsExpr(exprs.head, 8, 4)
    else graft.functions.WinnowFpsExpr(exprs.head,
      intArg(exprs(1), "gramBytes"), intArg(exprs(2), "window"))
  }

  /** Shared builder for the SQL surface: string + optional int-literal
    * params (window, modulus, minSize, maxSize). */
  def cdcChunks(exprs: Seq[Expression]): CdcChunksExpr = {
    require(exprs.size == 1 || exprs.size == 5,
      s"cdc_chunks takes 1 or 5 arguments, got ${exprs.size}")
    if (exprs.size == 1) CdcChunksExpr(exprs.head, 16, 64, 32, 256)
    else CdcChunksExpr(exprs.head,
      intArg(exprs(1), "window"), intArg(exprs(2), "modulus"),
      intArg(exprs(3), "minSize"), intArg(exprs(4), "maxSize"))
  }
}
