package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotProductExpr, IntersectCountExpr, RollingHashExpr}

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
  }
}
