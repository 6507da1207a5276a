package graft

import org.apache.spark.sql.{GraftFunctionRegistry, SparkSession}

import graft.core.Tables
import graft.functions.RollingHashExpr

/** Library facade: one call wires a session for SQL use — all
  * testdata tables as temp views plus the engine's custom SQL
  * functions — so every query in this library is also reachable via
  * `spark.sql(...)` (the reference exposes no SQL interface; this
  * engine does).
  */
object Graft {

  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every testdata table under its name as a temp view. */
  def registerTables(spark: SparkSession, dir: String): Unit =
    tableNames.foreach { t =>
      Tables(spark, dir, t).createOrReplaceTempView(t)
    }

  /** Register the engine's custom expressions for SQL — the same set
    * GraftExtensions installs cluster-wide via spark.sql.extensions:
    * rolling_hash, dot_product, intersect_count, cdc_chunks,
    * minhash_sig, simhash_agg. */
  def registerFunctions(spark: SparkSession): Unit = {
    GraftFunctionRegistry.registerTemp(spark, "rolling_hash",
      exprs => RollingHashExpr(exprs.head))
    GraftFunctionRegistry.registerTemp(spark, "dot_product",
      exprs => graft.functions.DotProductExpr(exprs(0), exprs(1)))
    GraftFunctionRegistry.registerTemp(spark, "intersect_count",
      exprs => graft.functions.IntersectCountExpr(exprs(0), exprs(1)))
    GraftFunctionRegistry.registerTemp(spark, "cdc_chunks",
      exprs => GraftExtensions.cdcChunks(exprs))
    GraftFunctionRegistry.registerTemp(spark, "minhash_sig",
      exprs => GraftExtensions.minHashSig(exprs))
    GraftFunctionRegistry.registerTemp(spark, "simhash_agg",
      exprs => graft.functions.SimHashAgg(exprs.head))
    GraftFunctionRegistry.registerTemp(spark, "winnow_fps",
      exprs => GraftExtensions.winnowFps(exprs))
    GraftFunctionRegistry.registerTemp(spark, "ewma",
      exprs => GraftExtensions.ewma(exprs))
    GraftFunctionRegistry.registerTemp(spark, "interleave_bits",
      exprs => graft.functions.InterleaveBitsExpr(exprs(0), exprs(1)))
    GraftFunctionRegistry.registerTemp(spark, "json_long_field",
      exprs => graft.functions.JsonLongFieldExpr(exprs(0), exprs(1)))
  }

  /** Enable the binned range-join rewrite on a LIVE session (the
    * cluster path is `spark.sql.extensions=graft.GraftExtensions` +
    * the conf key): registers [[graft.plans.BinnedRangeJoin]] in
    * `experimental.extraOptimizations` and sets its bin width.
    * Idempotent; `binSize <= 0` disables without unregistering. */
  def enableRangeJoinRewrite(spark: SparkSession, binSize: Double): Unit = {
    spark.conf.set(graft.plans.BinnedRangeJoin.BinSizeKey, binSize.toString)
    if (!spark.experimental.extraOptimizations.contains(graft.plans.BinnedRangeJoin))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.BinnedRangeJoin
  }
}
