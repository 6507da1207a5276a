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

  /** Register custom expressions for SQL:
    *  - rolling_hash(str): the codegen'd polynomial fingerprint. */
  def registerFunctions(spark: SparkSession): Unit =
    GraftFunctionRegistry.registerTemp(spark, "rolling_hash",
      exprs => RollingHashExpr(exprs.head))
}
