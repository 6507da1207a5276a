package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{AnalyticsQueries, AuditQueries, BehaviorQueries, CurationQueries, ExtensionQueries, GovernQueries, InsightQueries, MarketQueries, ParityQueries, PipelineQueries, RelationalQueries, SketchQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps one entry per implemented operator (SURVEY.md §2 +
  * north-star extensions); `oracleSql` carries the DuckDB-equivalent
  * SQL for every SQL-expressible query. Column names and rounding are
  * deliberately identical on both sides (see graft.queries.r4).
  */
object SparkEntry {

  /** Flagship query on sf=0.001: the reference's core semantic — the
    * 15m/1h sliding-window metrics join (spark_stream_processor.py:
    * 164-221) in its legal batch form. Driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q09_windowed_join")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ParityQueries.queries ++ ExtensionQueries.queries ++ AnalyticsQueries.queries ++
      CurationQueries.queries ++ PipelineQueries.queries ++ RelationalQueries.queries ++
      SketchQueries.queries ++ MarketQueries.queries ++ BehaviorQueries.queries ++
      GovernQueries.queries ++ AuditQueries.queries ++ InsightQueries.queries

  def oracleSql: Map[String, String] =
    ParityQueries.oracleSql ++ ExtensionQueries.oracleSql ++ AnalyticsQueries.oracleSql ++
      CurationQueries.oracleSql ++ PipelineQueries.oracleSql ++ RelationalQueries.oracleSql ++
      SketchQueries.oracleSql ++ MarketQueries.oracleSql ++ BehaviorQueries.oracleSql ++
      GovernQueries.oracleSql ++ AuditQueries.oracleSql ++ InsightQueries.oracleSql
}
