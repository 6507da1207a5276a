package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.Tables

/** The SURVEY §3.3(b) entry point: the same queries as the typed
  * Scala API, as `spark.sql()` text over registered temp views — the
  * surface a thriftserver / Spark Connect / notebook user gets when
  * they can't (or won't) link the Scala library. Five representative
  * shapes are covered — the OHLCV rollup (q06), the sliding-window
  * join (q09), the TPC-H Q1 pricing summary (q13), the window-function
  * battery (q54), and the inverted index (q96) — each the EXACT
  * semantics of its typed twin: same op sequence, same decimal
  * detours, same r4/r2 rounding, so results match bitwise
  * (SqlEntrySpec pins text ≡ typed for all five).
  *
  * Custom graft expressions (rolling_hash, minhash_sig, …) reach this
  * surface through [[graft.GraftExtensions]] / `Graft
  * .registerFunctions`; these five need only built-ins.
  */
object SqlEntry {

  /** Registers the base tables of `dir` as temp views (events through
    * the Tables ns→µs shim — raw parquet would bind ts as BIGINT
    * nanos). Idempotent; call before [[sql]]. */
  def registerViews(spark: SparkSession, dir: String): Unit = {
    Tables.events(spark, dir).createOrReplaceTempView("events")
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem")
    Tables.documents(spark, dir).createOrReplaceTempView("documents")
  }

  /** Runs a named query through the SQL-text surface. */
  def sql(spark: SparkSession, name: String): DataFrame = spark.sql(texts(name))

  // r4(x) = floor(x*1e4 + 0.5)/1e4, r2 at 1e2 — the same
  // engine-portable rounding the typed queries use (never round()).
  val texts: Map[String, String] = Map(
    "q06_ohlcv_daily" ->
      """WITH base AS (
        |  SELECT event_type, date_format(ts, 'yyyy-MM-dd') AS d,
        |    min_by(value, struct(ts, event_id)) AS open,
        |    max(value) AS high, min(value) AS low,
        |    max_by(value, struct(ts, event_id)) AS close,
        |    floor(cast(sum(cast(value AS decimal(18,2))) AS double) * 10000 + 0.5) / 10000 AS volume,
        |    count(1) AS n
        |  FROM events
        |  GROUP BY event_type, date_format(ts, 'yyyy-MM-dd'))
        |SELECT event_type, d, open, high, low, close, volume, n,
        |  CASE WHEN open = 0 THEN NULL
        |       ELSE floor(((close - open) / open * 100) * 10000 + 0.5) / 10000 END AS daily_change
        |FROM base""".stripMargin,
    "q09_windowed_join" ->
      """WITH m15 AS (
        |  SELECT event_type, window(ts, '15 minutes', '5 minutes') AS w,
        |    cast(sum(cast(value AS decimal(18,2))) AS double) / count(1) AS avg_value,
        |    stddev(value) AS volatility,
        |    cast(sum(cast(value AS decimal(18,2))) AS double) AS sum_value
        |  FROM events GROUP BY event_type, window(ts, '15 minutes', '5 minutes')),
        |m1h AS (
        |  SELECT event_type, window(ts, '1 hour', '10 minutes') AS w,
        |    cast(sum(cast(value AS decimal(18,2))) AS double) / count(1) AS avg_value,
        |    stddev(value) AS volatility,
        |    cast(sum(cast(value AS decimal(18,2))) AS double) AS sum_value
        |  FROM events GROUP BY event_type, window(ts, '1 hour', '10 minutes'))
        |SELECT s.event_type, cast(s.w.start AS bigint) AS window_start,
        |  cast(s.w.end AS bigint) AS window_15m_end,
        |  cast(l.w.end AS bigint) AS window_1h_end,
        |  floor(s.avg_value * 10000 + 0.5) / 10000 AS moving_avg_price_15m,
        |  floor(l.avg_value * 10000 + 0.5) / 10000 AS moving_avg_price_1h,
        |  floor(s.volatility * 10000 + 0.5) / 10000 AS price_volatility_15m,
        |  floor(l.volatility * 10000 + 0.5) / 10000 AS price_volatility_1h,
        |  floor(s.sum_value * 10000 + 0.5) / 10000 AS total_volume_15m,
        |  floor(l.sum_value * 10000 + 0.5) / 10000 AS total_volume_1h
        |FROM m15 s JOIN m1h l
        |  ON s.event_type = l.event_type
        | AND cast(s.w.start AS bigint) = cast(l.w.start AS bigint)""".stripMargin,
    "q13_tpch_q1" ->
      """SELECT l_returnflag, l_linestatus,
        |  floor(cast(sum(cast(l_quantity AS decimal(18,2))) AS double) * 100 + 0.5) / 100 AS sum_qty,
        |  floor(cast(sum(cast(l_extendedprice AS decimal(18,2))) AS double) * 100 + 0.5) / 100 AS sum_base_price,
        |  floor(cast(sum(cast(l_extendedprice * (1 - l_discount) AS decimal(28,4))) AS double) * 100 + 0.5) / 100 AS sum_disc_price,
        |  floor(cast(sum(cast(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS decimal(28,6))) AS double) * 100 + 0.5) / 100 AS sum_charge,
        |  floor(cast(sum(cast(l_quantity AS decimal(18,2))) AS double) / count(1) * 10000 + 0.5) / 10000 AS avg_qty,
        |  floor(cast(sum(cast(l_extendedprice AS decimal(18,2))) AS double) / count(1) * 10000 + 0.5) / 10000 AS avg_price,
        |  floor(cast(sum(cast(l_discount AS decimal(18,2))) AS double) / count(1) * 10000 + 0.5) / 10000 AS avg_disc,
        |  count(1) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= cast('1998-09-02' AS timestamp)
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q54_window_battery" ->
      """SELECT event_id, event_type,
        |  ntile(4)       OVER (PARTITION BY event_type ORDER BY ts, event_id) AS quartile,
        |  percent_rank() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS pct_rank,
        |  cume_dist()    OVER (PARTITION BY event_type ORDER BY ts, event_id) AS cdist,
        |  nth_value(value, 3) OVER (PARTITION BY event_type ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS third_val,
        |  lead(value, 1) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS next_val,
        |  lag(value, 1)  OVER (PARTITION BY event_type ORDER BY ts, event_id) AS prev_val
        |FROM events""".stripMargin,
    "q96_inverted_index" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    explode(array_distinct(regexp_extract_all(lower(text), '[a-z0-9]+', 0))) AS term
        |  FROM documents)
        |SELECT term, count(1) AS df,
        |  array_join(transform(sort_array(collect_list(doc_id)), x -> cast(x AS string)), ',') AS postings
        |FROM t
        |GROUP BY term
        |HAVING count(1) >= 2
        |   AND cast(count(1) AS double) <= 0.9 * (SELECT count(1) FROM documents)""".stripMargin
  )
}
