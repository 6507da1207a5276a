package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{Dedup, MergeUpsert, Ohlcv, SlidingWindows}

/** Reference-parity operator suite (SURVEY.md §2), one oracle-checked
  * query per operator family, all over the driver testdata. Reference
  * sites are cited per query; the DuckDB SQL in `oracleSql` is the
  * semantic contract.
  */
object ParityQueries {

  private def ev(s: SparkSession, dir: String) = Tables.events(s, dir)
  private def li(s: SparkSession, dir: String) = Tables.lineitem(s, dir)

  // q01 — ingest cleaning: casts P7-P10 + JSON decode P12
  // (spark_stream_processor.py:129-137, consumers' json.loads).
  private def q01(s: SparkSession, dir: String): DataFrame =
    ev(s, dir).select(
      col("event_id"),
      // P7 string->timestamp round-trip (second precision)
      to_timestamp(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss")).cast("long").as("ts_sec"),
      // P10 `%`-suffix strip + P8 cast->double (change_percent cleaning)
      regexp_replace(concat(col("value").cast("string"), lit("%")), "%", "").cast("double").as("price_clean"),
      // P9 string->long (volume cast; engine uses long, SURVEY §1.3)
      col("user_id").cast("string").cast("long").as("vol"),
      // P12 JSON field decode
      graft.functions.JsonField.longField(col("props"), "k").as("k")
    )

  // q02 — scan + filter + projection (P1/P6; pushdown-eligible).
  private def q02(s: SparkSession, dir: String): DataFrame =
    li(s, dir)
      .filter(col("l_shipdate") < lit("1996-01-01").cast("timestamp")
        && col("l_returnflag").isNotNull && col("l_returnflag") =!= "")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")

  // q03 — derived arithmetic columns (P2/P5). Per-row IEEE arithmetic
  // is bitwise identical cross-engine; no rounding.
  private def q03(s: SparkSession, dir: String): DataFrame =
    li(s, dir).select(
      col("l_orderkey"), col("l_linenumber"),
      (col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("net_price"),
      (col("l_discount") * lit(100)).as("disc_pct")
    )

  // q04/q05 — deterministic dedup first/last (A1/A2).
  private def dedupCols(df: DataFrame) =
    df.select(col("user_id"), col("event_type"), col("event_id"),
      unix_micros(col("ts")).as("ts_us"), col("value"))
  private def q04(s: SparkSession, dir: String): DataFrame =
    dedupCols(Dedup.keepFirst(ev(s, dir), Seq("user_id", "event_type"), Seq(col("ts"), col("event_id"))))
  private def q05(s: SparkSession, dir: String): DataFrame =
    dedupCols(Dedup.keepLast(ev(s, dir), Seq("user_id", "event_type"), Seq(col("ts"), col("event_id"))))

  // q06 — daily OHLCV rollup + daily_change (A5/P5/P13,
  // spark_batch_processor.py:89-101), deterministic open/close.
  private def q06(s: SparkSession, dir: String): DataFrame =
    Ohlcv.rollup(
      ev(s, dir),
      keys = Seq(col("event_type"), date_format(col("ts"), "yyyy-MM-dd")),
      keyNames = Seq("event_type", "d"),
      valueCol = col("value"),
      order = Seq(col("ts"), col("event_id")),
      volCol = Some(col("value").cast("decimal(18,2)"))
    ).select(
      col("event_type"), col("d"), col("open"), col("high"), col("low"), col("close"),
      r4(col("volume").cast("double")).as("volume"), col("n"),
      when(col("open") === 0, lit(null)).otherwise(r4(Ohlcv.dailyChange(col("open"), col("close")))).as("daily_change")
    )

  // q07/q08 — sliding-window metrics (A3/T2,
  // spark_stream_processor.py:164-195), batch form.
  private def windowMetrics(s: SparkSession, dir: String, dur: String, slide: String, sfx: String): DataFrame =
    SlidingWindows.metrics(ev(s, dir), col("event_type"), "event_type", col("ts"), col("value"), dur, slide, sfx)
      .select(
        col("event_type"), col("window_start"), col(s"window_end$sfx"),
        r4(col(s"avg_value$sfx")).as(s"avg_value$sfx"),
        r4(col(s"volatility$sfx")).as(s"volatility$sfx"),
        r4(col(s"sum_value$sfx")).as(s"sum_value$sfx"),
        col(s"n_events$sfx")
      )
  private def q07(s: SparkSession, dir: String): DataFrame =
    windowMetrics(s, dir, "15 minutes", "5 minutes", "_15m")
  private def q08(s: SparkSession, dir: String): DataFrame =
    windowMetrics(s, dir, "1 hour", "10 minutes", "_1h")

  // q09 — the windowed-metrics join (J1,
  // spark_stream_processor.py:197-221): 15m ⋈ 1h on (key, window_start).
  private def q09(s: SparkSession, dir: String): DataFrame = {
    val j = SlidingWindows.joined(ev(s, dir), col("event_type"), "event_type", col("ts"), col("value"))
    j.select(
      col("event_type"), col("window_start"), col("window_15m_end"), col("window_1h_end"),
      r4(col("moving_avg_price_15m")).as("moving_avg_price_15m"),
      r4(col("moving_avg_price_1h")).as("moving_avg_price_1h"),
      r4(col("price_volatility_15m")).as("price_volatility_15m"),
      r4(col("price_volatility_1h")).as("price_volatility_1h"),
      r4(col("total_volume_15m")).as("total_volume_15m"),
      r4(col("total_volume_1h")).as("total_volume_1h")
    )
  }

  // q10 — union-all (J2, pd.concat at load_to_snowflake.py:152).
  private def q10(s: SparkSession, dir: String): DataFrame = {
    val l = li(s, dir)
    val hi = l.filter(col("l_extendedprice") > 5000)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"), lit("hi").as("bucket"))
    val lo = l.filter(col("l_extendedprice") <= 500)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"), lit("lo").as("bucket"))
    hi.unionByName(lo)
  }

  // q11 — keyed MERGE upsert snapshot (J3,
  // load_to_snowflake.py:220-241) via full-outer rewrite.
  private def q11(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir)
    val target = e.filter(col("event_id") % 3 =!= 0)
      .select(col("event_id"), col("value").as("v"), lit("old").as("src"))
    val source = e.filter(col("event_id") % 2 === 0)
      .select(col("event_id"), (col("value") * 2).as("v"), lit("new").as("src"))
    MergeUpsert.upsert(target, source, Seq("event_id"))
  }

  // q12 — deterministic top-N (P15 generalized to a real orderBy/limit).
  private def q12(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)
      .select("o_orderkey", "o_custkey", "o_totalprice")

  // q13 — TPC-H Q1-style pricing summary (grouped agg battery: A3's
  // avg/sum/count + stddev-free path; bench headliner).
  private def q13(s: SparkSession, dir: String): DataFrame =
    // round-16: seven decimal aggregates per row run inside a scan
    // stage that parquet row-group boundaries cap at ~3 effective
    // tasks on the small file; the adaptive fan-out (no-op at real
    // scale, where splits >= cores) lets the partial agg use the
    // session's parallelism
    graft.operators.Skew.fanOut(li(s, dir))
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        r2(sum(col("l_quantity").cast("decimal(18,2)")).cast("double")).as("sum_qty"),
        r2(sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")).as("sum_base_price"),
        r2(sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(28,4)")).cast("double")).as("sum_disc_price"),
        r2(sum((col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).cast("decimal(28,6)")).cast("double")).as("sum_charge"),
        r4(sum(col("l_quantity").cast("decimal(18,2)")).cast("double") / count(lit(1))).as("avg_qty"),
        r4(sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double") / count(lit(1))).as("avg_price"),
        r4(sum(col("l_discount").cast("decimal(18,2)")).cast("double") / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order")
      )

  // q14 — multi-way join + agg: customer ⋈ orders ⋈ lineitem ⋈
  // broadcast(nation) revenue rollup (bench headliner; J1-family
  // equi-join at scale with explicit small-dim broadcast). Lineitem is
  // pre-aggregated to one row per order BEFORE the join — a manual
  // aggregate pushdown Catalyst does not perform: the fact⋈fact
  // shuffle join then moves |orders| rows instead of |lineitem|
  // (4× fewer at TPC-H shape), and the final per-nation rollup sums
  // exact decimal partials (associative, so results are bitwise
  // unchanged).
  private def q14(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
    val n = Tables.nation(s, dir)
    val lByOrder = li(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(
        sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(28,4)")).as("prev"),
        count(lit(1)).as("pn"))
    lByOrder.join(o, lByOrder("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        r2(sum(col("prev")).cast("double")).as("revenue"),
        sum(col("pn")).as("n_rows")
      )
  }

  // q15 — analytic window lag: per-entity price change (the tick
  // producer's `change` field, stream_data_producer.py:99-108,
  // recomputed relationally).
  private def q15(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    ev(s, dir)
      .withColumn("prev", lag("value", 1).over(w))
      .select(col("event_id"), col("user_id"), (col("value") - col("prev")).as("change"))
  }

  // q16 — the legal streaming design under the oracle: 5-min bucket
  // partials (count/sum/sum²/min/max — the mergeable state the
  // streaming leg checkpoints) -> both sliding grids derived in one
  // aggregation -> inner-join semantics (SURVEY.md §7 step 4a). This
  // pins the exact partial-combine algebra the stream uses.
  private def q16(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir).select(
      col("event_type").as("symbol"), col("ts").as("timestamp"),
      col("value").as("price"), col("user_id").as("volume"))
    val m = graft.streaming.StreamPipeline.windowedMetrics(
      graft.streaming.StreamPipeline.bucketAgg(e))
    m.select(
      col("symbol"), col("window_start"), col("window_15m_end"), col("window_1h_end"),
      r4(col("moving_avg_price_15m")).as("moving_avg_price_15m"),
      r4(col("moving_avg_price_1h")).as("moving_avg_price_1h"),
      r4(col("price_volatility_15m")).as("price_volatility_15m"),
      r4(col("price_volatility_1h")).as("price_volatility_1h"),
      col("total_volume_15m"), col("total_volume_1h")
    )
  }

  // q17 — as-of (point-in-time) join: every event gets the latest
  // "quote" (every-10th event) at or before its timestamp, per
  // user — the canonical tick⋈quote operator, cross-checked against
  // DuckDB's native ASOF JOIN.
  private def q17(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir)
    val left = e.select(col("user_id"), col("ts"), col("event_id"), col("value"))
    val quotes = Dedup.keepLast(
      e.filter(col("event_id") % 10 === 0)
        .select(col("user_id"), col("ts").as("qts"), col("event_id").as("qid"), col("value").as("qvalue")),
      Seq("user_id", "qts"), Seq(col("qid")))
    graft.operators.AsOfJoin.asOf(left, quotes, Seq("user_id"), "ts", "qts")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"), col("value"),
        col("qid"), col("qvalue"), unix_micros(col("qts")).as("qts_us"))
  }

  // q44 — the skew-safe bucketed as-of join: same semantics (and same
  // DuckDB native-ASOF oracle) as q17, but the per-event sort runs per
  // (key, 15-min bucket) with a carry table, so a degenerate key
  // cannot funnel the whole stream through one reducer.
  private def q44(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir)
    val left = e.select(col("user_id"), col("ts"), col("event_id"), col("value"))
    val quotes = Dedup.keepLast(
      e.filter(col("event_id") % 10 === 0)
        .select(col("user_id"), col("ts").as("qts"), col("event_id").as("qid"), col("value").as("qvalue")),
      Seq("user_id", "qts"), Seq(col("qid")))
    graft.operators.AsOfJoin.asOfBucketed(left, quotes, Seq("user_id"), "ts", "qts", bucketSec = 900L)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"), col("value"),
        col("qid"), col("qvalue"), unix_micros(col("qts")).as("qts_us"))
  }

  // q49 — ROLLUP grouping sets (SURVEY §2.7 explicit negative):
  // per-(returnflag, linestatus) aggregates plus subtotals and grand
  // total; grouping_id disambiguates real NULLs from subtotal rows.
  // Two-phase: aggregate to the finest grouping FIRST, then roll up
  // the tiny pre-aggregate (sums of sums, sum of counts — exact
  // decimal partials make this associative-safe). A direct rollup
  // sends every input row through Expand ×3; at 100 TB that triples
  // the shuffle input, while the pre-aggregate is one q13-shaped pass
  // and the Expand touches only |groups| rows.
  private def q49(s: SparkSession, dir: String): DataFrame =
    li(s, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("pn"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).as("pp"),
        sum(col("l_quantity").cast("decimal(18,2)")).as("pq"))
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping_id().cast("long").as("gid"),
        sum(col("pn")).as("n_rows"),
        r2(sum(col("pp")).cast("double")).as("sum_price"),
        r2(sum(col("pq")).cast("double")).as("sum_qty"))

  // q50 — INTERSECT / EXCEPT set semantics (SURVEY §2.7 explicit
  // negative): urgent-order customers vs big-spender customers, both
  // distinct-set ops, tagged and unioned into one result.
  private def q50(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
    val big = o.filter(col("o_totalprice") > 250000.0).select(col("o_custkey"))
    urgent.intersect(big).withColumn("op", lit("urgent_and_big"))
      .unionByName(urgent.except(big).withColumn("op", lit("urgent_only")))
  }

  // q18 — session windows (gap-based sessionization; beyond the
  // reference, SURVEY §2.7): per-user sessions closed after a 30-min
  // quiet gap. Spark's session_window vs the oracle's lag+cumsum
  // session-id rewrite — same semantics, cross-checked.
  private def q18(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("__w"))
      .agg(
        count(lit(1)).as("n_events"),
        r4(sum(col("value").cast("decimal(18,2)")).cast("double")).as("sum_value")
      )
      .select(
        col("user_id"),
        col("__w.start").cast("long").as("session_start"),
        col("__w.end").cast("long").as("session_end"),
        col("n_events"), col("sum_value"))

  // q19 — range (non-equi) join: price-band classification. The band
  // table is tiny -> broadcast nested loop; at scale bands stay
  // broadcastable by construction (it's a dimension).
  private def q19(s: SparkSession, dir: String): DataFrame = {
    val bands = s.createDataFrame(Seq(
      (0.0, 5.0, "low"), (5.0, 12.0, "mid"), (12.0, 1e9, "high")
    )).toDF("lo", "hi", "band")
    ev(s, dir)
      .join(broadcast(bands), col("value") >= col("lo") && col("value") < col("hi"), "left")
      .groupBy(col("event_type"), col("band"))
      .agg(count(lit(1)).as("n"),
        r4(sum(col("value").cast("decimal(18,2)")).cast("double")).as("sum_value"))
  }

  // q40 — TPC-H Q3 shape (shipping priority): segment-filtered 3-way
  // join, per-order revenue, deterministic top-10.
  private def q40(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(s, dir).filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val l = li(s, dir).filter(col("l_shipdate") > lit("1996-01-01").cast("timestamp"))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("o_orderkey"), date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"), col("o_orderpriority"))
      .agg(r2(sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(28,4)")).cast("double")).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  // q41 — TPC-H Q5 shape (local supplier volume): six-way join where
  // the customer and supplier share a nation, revenue per nation in
  // one region. Dims broadcast; facts shuffle on their join keys.
  private def q41(s: SparkSession, dir: String): DataFrame = {
    val r = Tables.region(s, dir).filter(col("r_name") === "ASIA")
    val n = Tables.nation(s, dir)
    val c = Tables.customer(s, dir)
    val sup = Tables.supplier(s, dir)
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
        && col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val l = li(s, dir)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(sup, l("l_suppkey") === sup("s_suppkey") && c("c_nationkey") === sup("s_nationkey"))
      .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(r2(sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(28,4)")).cast("double")).as("revenue"),
        count(lit(1)).as("n_rows"))
  }

  // q42 — TPC-H Q4 shape: EXISTS as a left_semi join. Orders having at
  // least one returned lineitem; the semi join carries only the probe
  // side through (no row multiplication, no lineitem columns), then a
  // partial-agg count/sum per priority. At scale: both facts shuffle
  // on orderkey once; AQE broadcasts the filtered build side when it
  // fits.
  private def q42(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val ret = li(s, dir).filter(col("l_returnflag") === "R").select(col("l_orderkey"))
    o.join(ret, o("o_orderkey") === ret("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"),
        r2(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")).as("total_price"))
  }

  // q43 — TPC-H Q22 shape: NOT EXISTS as a left_anti join (orders with
  // no returned lineitem). Same physical shape as q42; q42+q43 counts
  // partition the orders table (spec-pinned).
  private def q43(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val ret = li(s, dir).filter(col("l_returnflag") === "R").select(col("l_orderkey"))
    o.join(ret, o("o_orderkey") === ret("l_orderkey"), "left_anti")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"),
        r2(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")).as("total_price"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q42_semi_join" -> q42 _,
    "q43_anti_join" -> q43 _,
    "q44_asof_bucketed" -> q44 _,
    "q49_rollup_sets" -> q49 _,
    "q50_set_ops" -> q50 _,
    "q16_partial_windows" -> q16 _,
    "q17_asof_join" -> q17 _,
    "q18_session_window" -> q18 _,
    "q19_range_join" -> q19 _,
    "q40_tpch_q3" -> q40 _,
    "q41_tpch_q5" -> q41 _,
    "q01_ingest_clean" -> q01 _,
    "q02_filter_project" -> q02 _,
    "q03_derived_arith" -> q03 _,
    "q04_dedup_first" -> q04 _,
    "q05_dedup_keeplast" -> q05 _,
    "q06_ohlcv_daily" -> q06 _,
    "q07_window_15m" -> q07 _,
    "q08_window_1h" -> q08 _,
    "q09_windowed_join" -> q09 _,
    "q10_union_all" -> q10 _,
    "q11_merge_upsert" -> q11 _,
    "q12_topn" -> q12 _,
    "q13_tpch_q1" -> q13 _,
    "q14_join_agg" -> q14 _,
    "q15_lag_change" -> q15 _
  )

  val oracleSql: Map[String, String] = Map(
    "q49_rollup_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  grouping(l_returnflag, l_linestatus)::BIGINT AS gid,
        |  count(*) AS n_rows,
        |  floor(sum(l_extendedprice::DECIMAL(18,2))::DOUBLE*100 + 0.5)/100 AS sum_price,
        |  floor(sum(l_quantity::DECIMAL(18,2))::DOUBLE*100 + 0.5)/100 AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,
    "q50_set_ops" ->
      """SELECT o_custkey, 'urgent_and_big' AS op FROM (
        |  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |  INTERSECT
        |  SELECT o_custkey FROM orders WHERE o_totalprice > 250000.0)
        |UNION ALL
        |SELECT o_custkey, 'urgent_only' AS op FROM (
        |  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |  EXCEPT
        |  SELECT o_custkey FROM orders WHERE o_totalprice > 250000.0)""".stripMargin,
    "q42_semi_join" ->
      """SELECT o_orderpriority, count(*) AS order_count,
        |  floor(sum(o_totalprice::DECIMAL(18,2))::DOUBLE*100 + 0.5)/100 AS total_price
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY 1""".stripMargin,
    "q43_anti_join" ->
      """SELECT o_orderpriority, count(*) AS order_count,
        |  floor(sum(o_totalprice::DECIMAL(18,2))::DOUBLE*100 + 0.5)/100 AS total_price
        |FROM orders
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY 1""".stripMargin,
    "q40_tpch_q3" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_date, o_orderpriority,
        |  floor(sum((l_extendedprice * (1 - l_discount))::DECIMAL(28,4))::DOUBLE*100 + 0.5)/100 AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1996-01-01'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,
    "q41_tpch_q5" ->
      """SELECT n_name,
        |  floor(sum((l_extendedprice * (1 - l_discount))::DECIMAL(28,4))::DOUBLE*100 + 0.5)/100 AS revenue,
        |  count(*) AS n_rows
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1""".stripMargin,
    "q18_session_window" ->
      """WITH e AS (SELECT user_id, ts::TIMESTAMP AS ts, value FROM events),
        |m AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |           OR epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) >= 1800
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM e
        |), s AS (
        |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid FROM m
        |)
        |SELECT user_id,
        |  floor(epoch(min(ts)))::BIGINT AS session_start,
        |  floor(epoch(max(ts)) + 1800)::BIGINT AS session_end,
        |  count(*)::BIGINT AS n_events,
        |  floor(sum(value::DECIMAL(18,2))::DOUBLE*10000 + 0.5)/10000 AS sum_value
        |FROM s GROUP BY user_id, sid""".stripMargin,
    "q19_range_join" ->
      """WITH bands(lo, hi, band) AS (VALUES (0.0, 5.0, 'low'), (5.0, 12.0, 'mid'), (12.0, 1e9, 'high'))
        |SELECT event_type, band, count(*)::BIGINT AS n,
        |  floor(sum(value::DECIMAL(18,2))::DOUBLE*10000 + 0.5)/10000 AS sum_value
        |FROM events LEFT JOIN bands ON value >= lo AND value < hi
        |GROUP BY 1, 2""".stripMargin,
    "q17_asof_join" ->
      """WITH e AS (SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM events),
        |l AS (SELECT user_id, ts, event_id, value FROM e),
        |q0 AS (SELECT user_id, ts AS qts, event_id AS qid, value AS qvalue FROM e WHERE event_id % 10 = 0),
        |q AS (SELECT user_id, qts, qid, qvalue FROM (
        |        SELECT *, row_number() OVER (PARTITION BY user_id, qts ORDER BY qid DESC) AS rn FROM q0)
        |      WHERE rn = 1)
        |SELECT l.user_id, l.event_id, epoch_us(l.ts) AS ts_us, l.value,
        |       q.qid, q.qvalue, epoch_us(q.qts) AS qts_us
        |FROM l ASOF LEFT JOIN q ON l.user_id = q.user_id AND q.qts <= l.ts""".stripMargin,
    // q44 computes the SAME contract through the bucketed skew-safe
    // path, so it shares q17's native-ASOF oracle verbatim
    "q44_asof_bucketed" ->
      """WITH e AS (SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM events),
        |l AS (SELECT user_id, ts, event_id, value FROM e),
        |q0 AS (SELECT user_id, ts AS qts, event_id AS qid, value AS qvalue FROM e WHERE event_id % 10 = 0),
        |q AS (SELECT user_id, qts, qid, qvalue FROM (
        |        SELECT *, row_number() OVER (PARTITION BY user_id, qts ORDER BY qid DESC) AS rn FROM q0)
        |      WHERE rn = 1)
        |SELECT l.user_id, l.event_id, epoch_us(l.ts) AS ts_us, l.value,
        |       q.qid, q.qvalue, epoch_us(q.qts) AS qts_us
        |FROM l ASOF LEFT JOIN q ON l.user_id = q.user_id AND q.qts <= l.ts""".stripMargin,
    "q16_partial_windows" ->
      """WITH e AS (
        |  SELECT event_type AS symbol, ts::TIMESTAMP AS timestamp, value AS price, user_id AS volume FROM events
        |), b AS (
        |  SELECT symbol, (floor(epoch(timestamp)/300)*300)::BIGINT AS bucket_start,
        |    count(*)::BIGINT AS n, sum(price::DECIMAL(18,2)) AS s, sum((price*price)::DECIMAL(28,4)) AS s2, sum(volume)::BIGINT AS vol
        |  FROM e GROUP BY 1, 2
        |), a AS (
        |  SELECT symbol, bucket_start, n, s, s2, vol, '15m' AS grid, 900 AS dur,
        |         bucket_start - (bucket_start % 300) - k.k*300 AS window_start
        |  FROM b, generate_series(0, 2) k(k)
        |  UNION ALL
        |  SELECT symbol, bucket_start, n, s, s2, vol, '1h', 3600,
        |         bucket_start - (bucket_start % 600) - k.k*600
        |  FROM b, generate_series(0, 5) k(k)
        |), m AS (
        |  SELECT symbol, window_start,
        |    sum(CASE WHEN grid='15m' THEN n END)::BIGINT AS n15, sum(CASE WHEN grid='15m' THEN s END) AS s15,
        |    sum(CASE WHEN grid='15m' THEN s2 END) AS s215, sum(CASE WHEN grid='15m' THEN vol END)::BIGINT AS v15,
        |    sum(CASE WHEN grid='1h' THEN n END)::BIGINT AS n1h, sum(CASE WHEN grid='1h' THEN s END) AS s1h,
        |    sum(CASE WHEN grid='1h' THEN s2 END) AS s21h, sum(CASE WHEN grid='1h' THEN vol END)::BIGINT AS v1h
        |  FROM a WHERE bucket_start >= window_start AND bucket_start < window_start + dur
        |  GROUP BY 1, 2
        |)
        |SELECT symbol, window_start,
        |  window_start + 900 AS window_15m_end, window_start + 3600 AS window_1h_end,
        |  floor((s15::DOUBLE/n15)*10000 + 0.5)/10000 AS moving_avg_price_15m,
        |  floor((s1h::DOUBLE/n1h)*10000 + 0.5)/10000 AS moving_avg_price_1h,
        |  CASE WHEN n15 > 1 THEN floor(sqrt(greatest((s215::DOUBLE - s15::DOUBLE*s15::DOUBLE/n15)/(n15-1), 0))*10000 + 0.5)/10000 END AS price_volatility_15m,
        |  CASE WHEN n1h > 1 THEN floor(sqrt(greatest((s21h::DOUBLE - s1h::DOUBLE*s1h::DOUBLE/n1h)/(n1h-1), 0))*10000 + 0.5)/10000 END AS price_volatility_1h,
        |  v15 AS total_volume_15m, v1h AS total_volume_1h
        |FROM m WHERE n15 IS NOT NULL AND n1h IS NOT NULL""".stripMargin,
    "q01_ingest_clean" ->
      """WITH ev AS (SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM events)
        |SELECT event_id,
        |  epoch(strptime(strftime(ts, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S'))::BIGINT AS ts_sec,
        |  regexp_replace(value::VARCHAR || '%', '%', '')::DOUBLE AS price_clean,
        |  (user_id::VARCHAR)::BIGINT AS vol,
        |  json_extract_string(props, '$.k')::BIGINT AS k
        |FROM ev""".stripMargin,
    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        |FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '1996-01-01' AND l_returnflag IS NOT NULL AND l_returnflag <> ''""".stripMargin,
    "q03_derived_arith" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_extendedprice * (1 - l_discount) * (1 + l_tax) AS net_price,
        |  l_discount * 100 AS disc_pct
        |FROM lineitem""".stripMargin,
    "q04_dedup_first" ->
      """SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us, value
        |FROM (SELECT e.*, row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
        |      FROM (SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM events) e)
        |WHERE rn = 1""".stripMargin,
    "q05_dedup_keeplast" ->
      """SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us, value
        |FROM (SELECT e.*, row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM (SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM events) e)
        |WHERE rn = 1""".stripMargin,
    "q06_ohlcv_daily" ->
      """WITH e AS (
        |  SELECT event_type, strftime(ts::TIMESTAMP, '%Y-%m-%d') AS d, value, ts::TIMESTAMP AS ts, event_id FROM events
        |), r AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY event_type, d ORDER BY ts, event_id) AS rn_a,
        |    row_number() OVER (PARTITION BY event_type, d ORDER BY ts DESC, event_id DESC) AS rn_d
        |  FROM e
        |)
        |SELECT event_type, d,
        |  max(CASE WHEN rn_a = 1 THEN value END) AS open,
        |  max(value) AS high,
        |  min(value) AS low,
        |  max(CASE WHEN rn_d = 1 THEN value END) AS close,
        |  floor(sum(value::DECIMAL(18,2))::DOUBLE*10000 + 0.5)/10000 AS volume,
        |  count(*) AS n,
        |  CASE WHEN max(CASE WHEN rn_a = 1 THEN value END) = 0 THEN NULL
        |       ELSE floor((max(CASE WHEN rn_d = 1 THEN value END) - max(CASE WHEN rn_a = 1 THEN value END))
        |            / max(CASE WHEN rn_a = 1 THEN value END) * 100 * 10000 + 0.5)/10000 END AS daily_change
        |FROM r GROUP BY 1, 2""".stripMargin,
    "q07_window_15m" ->
      """WITH w AS (
        |  SELECT e.event_type, e.value,
        |    (floor(epoch(e.ts::TIMESTAMP)/300)*300)::BIGINT - k.k*300 AS window_start
        |  FROM events e, generate_series(0, 2) k(k)
        |)
        |SELECT event_type, window_start, window_start + 900 AS window_end_15m,
        |  floor((sum(value::DECIMAL(18,2))::DOUBLE / count(*))*10000 + 0.5)/10000 AS avg_value_15m,
        |  floor(stddev_samp(value)*10000 + 0.5)/10000 AS volatility_15m,
        |  floor(sum(value::DECIMAL(18,2))::DOUBLE*10000 + 0.5)/10000 AS sum_value_15m,
        |  count(*) AS n_events_15m
        |FROM w GROUP BY 1, 2""".stripMargin,
    "q08_window_1h" ->
      """WITH w AS (
        |  SELECT e.event_type, e.value,
        |    (floor(epoch(e.ts::TIMESTAMP)/600)*600)::BIGINT - k.k*600 AS window_start
        |  FROM events e, generate_series(0, 5) k(k)
        |)
        |SELECT event_type, window_start, window_start + 3600 AS window_end_1h,
        |  floor((sum(value::DECIMAL(18,2))::DOUBLE / count(*))*10000 + 0.5)/10000 AS avg_value_1h,
        |  floor(stddev_samp(value)*10000 + 0.5)/10000 AS volatility_1h,
        |  floor(sum(value::DECIMAL(18,2))::DOUBLE*10000 + 0.5)/10000 AS sum_value_1h,
        |  count(*) AS n_events_1h
        |FROM w GROUP BY 1, 2""".stripMargin,
    "q09_windowed_join" ->
      """WITH w15 AS (
        |  SELECT event_type, window_start,
        |    sum(value::DECIMAL(18,2))::DOUBLE / count(*) AS a, stddev_samp(value) AS s, sum(value::DECIMAL(18,2))::DOUBLE AS v
        |  FROM (SELECT e.event_type, e.value,
        |          (floor(epoch(e.ts::TIMESTAMP)/300)*300)::BIGINT - k.k*300 AS window_start
        |        FROM events e, generate_series(0, 2) k(k))
        |  GROUP BY 1, 2
        |), w1h AS (
        |  SELECT event_type, window_start,
        |    sum(value::DECIMAL(18,2))::DOUBLE / count(*) AS a, stddev_samp(value) AS s, sum(value::DECIMAL(18,2))::DOUBLE AS v
        |  FROM (SELECT e.event_type, e.value,
        |          (floor(epoch(e.ts::TIMESTAMP)/600)*600)::BIGINT - k.k*600 AS window_start
        |        FROM events e, generate_series(0, 5) k(k))
        |  GROUP BY 1, 2
        |)
        |SELECT w15.event_type, w15.window_start,
        |  w15.window_start + 900 AS window_15m_end,
        |  w1h.window_start + 3600 AS window_1h_end,
        |  floor(w15.a*10000 + 0.5)/10000 AS moving_avg_price_15m,
        |  floor(w1h.a*10000 + 0.5)/10000 AS moving_avg_price_1h,
        |  floor(w15.s*10000 + 0.5)/10000 AS price_volatility_15m,
        |  floor(w1h.s*10000 + 0.5)/10000 AS price_volatility_1h,
        |  floor(w15.v*10000 + 0.5)/10000 AS total_volume_15m,
        |  floor(w1h.v*10000 + 0.5)/10000 AS total_volume_1h
        |FROM w15 JOIN w1h ON w15.event_type = w1h.event_type AND w15.window_start = w1h.window_start""".stripMargin,
    "q10_union_all" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice, 'hi' AS bucket FROM lineitem WHERE l_extendedprice > 5000
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, l_extendedprice, 'lo' AS bucket FROM lineitem WHERE l_extendedprice <= 500""".stripMargin,
    "q11_merge_upsert" ->
      """WITH t AS (SELECT event_id, value AS v, 'old' AS src FROM events WHERE event_id % 3 <> 0),
        |s AS (SELECT event_id, value * 2 AS v, 'new' AS src FROM events WHERE event_id % 2 = 0)
        |SELECT coalesce(s.event_id, t.event_id) AS event_id,
        |  CASE WHEN s.event_id IS NOT NULL THEN s.v ELSE t.v END AS v,
        |  CASE WHEN s.event_id IS NOT NULL THEN s.src ELSE t.src END AS src
        |FROM t FULL OUTER JOIN s ON t.event_id = s.event_id""".stripMargin,
    "q12_topn" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q13_tpch_q1" ->
      """SELECT l_returnflag, l_linestatus,
        |  floor(sum(l_quantity::DECIMAL(18,2))::DOUBLE*100 + 0.5)/100 AS sum_qty,
        |  floor(sum(l_extendedprice::DECIMAL(18,2))::DOUBLE*100 + 0.5)/100 AS sum_base_price,
        |  floor(sum((l_extendedprice * (1 - l_discount))::DECIMAL(28,4))::DOUBLE*100 + 0.5)/100 AS sum_disc_price,
        |  floor(sum((l_extendedprice * (1 - l_discount) * (1 + l_tax))::DECIMAL(28,6))::DOUBLE*100 + 0.5)/100 AS sum_charge,
        |  floor((sum(l_quantity::DECIMAL(18,2))::DOUBLE / count(*))*10000 + 0.5)/10000 AS avg_qty,
        |  floor((sum(l_extendedprice::DECIMAL(18,2))::DOUBLE / count(*))*10000 + 0.5)/10000 AS avg_price,
        |  floor((sum(l_discount::DECIMAL(18,2))::DOUBLE / count(*))*10000 + 0.5)/10000 AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q14_join_agg" ->
      """SELECT n_name,
        |  floor(sum((l_extendedprice * (1 - l_discount))::DECIMAL(28,4))::DOUBLE*100 + 0.5)/100 AS revenue,
        |  count(*) AS n_rows
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,
    "q15_lag_change" ->
      """SELECT event_id, user_id,
        |  value - lag(value) OVER (PARTITION BY user_id ORDER BY ts::TIMESTAMP, event_id) AS change
        |FROM events""".stripMargin
  )
}
