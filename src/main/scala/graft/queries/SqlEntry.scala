package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.Tables

/** The SURVEY §3.3(b) entry point: the same queries as the typed
  * Scala API, as `spark.sql()` text over registered temp views — the
  * surface a thriftserver / Spark Connect / notebook user gets when
  * they can't (or won't) link the Scala library. Twenty-two
  * representative shapes are covered — the OHLCV rollup (q06), the
  * sliding-window join (q09), the TPC-H Q1 pricing summary (q13),
  * the window-function battery (q54), the inverted index (q96), the
  * composed daily panel (q172, including the custom json_long_field
  * expression through `spark.sql`), the session summaries (q182),
  * the session lift (q190), the Shapley attribution (q197, the exact
  * 16-coalition game in SQL), the risk-adjusted summary (q199), the
  * RI orphan audit (q216), the PSI drift monitor (q229), the FD
  * discovery (q234), the VaR/CVaR risk pair (q221, the econometrics
  * family's twin), the basket association rules (q246, the
  * decision-analytics twin, pre-pair apriori prune included), the
  * Mann-Whitney U drift test (q250, the rank-statistics family's
  * twin), the Kruskal-Wallis k-sample test (q263, the
  * cross-group family's twin — the shared χ² literal table inlined
  * as VALUES), the two-sample Anderson-Darling drift score
  * (q268, the drift kit's twin), the Benford first-digit audit
  * (q270, the governance/audit family's twin — the 9-row literal
  * expectation inlined as VALUES), the Bartlett variance-
  * homogeneity test (q273, the dispersion twin — quantized
  * cross-group sums + the χ² VALUES join), Mood's median test
  * (q279 — the global-median k×2 table, both relations), and the
  * Brown-Forsythe robust spread test (q280 — per-group running-count
  * medians, exact |dev| power sums, the two-regime floor(x+0.5)
  * decimal quantizer, both relations) — each the
  * EXACT semantics of its
  * typed twin: same op sequence, same decimal detours, same r4/r2
  * rounding, so results match bitwise (SqlEntrySpec pins text ≡
  * typed for every key in [[texts]]).
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
    Tables.orders(spark, dir).createOrReplaceTempView("orders")
    Tables.customer(spark, dir).createOrReplaceTempView("customer")
    Tables.supplier(spark, dir).createOrReplaceTempView("supplier")
    Tables.part(spark, dir).createOrReplaceTempView("part")
    // the panel text exercises graft's json_long_field through SQL —
    // the custom-expression surface is load-bearing here, not just
    // demonstrated (idempotent registration)
    graft.Graft.registerFunctions(spark)
  }

  /** Runs a named query through the SQL-text surface. */
  def sql(spark: SparkSession, name: String): DataFrame = spark.sql(texts(name))

  // r4(x) = floor(x*1e4 + 0.5)/1e4, r2 at 1e2 — the same
  // engine-portable rounding the typed queries use (never round()).

  /** StatTables.Chi2Q95x1e4 as a Spark-SQL VALUES relation — the
    * q263 twin joins the SAME 40-row literal the typed plan
    * broadcasts (L suffixes keep both columns BIGINT). */
  private def chi2Values: String =
    StatTables.Chi2Q95x1e4.zipWithIndex
      .map { case (q, i) => s"(${i + 1}L, ${q}L)" }
      .mkString("VALUES ", ", ", " AS t(df, q95x1e4)")

  /** StatTables.BenfordP1e12 as a Spark-SQL VALUES relation — the
    * q270 twin joins the SAME 9-row literal expectation the typed
    * plan broadcasts (digit INT, p12 BIGINT). */
  private def benfordValues: String =
    StatTables.BenfordP1e12.zipWithIndex
      .map { case (p, i) => s"(${i + 1}, ${p}L)" }
      .mkString("VALUES ", ", ", " AS t(digit, p12)")

  val texts: Map[String, String] = Map(
    // q263 — the cross-group family's text twin: Kruskal-Wallis as a
    // notebook writes it — the q250 midrank construction on the
    // GLOBAL value grid (a plain running-count window — integer
    // arithmetic, value-identical to the typed plan's chunk-banded
    // sum), the deviation-form H with per-group terms quantized to
    // DECIMAL BEFORE the k-row sum, and the chi2(0.95) decision
    // joining the SAME 40-row literal table (StatTables) inlined as
    // VALUES — bitwise ≡ the typed q263 across both relations
    "q263_kruskal_wallis" -> {
      def blk(p: String, obs: String) =
        s"""${p}cells AS (SELECT gk, vc, count(1) AS a FROM ($obs) GROUP BY gk, vc),
           |${p}tv AS (SELECT vc, sum(a) AS t FROM ${p}cells GROUP BY vc),
           |${p}cum AS (
           |  SELECT vc, t,
           |    sum(t) OVER (ORDER BY vc ROWS UNBOUNDED PRECEDING) - t AS prev
           |  FROM ${p}tv
           |),
           |${p}per AS (
           |  SELECT gk, sum(a) AS ng,
           |    sum(CAST(a AS DECIMAL(38,0)) * CAST(prev * 2 + t + 1 AS DECIMAL(38,0))) AS r2
           |  FROM ${p}cells JOIN ${p}cum USING (vc) GROUP BY gk
           |),
           |${p}glob AS (SELECT count(1) AS k, sum(ng) AS nn FROM ${p}per),
           |${p}tq AS (
           |  SELECT sum(CAST(t AS DECIMAL(38,0)) * CAST(t AS DECIMAL(38,0))
           |    * CAST(t AS DECIMAL(38,0)) - CAST(t AS DECIMAL(38,0))) AS ties
           |  FROM ${p}tv
           |),
           |${p}s1 AS (
           |  SELECT max(k) AS k_groups, max(nn) AS n, sum(tfp) AS sfp
           |  FROM (
           |    SELECT k, nn,
           |      cast(floor(
           |        CAST(r2 - CAST(ng AS DECIMAL(38,0)) * CAST(nn + 1 AS DECIMAL(38,0)) AS DOUBLE)
           |        * CAST(r2 - CAST(ng AS DECIMAL(38,0)) * CAST(nn + 1 AS DECIMAL(38,0)) AS DOUBLE)
           |        / CAST(ng AS DOUBLE) * 1e6 + 0.5D) AS DECIMAL(38,0)) AS tfp
           |    FROM ${p}per CROSS JOIN ${p}glob
           |  )
           |),
           |${p}z AS (
           |  SELECT k_groups, n, ties,
           |    3.0D * (CAST(sfp AS DOUBLE) / 1e6)
           |      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0D)) AS h,
           |    1.0D - CAST(ties AS DOUBLE)
           |      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
           |        - CAST(n AS DOUBLE)) AS corr
           |  FROM ${p}s1 CROSS JOIN ${p}tq
           |)""".stripMargin
      def body(p: String, rel: String) =
        s"""SELECT '$rel' AS relation, k_groups, n,
           |  CASE WHEN n > 1 AND corr > 0
           |    THEN cast(cast(floor(h / corr * 1e4 + 0.5D) AS BIGINT) AS DOUBLE) / 1e4 END AS h_r4,
           |  CASE WHEN n > 1 AND corr > 0 AND q95x1e4 IS NOT NULL
           |    THEN cast(floor(h / corr * 1e4 + 0.5D) AS BIGINT) > q95x1e4 END AS reject
           |FROM ${p}z LEFT JOIN chi2 ON chi2.df = ${p}z.k_groups - 1""".stripMargin
      "WITH chi2 AS (SELECT * FROM " + chi2Values + "),\n" +
        blk("e1", "SELECT event_type AS gk, cast(floor(value * 100.0D + 0.5D) AS BIGINT) AS vc " +
          "FROM events WHERE value IS NOT NULL") + ",\n" +
        blk("o1", "SELECT o_orderpriority AS gk, " +
          "cast(floor(o_totalprice * 100.0D + 0.5D) AS BIGINT) AS vc FROM orders") + "\n" +
        body("e1", "events.value~event_type") + "\nUNION ALL\n" +
        body("o1", "orders.totalprice~priority")
    },
    // q216 — the RI orphan audit: the most SQL-notebook-shaped
    // governance query in the battery (each relation is one grouped
    // child scan LEFT JOIN the parent's distinct keys; 0L literals
    // keep the coalesce sums BIGINT like the typed plan's)
    "q216_ri_orphans" -> {
      def one(rel: String, child: String, fk: String, parent: String, pk: String) =
        s"""SELECT '$rel' AS relation,
           |  coalesce(sum(n), 0L) AS n_rows,
           |  coalesce(sum(CASE WHEN k IS NULL THEN n END), 0L) AS n_null,
           |  coalesce(sum(CASE WHEN k IS NOT NULL AND pk_k IS NULL THEN n END), 0L) AS n_orphan_rows,
           |  count(CASE WHEN k IS NOT NULL AND pk_k IS NULL THEN 1 END) AS n_orphan_keys
           |FROM (SELECT $fk AS k, count(1) AS n FROM $child GROUP BY 1) c
           |LEFT JOIN (SELECT DISTINCT $pk AS pk_k FROM $parent) p ON c.k = p.pk_k""".stripMargin
      Seq(
        one("lineitem.l_orderkey->orders.o_orderkey", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        one("lineitem.l_partkey->part.p_partkey", "lineitem", "l_partkey", "part", "p_partkey"),
        one("lineitem.l_suppkey->supplier.s_suppkey", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
        one("orders.o_custkey->customer.c_custkey", "orders", "o_custkey", "customer", "c_custkey")
      ).mkString("\nUNION ALL\n")
    },
    // q234 — FD discovery as notebook SQL: the g3 strength per
    // candidate dependency (counts only — the typed plan's
    // string-cast grouping keys never reach the output, so grouping
    // the raw columns is value-identical)
    "q234_fd_discovery" -> {
      def one(fd: String, table: String, a: String, b: String) =
        s"""SELECT '$fd' AS fd, sum(na) AS n_rows, count(1) AS n_lhs,
           |  sum(np) AS n_pairs,
           |  floor(CAST(sum(mx) AS DOUBLE) / CAST(sum(na) AS DOUBLE) * 1e6 + 0.5D) / 1e6
           |    AS g3_r6
           |FROM (
           |  SELECT a, max(cab) AS mx, sum(cab) AS na, count(1) AS np
           |  FROM (SELECT $a AS a, $b AS b, count(1) AS cab FROM $table GROUP BY 1, 2)
           |  GROUP BY a)""".stripMargin
      Seq(
        one("orders.o_orderkey->o_custkey", "orders", "o_orderkey", "o_custkey"),
        one("orders.o_custkey->o_orderpriority", "orders", "o_custkey", "o_orderpriority"),
        one("orders.o_orderdate->o_orderstatus", "orders", "o_orderdate", "o_orderstatus"),
        one("lineitem.l_partkey->l_suppkey", "lineitem", "l_partkey", "l_suppkey"),
        one("events.user_id->event_type", "events", "user_id", "event_type")
      ).mkString("\nUNION ALL\n")
    },
    // q229 — the PSI drift monitor as notebook SQL: the fixed-point
    // discipline survives the text surface verbatim (per-band terms
    // floor to BIGINT before the sum; D-suffixed constants keep
    // every literal the typed plan's IEEE double)
    "q229_psi_drift" ->
      """WITH e AS (SELECT event_type, to_date(ts) AS day, value FROM events),
        |bd AS (SELECT min(day) AS d0, max(day) AS d1 FROM e),
        |banded AS (
        |  SELECT event_type,
        |    datediff(day, d0) >= (datediff(d1, d0) + 1) DIV 2 AS late,
        |    CASE WHEN value > 0 THEN
        |      CAST(floor(CAST(CAST(floor(log2(value) * 1e6 + 0.5D) AS BIGINT) AS DOUBLE)
        |        / 1000000.0D) AS BIGINT)
        |    ELSE -999L END AS band
        |  FROM e CROSS JOIN bd
        |), cells AS (
        |  SELECT event_type, band,
        |    count(CASE WHEN NOT late THEN 1 END) AS na,
        |    count(CASE WHEN late THEN 1 END) AS nb
        |  FROM banded GROUP BY 1, 2
        |), tot AS (
        |  SELECT event_type, sum(na) AS ta, sum(nb) AS tb, count(1) AS nbands
        |  FROM cells GROUP BY 1
        |), terms AS (
        |  SELECT cells.event_type, ta, tb, nbands,
        |    CAST(floor(((CAST(nb AS DOUBLE) + 0.5D) / (CAST(tb AS DOUBLE) + 0.5D * CAST(nbands AS DOUBLE))
        |         - (CAST(na AS DOUBLE) + 0.5D) / (CAST(ta AS DOUBLE) + 0.5D * CAST(nbands AS DOUBLE)))
        |      * ln(((CAST(nb AS DOUBLE) + 0.5D) / (CAST(tb AS DOUBLE) + 0.5D * CAST(nbands AS DOUBLE)))
        |          / ((CAST(na AS DOUBLE) + 0.5D) / (CAST(ta AS DOUBLE) + 0.5D * CAST(nbands AS DOUBLE))))
        |      * 1e12 + 0.5D) AS BIGINT) AS tfp
        |  FROM cells JOIN tot ON cells.event_type = tot.event_type
        |)
        |SELECT event_type, max(ta) AS n_early, max(tb) AS n_late, max(nbands) AS n_bands,
        |  CAST((sum(tfp) + 500000L) DIV 1000000L AS DOUBLE) / 1e6 AS psi_r6
        |FROM terms GROUP BY event_type""".stripMargin,
    // q172 — the composed daily panel through SQL text, including the
    // graft json_long_field expression (D-suffixed double literals
    // keep every constant the same IEEE double the typed API builds —
    // a bare 0.6931... literal would be DECIMAL and round-trip
    // through decimal arithmetic one ulp differently)
    "q172_daily_panel" ->
      """WITH base AS (
        |  SELECT *, to_date(ts) AS day,
        |    cast(floor(log2(value) * 1e6 + 0.5D) AS bigint) AS lv,
        |    json_long_field(props, 'k') AS k
        |  FROM events WHERE value > 0
        |), win AS (
        |  SELECT *, row_number() OVER w AS rn,
        |    lag(lv) OVER w AS prev_lv,
        |    value - lag(value) OVER w AS chg
        |  FROM base
        |  WINDOW w AS (PARTITION BY event_type, day ORDER BY ts, event_id)
        |), sg AS (
        |  SELECT *, last(CASE WHEN chg > 0 THEN 1 WHEN chg < 0 THEN -1 END, true)
        |    OVER (PARTITION BY event_type, day ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sgn
        |  FROM win
        |), g AS (
        |  SELECT event_type, day, count(1) AS n_ticks,
        |    max(value) AS hi, min(value) AS lo,
        |    min_by(lv, rn) AS open_lv, max_by(lv, rn) AS close_lv,
        |    sum(cast(value AS decimal(18,4)) * k) AS pv,
        |    sum(k) AS volume,
        |    sum(CASE WHEN prev_lv IS NOT NULL THEN (lv - prev_lv) * (lv - prev_lv) END) AS rv_fp,
        |    sum(CASE WHEN sgn = 1 THEN k ELSE 0L END) AS buy_vol,
        |    sum(CASE WHEN sgn = -1 THEN k ELSE 0L END) AS sell_vol
        |  FROM sg GROUP BY event_type, day
        |), f AS (
        |  SELECT *,
        |    cast(cast(floor(log2(hi) * 1e6 + 0.5D) AS bigint)
        |       - cast(floor(log2(lo) * 1e6 + 0.5D) AS bigint) AS double) AS dhl,
        |    cast(close_lv - open_lv AS double) AS dco
        |  FROM g
        |)
        |SELECT event_type, day, n_ticks, hi, lo, volume,
        |  CASE WHEN volume > 0 THEN
        |    floor(cast(pv AS double) / cast(volume AS double) * 10000D + 0.5D)/10000D END AS vwap,
        |  floor(dco / 1e6 * 10000D + 0.5D)/10000D AS ret_cc,
        |  floor(sqrt(cast(coalesce(rv_fp, 0L) AS double)) / 1e6 * 10000D + 0.5D)/10000D AS rv,
        |  floor(dhl / 1e6 * sqrt(0.6931471805599453D) / 2D * 10000D + 0.5D)/10000D AS park_vol,
        |  floor(0.6931471805599453D * 1e-6 * sqrt(greatest(0D,
        |    0.5D * dhl * dhl - (2D * 0.6931471805599453D - 1D) * dco * dco)) * 10000D + 0.5D)/10000D AS gk_vol,
        |  CASE WHEN buy_vol + sell_vol > 0 THEN
        |    floor(cast(buy_vol - sell_vol AS double) / cast(buy_vol + sell_vol AS double) * 10000D + 0.5D)/10000D
        |  END AS ofi
        |FROM f""".stripMargin,
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
    // q182 — per-user session summary as SQL text: the gap flag +
    // running-sum islands, session grouping, and the exact-integer
    // duration sums with one shared r4 division — bitwise equal to
    // the typed (chunked-window) side by the TransitionsChunkedSpec
    // pin, same as q190 below.
    // q197 — the attribution family's text twin: gap sessionization +
    // truncate-at-first-purchase (the q182 window idiom), journey
    // channel sets, then the EXACT 4-channel Shapley game in SQL —
    // the 16 coalition values v(S) pivot into ONE row and the four
    // numerators are integer expressions over it (weights |S|!(3−|S|)!
    // ∈ {6,2,2,6}, ×24 until the two final divisions), so the text
    // reproduces the typed driver enumeration bit for bit. The share
    // denominator uses the efficiency identity Σφ·24 = 24·(v(N)−v(∅))
    // — exact in integers (AttributionSpec pins it on the typed side).
    "q197_shapley_attribution" -> {
      val channels = Seq("click", "error", "signup", "view")
      val subsetRows = (0 until 16).map { m =>
        val mem = channels.zipWithIndex.collect { case (c, i) if (m & (1 << i)) != 0 => c }
        val memLit = if (mem.isEmpty) "cast(array() AS array<string>)"
          else mem.map(c => s"'$c'").mkString("array(", ", ", ")")
        s"($m, $memLit)"
      }.mkString(",\n        |      ")
      val vCols = (0 until 16).map(m => s"max(CASE WHEN si = $m THEN v END) AS v$m")
        .mkString(",\n        |    ")
      val wArr = Array(6, 2, 2, 6)
      def numExpr(ci: Int): String = {
        val others = (0 until 4).filterNot(_ == ci)
        (0 until 8).map { k =>
          val sMask = others.zipWithIndex.collect { case (bit, j) if (k & (1 << j)) != 0 => 1 << bit }.sum
          s"${wArr(Integer.bitCount(sMask))}L * (v${sMask | (1 << ci)} - v$sMask)"
        }.mkString(" + ")
      }
      val stackArgs = channels.zipWithIndex
        .map { case (c, ci) => s"'$c', ${numExpr(ci)}" }
        .mkString(",\n        |    ")
      s"""WITH g AS (
        |  SELECT user_id, event_id, event_type, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR unix_micros(ts) - unix_micros(lag(ts) OVER w) > 1800000000L
        |      THEN 1L ELSE 0L END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), sid AS (
        |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM g
        |), kpt AS (
        |  SELECT *, coalesce(sum(CASE WHEN event_type = 'purchase' THEN 1L ELSE 0L END)
        |    OVER (PARTITION BY user_id, sid ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0L) AS prior_p
        |  FROM sid
        |), j AS (
        |  SELECT user_id, sid,
        |    array_sort(collect_set(CASE WHEN event_type <> 'purchase' THEN event_type END)) AS chset,
        |    max(CASE WHEN event_type = 'purchase' THEN 1L ELSE 0L END) AS conv
        |  FROM kpt WHERE prior_p = 0L GROUP BY user_id, sid
        |), cs AS (
        |  SELECT chset, count(1) AS n FROM j WHERE conv = 1L GROUP BY chset
        |), subsets AS (
        |  SELECT * FROM VALUES
        |      $subsetRows
        |    AS t(si, mem)
        |), vv AS (
        |  SELECT s.si, coalesce(sum(cs.n), 0L) AS v
        |  FROM subsets s LEFT JOIN cs ON forall(cs.chset, c -> array_contains(s.mem, c))
        |  GROUP BY s.si
        |), vrow AS (
        |  SELECT
        |    $vCols
        |  FROM vv
        |), sel AS (
        |  SELECT stack(4,
        |    $stackArgs) AS (state, num),
        |    24L * (v15 - v0) AS total
        |  FROM vrow
        |)
        |SELECT state,
        |  floor(cast(num AS double) / 24.0D * 10000D + 0.5D)/10000D AS shapley,
        |  floor(cast(num AS double) / cast(total AS double) * 10000D + 0.5D)/10000D AS share
        |FROM sel""".stripMargin
    },
    "q182_sessions" ->
      """WITH g AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR unix_micros(ts) - unix_micros(lag(ts) OVER w) > 1800000000L
        |      THEN 1L ELSE 0L END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), sid AS (
        |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM g
        |), sess AS (
        |  SELECT user_id, sid, count(1) AS n_ev,
        |    unix_micros(max(ts)) - unix_micros(min(ts)) AS dur_us
        |  FROM sid GROUP BY user_id, sid
        |)
        |SELECT user_id, count(1) AS n_sessions, sum(n_ev) AS total_events,
        |  max(n_ev) AS max_session_events,
        |  floor(cast(sum(dur_us) AS double) / cast(count(1) AS double) / 1000000D
        |    * 10000D + 0.5D) / 10000D AS avg_session_secs
        |FROM sess GROUP BY user_id""".stripMargin,
    // q190 — the events-analytics family's text twin: gap
    // sessionization (flag + running sum over a named window) feeding
    // a session-grain self-join — exactly the shape a notebook user
    // writes in SQL. The typed side evaluates the session window
    // through the CHUNKED two-level plan; this direct-window text is
    // bitwise equal by the TransitionsChunkedSpec pin, so the
    // SqlEntrySpec exceptAll comparison doubles as a second
    // chunked ≡ direct witness.
    "q190_session_lift" ->
      """WITH g AS (
        |  SELECT user_id, event_id, event_type, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR unix_micros(ts) - unix_micros(lag(ts) OVER w) > 1800000000L
        |      THEN 1L ELSE 0L END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), sid AS (
        |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM g
        |), st AS (
        |  SELECT DISTINCT user_id, sid, event_type FROM sid
        |), ns AS (
        |  SELECT count(1) AS n_sessions FROM (SELECT DISTINCT user_id, sid FROM st)
        |), singles AS (
        |  SELECT event_type, count(1) AS n_single FROM st GROUP BY event_type
        |), pairs AS (
        |  SELECT a.event_type AS type_a, b.event_type AS type_b, count(1) AS n_both
        |  FROM st a JOIN st b ON a.user_id = b.user_id AND a.sid = b.sid
        |    AND a.event_type < b.event_type
        |  GROUP BY 1, 2
        |)
        |SELECT p.type_a, p.type_b, p.n_both, sa.n_single AS n_a, sb.n_single AS n_b,
        |  floor(cast(p.n_both AS double) / cast((SELECT n_sessions FROM ns) AS double)
        |    * 10000D + 0.5D) / 10000D AS support,
        |  floor(cast(p.n_both AS double) * cast((SELECT n_sessions FROM ns) AS double)
        |    / (cast(sa.n_single AS double) * cast(sb.n_single AS double))
        |    * 10000D + 0.5D) / 10000D AS lift
        |FROM pairs p
        |JOIN singles sa ON p.type_a = sa.event_type
        |JOIN singles sb ON p.type_b = sb.event_type""".stripMargin,
    // q199 — the risk-adjusted performance summary through SQL text:
    // the exact typed construction (micro-log2 closes, one day-grid
    // window pass with lag + running peak, exact integer sums, the
    // shared IEEE closing with D-suffixed literals) so the notebook
    // user's Sharpe agrees with the library's bitwise
    "q199_risk_adjusted" ->
      """WITH base AS (
        |  SELECT event_type, to_date(ts) AS day,
        |    cast(floor(log2(value) * 1e6 + 0.5D) AS bigint) AS lv,
        |    ts, event_id
        |  FROM events WHERE value > 0
        |), rn AS (
        |  SELECT event_type, day, lv,
        |    row_number() OVER (PARTITION BY event_type, day ORDER BY ts, event_id) AS rn
        |  FROM base
        |), c AS (
        |  SELECT event_type, day, max_by(lv, rn) AS close_lv
        |  FROM rn GROUP BY event_type, day
        |), w AS (
        |  SELECT event_type, day, close_lv,
        |    lag(close_lv) OVER (PARTITION BY event_type ORDER BY day) AS prev,
        |    max(close_lv) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
        |  FROM c
        |), g AS (
        |  SELECT event_type,
        |    count(close_lv - prev) AS n_days,
        |    sum(close_lv - prev) AS s1,
        |    sum((close_lv - prev) * (close_lv - prev)) AS s2,
        |    sum(CASE WHEN close_lv - prev < 0
        |      THEN (close_lv - prev) * (close_lv - prev) ELSE 0L END) AS sn2,
        |    max(peak - close_lv) AS mdd_fp
        |  FROM w GROUP BY event_type
        |), f AS (
        |  SELECT event_type, n_days, mdd_fp,
        |    cast(s1 AS double) / cast(n_days AS double) AS mean_d,
        |    sqrt(greatest(0D, cast(s2 AS double) / cast(n_days AS double)
        |      - (cast(s1 AS double) / cast(n_days AS double))
        |        * (cast(s1 AS double) / cast(n_days AS double)))) AS sd_d,
        |    sqrt(cast(sn2 AS double) / cast(n_days AS double)) AS ddv_d
        |  FROM g
        |)
        |SELECT event_type, n_days,
        |  floor(mean_d * 252.0D / 1e6 * 10000.0D + 0.5D) / 10000.0D AS ann_ret_log2,
        |  floor(sd_d * sqrt(252.0D) / 1e6 * 10000.0D + 0.5D) / 10000.0D AS ann_vol_log2,
        |  CASE WHEN sd_d > 0 THEN
        |    floor(mean_d / sd_d * sqrt(252.0D) * 10000.0D + 0.5D) / 10000.0D END AS sharpe,
        |  CASE WHEN ddv_d > 0 THEN
        |    floor(mean_d / ddv_d * sqrt(252.0D) * 10000.0D + 0.5D) / 10000.0D END AS sortino,
        |  floor(cast(mdd_fp AS double) / 1e6 * 10000.0D + 0.5D) / 10000.0D AS max_dd_log2,
        |  CASE WHEN mdd_fp > 0 THEN
        |    floor(mean_d * 252.0D / cast(mdd_fp AS double) * 10000.0D + 0.5D) / 10000.0D
        |  END AS calmar
        |FROM f""".stripMargin,
    // q221 — the econometrics family's text twin: historical VaR /
    // CVaR as a notebook would write it — the same micro-log2 daily
    // closes (the q199 CTE), exact integer return grid, sorted-array
    // order statistics, and an exact integer tail fold; the only IEEE
    // ops (k = ceil(n·0.05) and the two closing divisions) are the
    // typed plan's, D-suffixed, in the same order, so rows match
    // bitwise
    "q221_var_cvar" ->
      """WITH base AS (
        |  SELECT event_type, to_date(ts) AS day,
        |    cast(floor(log2(value) * 1e6 + 0.5D) AS bigint) AS lv,
        |    ts, event_id
        |  FROM events WHERE value > 0
        |), rn AS (
        |  SELECT event_type, day, lv,
        |    row_number() OVER (PARTITION BY event_type, day ORDER BY ts, event_id) AS rn
        |  FROM base
        |), c AS (
        |  SELECT event_type, day, max_by(lv, rn) AS close_lv
        |  FROM rn GROUP BY event_type, day
        |), r AS (
        |  SELECT event_type,
        |    close_lv - lag(close_lv) OVER (PARTITION BY event_type ORDER BY day) AS r_fp
        |  FROM c
        |), s AS (
        |  SELECT event_type, sort_array(collect_list(r_fp)) AS xs
        |  FROM r WHERE r_fp IS NOT NULL GROUP BY event_type
        |), f AS (
        |  SELECT event_type, cast(size(xs) AS bigint) AS n_days,
        |    greatest(1L, ceil(cast(size(xs) AS double) * 0.05D)) AS k_tail, xs
        |  FROM s
        |)
        |SELECT event_type, n_days, k_tail,
        |  floor((-cast(element_at(xs, cast(k_tail AS int)) AS double)) / 1e6
        |    * 10000.0D + 0.5D) / 10000.0D AS var95_r4,
        |  floor((-(cast(aggregate(slice(xs, 1, cast(k_tail AS int)), 0L, (a, e) -> a + e)
        |      AS double) / cast(k_tail AS double))) / 1e6
        |    * 10000.0D + 0.5D) / 10000.0D AS cvar95_r4
        |FROM f""".stripMargin,
    // q246 — the basket-rules text twin: the decision-analytics
    // family's most notebook-shaped query (distinct baskets, apriori
    // HAVING cuts, one lift expression with per-factor double
    // widening, a total-order top-100)
    "q246_basket_rules" ->
      """WITH sp AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |nn AS (SELECT count(1) AS n FROM (SELECT DISTINCT o FROM sp)),
        |it AS (SELECT p, count(1) AS c FROM sp GROUP BY p HAVING count(1) >= 5),
        |spf AS (SELECT o, p FROM sp WHERE p IN (SELECT p FROM it)),
        |pr AS (
        |  SELECT a.p AS pa, b.p AS pb, count(1) AS cab
        |  FROM spf a JOIN spf b ON a.o = b.o AND a.p < b.p
        |  GROUP BY a.p, b.p HAVING count(1) >= 2
        |)
        |SELECT pa AS part_a, pb AS part_b, ia.c AS c_a, ib.c AS c_b, cab AS c_ab,
        |  floor(CAST(cab AS DOUBLE) / CAST(n AS DOUBLE) * 1e6 + 0.5D) / 1e6 AS support_r6,
        |  floor(CAST(cab AS DOUBLE) / CAST(ia.c AS DOUBLE) * 1e6 + 0.5D) / 1e6 AS conf_a_to_b_r6,
        |  floor(CAST(cab AS DOUBLE) / CAST(ib.c AS DOUBLE) * 1e6 + 0.5D) / 1e6 AS conf_b_to_a_r6,
        |  floor((CAST(n AS DOUBLE) * CAST(cab AS DOUBLE))
        |    / (CAST(ia.c AS DOUBLE) * CAST(ib.c AS DOUBLE)) * 1e6 + 0.5D) / 1e6 AS lift_r6
        |FROM pr JOIN it ia ON ia.p = pr.pa JOIN it ib ON ib.p = pr.pb CROSS JOIN nn
        |ORDER BY lift_r6 DESC, part_a, part_b LIMIT 100""".stripMargin,
    // q250 — the rank-statistics family's text twin: Mann-Whitney U
    // as a notebook writes it — the exact-integer midrank construction
    // (2·midrank = 2·prev + t + 1 on the (type, cent) grid, one
    // running-count window), every product widened to DECIMAL(38,0)
    // BEFORE multiplying like the typed plan, and the tie-corrected z
    // closing in the SAME D-suffixed IEEE sequence, so rows match
    // bitwise (the plain window running sum is integer arithmetic —
    // value-identical to the typed plan's chunk-banded one)
    "q250_mann_whitney" ->
      """WITH e AS (
        |  SELECT event_type, to_date(ts) AS day, value FROM events
        |), bounds AS (
        |  SELECT min(day) AS d0, max(day) AS d1 FROM e
        |), v AS (
        |  SELECT event_type,
        |    datediff(day, d0) >= (datediff(d1, d0) + 1) DIV 2 AS late,
        |    cast(floor(value * 100.0D + 0.5D) AS bigint) AS vc
        |  FROM e CROSS JOIN bounds WHERE value IS NOT NULL
        |), g AS (
        |  SELECT event_type, vc,
        |    count(CASE WHEN NOT late THEN 1 END) AS a,
        |    count(CASE WHEN late THEN 1 END) AS b
        |  FROM v GROUP BY event_type, vc
        |), cum AS (
        |  SELECT event_type, vc, a, b, a + b AS t,
        |    sum(a + b) OVER (PARTITION BY event_type ORDER BY vc
        |      ROWS UNBOUNDED PRECEDING) AS ct
        |  FROM g
        |), per AS (
        |  SELECT event_type, sum(a) AS n1, sum(b) AS n2,
        |    sum(CAST(a AS DECIMAL(38,0))
        |      * CAST((ct - t) * 2 + t + 1 AS DECIMAL(38,0))) AS r1x2,
        |    sum(CAST(t AS DECIMAL(38,0)) * CAST(t AS DECIMAL(38,0))
        |      * CAST(t AS DECIMAL(38,0)) - CAST(t AS DECIMAL(38,0))) AS ties
        |  FROM cum GROUP BY event_type
        |), f AS (
        |  SELECT event_type, n1, n2,
        |    r1x2 - CAST(n1 AS DECIMAL(38,0)) * CAST(n1 + 1 AS DECIMAL(38,0)) AS u1x2,
        |    CAST(r1x2 - CAST(n1 AS DECIMAL(38,0)) * CAST(n1 + 1 AS DECIMAL(38,0))
        |      - CAST(n1 AS DECIMAL(38,0)) * CAST(n2 AS DECIMAL(38,0)) AS DOUBLE) AS num,
        |    CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
        |      * ((CAST(n1 + n2 AS DOUBLE) + 1.0D)
        |        - CAST(ties AS DOUBLE)
        |          / (CAST(n1 + n2 AS DOUBLE) * (CAST(n1 + n2 AS DOUBLE) - 1.0D)))
        |      / 12.0D AS var_core
        |  FROM per
        |), zq AS (
        |  SELECT event_type, n1, n2, u1x2, var_core,
        |    cast(floor(num / (2.0D * sqrt(var_core)) * 1e4 + 0.5D) AS bigint) AS z4
        |  FROM f
        |)
        |SELECT event_type, n1 AS n_early, n2 AS n_late,
        |  CAST(u1x2 AS DOUBLE) / 2.0D AS u1,
        |  CASE WHEN var_core > 0 THEN cast(z4 AS double) / 1e4 END AS z_r4,
        |  CASE WHEN var_core > 0 THEN abs(z4) > 19600L END AS reject
        |FROM zq""".stripMargin,
    // q268 — the drift kit's text twin: two-sample Anderson-Darling
    // (Scholz & Stephens 1987 A²akN, ties via the midrank form) as a
    // notebook writes it — the SAME (type, cent) grid as q250, BOTH
    // cumulatives (pooled ct and early ca) from plain running-sum
    // windows (integer arithmetic — value-identical to the typed
    // plan's one fused ChunkedFrame.withRunningSums pass), every
    // product DECIMAL(38,0)-widened per factor BEFORE multiplying,
    // each cell's term ONE D-suffixed IEEE expression quantized to
    // 1e13 fixed point BEFORE the grid sum, and the (nn−1)/nn closing
    // in the same IEEE order — bitwise ≡ the typed q268
    "q268_anderson_darling" ->
      """WITH e AS (
        |  SELECT event_type, to_date(ts) AS day, value FROM events
        |), bounds AS (
        |  SELECT min(day) AS d0, max(day) AS d1 FROM e
        |), v AS (
        |  SELECT event_type,
        |    datediff(day, d0) >= (datediff(d1, d0) + 1) DIV 2 AS late,
        |    cast(floor(value * 100.0D + 0.5D) AS bigint) AS vc
        |  FROM e CROSS JOIN bounds WHERE value IS NOT NULL
        |), g AS (
        |  SELECT event_type, vc,
        |    count(CASE WHEN NOT late THEN 1 END) AS a,
        |    count(CASE WHEN late THEN 1 END) AS b
        |  FROM v GROUP BY event_type, vc
        |), cum AS (
        |  SELECT event_type, vc, a, b, a + b AS l,
        |    sum(a + b) OVER (PARTITION BY event_type ORDER BY vc
        |      ROWS UNBOUNDED PRECEDING) AS ct,
        |    sum(a) OVER (PARTITION BY event_type ORDER BY vc
        |      ROWS UNBOUNDED PRECEDING) AS ca
        |  FROM g
        |), tot AS (
        |  SELECT event_type, sum(a) AS n1, sum(b) AS n2 FROM g GROUP BY event_type
        |), cell AS (
        |  SELECT event_type, l, a, b, ct, ca, n1, n2, n1 + n2 AS nn,
        |    2 * ct - l AS b2,
        |    2 * ca - a AS m2a,
        |    2 * (ct - ca) - b AS m2b
        |  FROM cum JOIN tot USING (event_type)
        |), wide AS (
        |  SELECT event_type, l, n1, n2, nn,
        |    CAST(b2 AS DECIMAL(38,0)) * CAST(2 * nn - b2 AS DECIMAL(38,0))
        |      - CAST(nn AS DECIMAL(38,0)) * CAST(l AS DECIMAL(38,0)) AS den4,
        |    CAST(nn AS DECIMAL(38,0)) * CAST(m2a AS DECIMAL(38,0))
        |      - CAST(n1 AS DECIMAL(38,0)) * CAST(b2 AS DECIMAL(38,0)) AS e1a,
        |    CAST(nn AS DECIMAL(38,0)) * CAST(m2b AS DECIMAL(38,0))
        |      - CAST(n2 AS DECIMAL(38,0)) * CAST(b2 AS DECIMAL(38,0)) AS e1b
        |  FROM cell
        |), term AS (
        |  SELECT event_type, n1, n2, nn,
        |    CASE WHEN CAST(den4 AS DOUBLE) > 0 AND n1 > 0 AND n2 > 0 THEN
        |      cast(floor((
        |        CAST(l AS DOUBLE) * CAST(e1a AS DOUBLE) * CAST(e1a AS DOUBLE)
        |          / (CAST(den4 AS DOUBLE) * CAST(n1 AS DOUBLE) * CAST(nn AS DOUBLE))
        |        + CAST(l AS DOUBLE) * CAST(e1b AS DOUBLE) * CAST(e1b AS DOUBLE)
        |          / (CAST(den4 AS DOUBLE) * CAST(n2 AS DOUBLE) * CAST(nn AS DOUBLE))
        |      ) * 1e13 + 0.5D) AS DECIMAL(38,0))
        |    ELSE CAST(0 AS DECIMAL(38,0)) END AS tfp
        |  FROM wide
        |), per AS (
        |  SELECT event_type, max(n1) AS n1, max(n2) AS n2, max(nn) AS nn,
        |    sum(tfp) AS sfp
        |  FROM term GROUP BY event_type
        |)
        |SELECT event_type, n1 AS n_early, n2 AS n_late,
        |  CASE WHEN n1 > 0 AND n2 > 0 THEN
        |    floor(CAST(nn - 1 AS DOUBLE) / CAST(nn AS DOUBLE)
        |      * (CAST(sfp AS DOUBLE) / 1e13) * 1e6 + 0.5D) / 1e6 END AS ad_r6
        |FROM per""".stripMargin,
    // q270 — the governance/audit family's text twin: the Benford
    // first-digit screen as a notebook writes it — digit from the
    // STRING head of the exact cent amount, the 9-row literal
    // expectation inlined as VALUES (the SAME StatTables.BenfordP1e12
    // the typed plan broadcasts), per-digit χ² terms quantized to
    // DECIMAL before the window sum, decision at the fixed df-8
    // boundary 155073 — bitwise ≡ the typed q270 across both relations
    "q270_benford" -> {
      def one(rel: String, src: String) =
        s"""SELECT '$rel' AS relation, digit, o AS n_d,
           |  CASE WHEN n > 0 THEN
           |    floor(CAST(o AS DOUBLE) / CAST(n AS DOUBLE) * 1e6 + 0.5D) / 1e6
           |  END AS share_r6,
           |  CAST((p12 + 500000) DIV 1000000 AS DOUBLE) / 1e6 AS benford_r6,
           |  CAST(chi24 AS DOUBLE) / 1e4 AS chi2_r4,
           |  chi24 > 155073L AS reject
           |FROM (
           |  SELECT digit, p12, o, n,
           |    cast(floor(CAST(sum(tfp) OVER () AS DOUBLE) / 1e6 * 1e4 + 0.5D)
           |      AS BIGINT) AS chi24
           |  FROM (
           |    SELECT digit, p12, o, n,
           |      CASE WHEN n > 0 THEN cast(floor(
           |        (CAST(o AS DOUBLE) - CAST(n AS DOUBLE) * (CAST(p12 AS DOUBLE) / 1e12))
           |        * (CAST(o AS DOUBLE) - CAST(n AS DOUBLE) * (CAST(p12 AS DOUBLE) / 1e12))
           |        / (CAST(n AS DOUBLE) * (CAST(p12 AS DOUBLE) / 1e12))
           |        * 1e6 + 0.5D) AS DECIMAL(38,0)) END AS tfp
           |    FROM (
           |      SELECT digit, p12, o, sum(o) OVER () AS n
           |      FROM (
           |        SELECT b.digit, b.p12, coalesce(c.o0, CAST(0 AS BIGINT)) AS o
           |        FROM ($benfordValues) b
           |        LEFT JOIN (
           |          SELECT CAST(substring(CAST(vc AS STRING), 1, 1) AS INT) AS digit,
           |            count(1) AS o0
           |          FROM ($src) WHERE vc > 0 GROUP BY 1
           |        ) c ON b.digit = c.digit
           |      )
           |    )
           |  )
           |)""".stripMargin
      one("orders.totalprice",
        "SELECT cast(floor(o_totalprice * 100.0D + 0.5D) AS bigint) AS vc " +
          "FROM orders WHERE o_totalprice IS NOT NULL") +
        "\nUNION ALL\n" +
        one("events.value",
          "SELECT cast(floor(value * 100.0D + 0.5D) AS bigint) AS vc " +
            "FROM events WHERE value IS NOT NULL")
    },
    // q273 — the Bartlett variance-homogeneity test as a notebook
    // writes it (SQL twin #20): per-group exact decimal variance
    // numerators, the three cross-group sums quantized BEFORE summing
    // (wq to integer cents², ln terms to 1e-6, reciprocals to 1e-12 —
    // no float ever sums across groups), ONE closing IEEE sequence,
    // and the α = 0.05 decision joining the SAME 40-row χ² literal
    // table the typed plan broadcasts — bitwise ≡ the typed q273.
    "q273_bartlett" ->
      ("""WITH chi2 AS (SELECT * FROM """ + chi2Values + """),
        |obs AS (
        |  SELECT event_type AS gk,
        |    cast(floor(value * 100.0D + 0.5D) AS BIGINT) AS vc
        |  FROM events WHERE value IS NOT NULL
        |), per AS (
        |  SELECT gk, count(1) AS ni,
        |    sum(CAST(vc AS DECIMAL(38,0))) AS s1,
        |    sum(CAST(vc AS DECIMAL(38,0)) * CAST(vc AS DECIMAL(38,0))) AS s2
        |  FROM obs GROUP BY gk HAVING count(1) >= 2
        |), g AS (
        |  SELECT ni, CAST(ni AS DECIMAL(38,0)) * s2 - s1 * s1 AS num FROM per
        |), g2 AS (
        |  -- wq: the two-regime floor(x+0.5) quantizer on a decimal
        |  -- carrier (InsightQueries.floorHalf38) — below 2^52 the
        |  -- IEEE add+floor on a long carrier, above it the double is
        |  -- integral and the decimal cast of x+0.5 is exact
        |  SELECT ni,
        |    CASE WHEN CAST(num AS DOUBLE) / CAST(ni AS DOUBLE)
        |        < 4503599627370496.0D
        |      THEN CAST(floor(CAST(num AS DOUBLE) / CAST(ni AS DOUBLE) + 0.5D)
        |        AS DECIMAL(38,0))
        |      ELSE CAST(CAST(num AS DOUBLE) / CAST(ni AS DOUBLE) + 0.5D
        |        AS DECIMAL(38,0)) END AS wq,
        |    CASE WHEN CAST(num AS DOUBLE)
        |        / (CAST(ni AS DOUBLE) * (CAST(ni AS DOUBLE) - 1.0D)) > 0.0D THEN
        |      CAST(floor((CAST(ni AS DOUBLE) - 1.0D)
        |        * ln(CAST(num AS DOUBLE)
        |          / (CAST(ni AS DOUBLE) * (CAST(ni AS DOUBLE) - 1.0D)))
        |        * 1e6 + 0.5D) AS DECIMAL(38,0)) END AS lt,
        |    cast(floor(1e12 / (CAST(ni AS DOUBLE) - 1.0D) + 0.5D) AS BIGINT) AS iv
        |  FROM g
        |), agg AS (
        |  SELECT 'events.value~event_type' AS relation,
        |    count(1) AS k_groups, sum(ni) AS n, sum(wq) AS sw,
        |    sum(lt) AS slt, count(lt) AS nlt, sum(iv) AS siv
        |  FROM g2 GROUP BY 1
        |), z AS (
        |  SELECT relation, k_groups, n, nlt, sw, k_groups - 1 AS df,
        |    cast(floor(
        |      (CAST(n - k_groups AS DOUBLE)
        |          * ln(CAST(sw AS DOUBLE) / CAST(n - k_groups AS DOUBLE))
        |        - CAST(slt AS DOUBLE) / 1e6)
        |      / (1.0D + (CAST(siv AS DOUBLE) / 1e12
        |          - 1.0D / CAST(n - k_groups AS DOUBLE))
        |        / (3.0D * (CAST(k_groups AS DOUBLE) - 1.0D)))
        |      * 1e4 + 0.5D) AS BIGINT) AS b4
        |  FROM agg
        |)
        |SELECT relation, k_groups, n,
        |  CASE WHEN k_groups >= 2 AND nlt = k_groups AND CAST(sw AS DOUBLE) > 0.0D
        |    THEN CAST(b4 AS DOUBLE) / 1e4 END AS b_r4,
        |  CASE WHEN k_groups >= 2 AND nlt = k_groups AND CAST(sw AS DOUBLE) > 0.0D
        |      AND q95x1e4 IS NOT NULL THEN b4 > q95x1e4 END AS reject
        |FROM z LEFT JOIN chi2 ON chi2.df = z.df""").stripMargin,
    // q279 — Mood's median test as a notebook writes it (SQL twin
    // #21): global lower median via a running-count window, the k×2
    // table off the cell grid, per-group (D/N)²/E terms quantized
    // to 1e-6 before the k-row sum, integer (s6+50) DIV 100 closing,
    // χ² VALUES join — bitwise ≡ the typed q279 on both relations.
    "q279_mood_median" -> {
      def blk(p: String, rel: String, obs: String) =
        s"""${p}cells AS (SELECT gk, vc, count(1) AS a FROM ($obs) GROUP BY gk, vc),
           |${p}tv AS (SELECT vc, sum(a) AS t FROM ${p}cells GROUP BY vc),
           |${p}tot AS (SELECT sum(t) AS nn FROM ${p}tv),
           |${p}med AS (
           |  SELECT min(vc) AS med FROM (
           |    SELECT vc, sum(t) OVER (ORDER BY vc ROWS UNBOUNDED PRECEDING) AS ct
           |    FROM ${p}tv) c CROSS JOIN ${p}tot WHERE ct >= (nn + 1) DIV 2),
           |${p}per AS (
           |  SELECT gk, sum(a) AS ni,
           |    sum(CASE WHEN vc > med THEN a ELSE 0L END) AS ai
           |  FROM ${p}cells CROSS JOIN ${p}med GROUP BY gk),
           |${p}gl AS (
           |  SELECT count(1) AS k_groups, sum(ni) AS n, sum(ai) AS c1 FROM ${p}per),
           |${p}terms AS (
           |  SELECT k_groups, n, c1,
           |    CASE WHEN c1 > 0 AND (n - c1) > 0 THEN
           |      CAST(floor(((CAST(da AS DOUBLE) / CAST(n AS DOUBLE))
           |          * (CAST(da AS DOUBLE) / CAST(n AS DOUBLE))
           |          / (CAST(ni AS DOUBLE) * CAST(c1 AS DOUBLE) / CAST(n AS DOUBLE))
           |        + (CAST(db AS DOUBLE) / CAST(n AS DOUBLE))
           |          * (CAST(db AS DOUBLE) / CAST(n AS DOUBLE))
           |          / (CAST(ni AS DOUBLE) * CAST(n - c1 AS DOUBLE) / CAST(n AS DOUBLE)))
           |        * 1e6 + 0.5D) AS DECIMAL(38,0))
           |    END AS t6
           |  FROM (
           |    SELECT ni, ai, k_groups, n, c1,
           |      CAST(ai AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0))
           |        - CAST(ni AS DECIMAL(38,0)) * CAST(c1 AS DECIMAL(38,0)) AS da,
           |      CAST(ni - ai AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0))
           |        - CAST(ni AS DECIMAL(38,0)) * CAST(n - c1 AS DECIMAL(38,0)) AS db
           |    FROM ${p}per CROSS JOIN ${p}gl) j),
           |${p}agg AS (
           |  SELECT '$rel' AS relation, max(k_groups) AS k_groups,
           |    max(n) AS n, max(c1) AS n_above,
           |    sum(t6) AS s6, count(t6) AS nt
           |  FROM ${p}terms GROUP BY 1)""".stripMargin
      def body(p: String) =
        s"""SELECT relation, k_groups, n, n_above,
           |  CASE WHEN k_groups >= 2 AND nt = k_groups THEN
           |    CAST((s6 + 50) DIV 100 AS DOUBLE) / 1e4 END AS chi2_r4,
           |  CASE WHEN k_groups >= 2 AND nt = k_groups AND q95x1e4 IS NOT NULL THEN
           |    (s6 + 50) DIV 100 > q95x1e4 END AS reject
           |FROM ${p}agg LEFT JOIN chi2 ON chi2.df = ${p}agg.k_groups - 1"""
          .stripMargin
      "WITH chi2 AS (SELECT * FROM " + chi2Values + "),\n" +
        blk("e3", "events.value~event_type",
          "SELECT event_type AS gk, cast(floor(value * 100.0D + 0.5D) AS BIGINT) AS vc " +
            "FROM events WHERE value IS NOT NULL") + ",\n" +
        blk("o3", "orders.totalprice~priority",
          "SELECT o_orderpriority AS gk, " +
            "cast(floor(o_totalprice * 100.0D + 0.5D) AS BIGINT) AS vc FROM orders") + "\n" +
        body("e3") + "\nUNION ALL\n" + body("o3")
    },
    // q280 — Brown-Forsythe robust spread test as a notebook writes
    // it (SQL twin #22): per-group lower medians off running-count
    // windows (the typed plan's chunk-banded running counts are
    // integer-exact, so the window twin is bitwise), exact |dev|
    // power sums on the cell grid, between/within terms through the
    // SAME two-regime floor(x+0.5)-on-decimal quantizer as the typed
    // floorHalf38, (k−1)·W vs the χ² VALUES table — bitwise ≡ the
    // typed q280 on both relations.
    "q280_brown_forsythe" -> {
      def blk(p: String, rel: String, obs: String) =
        s"""${p}cells AS (SELECT gk, vc, count(1) AS a FROM ($obs) GROUP BY gk, vc),
           |${p}cum AS (
           |  SELECT gk, vc, a, sum(a) OVER (PARTITION BY gk ORDER BY vc
           |    ROWS UNBOUNDED PRECEDING) AS ct
           |  FROM ${p}cells),
           |${p}np AS (SELECT gk, sum(a) AS ng FROM ${p}cells GROUP BY gk),
           |${p}med AS (
           |  SELECT gk, min(vc) AS med FROM ${p}cum JOIN ${p}np USING (gk)
           |  WHERE ct >= (ng + 1) DIV 2 GROUP BY gk),
           |${p}per AS (
           |  SELECT gk, sum(a) AS ni,
           |    sum(CAST(a AS DECIMAL(38,0)) * CAST(z AS DECIMAL(38,0))) AS s1,
           |    sum(CAST(a AS DECIMAL(38,0)) * CAST(z AS DECIMAL(38,0))
           |      * CAST(z AS DECIMAL(38,0))) AS q1
           |  FROM (SELECT gk, a, abs(vc - med) AS z
           |        FROM ${p}cells JOIN ${p}med USING (gk)) zc
           |  GROUP BY gk),
           |${p}gl AS (
           |  SELECT count(1) AS k_groups, sum(ni) AS n, sum(s1) AS s FROM ${p}per),
           |${p}terms AS (
           |  SELECT k_groups, n,
           |    CASE WHEN bx < 4503599627370496.0D
           |      THEN CAST(floor(bx + 0.5D) AS DECIMAL(38,0))
           |      ELSE CAST(bx + 0.5D AS DECIMAL(38,0)) END AS bt6,
           |    CASE WHEN wx < 4503599627370496.0D
           |      THEN CAST(floor(wx + 0.5D) AS DECIMAL(38,0))
           |      ELSE CAST(wx + 0.5D AS DECIMAL(38,0)) END AS wt6
           |  FROM (
           |    SELECT k_groups, n,
           |      CAST(dg AS DOUBLE) / CAST(n AS DOUBLE)
           |        * (CAST(dg AS DOUBLE) / CAST(n AS DOUBLE))
           |        / CAST(ni AS DOUBLE) * 1e6 AS bx,
           |      CAST(CAST(ni AS DECIMAL(38,0)) * q1 - s1 * s1 AS DOUBLE)
           |        / CAST(ni AS DOUBLE) * 1e6 AS wx
           |    FROM (
           |      SELECT ni, s1, q1, k_groups, n,
           |        CAST(n AS DECIMAL(38,0)) * s1
           |          - CAST(ni AS DECIMAL(38,0)) * s AS dg
           |      FROM ${p}per CROSS JOIN ${p}gl) j) t),
           |${p}agg AS (
           |  SELECT '$rel' AS relation, max(k_groups) AS k_groups,
           |    max(n) AS n, sum(bt6) AS b6, sum(wt6) AS w6
           |  FROM ${p}terms GROUP BY 1)""".stripMargin
      def body(p: String) =
        s"""SELECT relation, k_groups, n,
           |  CASE WHEN k_groups >= 2 AND CAST(w6 AS DOUBLE) > 0.0D
           |      AND n > k_groups THEN
           |    floor((CAST(n AS DOUBLE) - CAST(k_groups AS DOUBLE))
           |        / (CAST(k_groups AS DOUBLE) - 1.0D)
           |      * (CAST(b6 AS DOUBLE) / CAST(w6 AS DOUBLE))
           |      * 10000.0D + 0.5D) / 10000.0D END AS w_r4,
           |  CASE WHEN k_groups >= 2 AND CAST(w6 AS DOUBLE) > 0.0D
           |      AND n > k_groups AND q95x1e4 IS NOT NULL THEN
           |    floor((CAST(n AS DOUBLE) - CAST(k_groups AS DOUBLE))
           |      * (CAST(b6 AS DOUBLE) / CAST(w6 AS DOUBLE))
           |      * 1e4 + 0.5D) > q95x1e4 END AS reject
           |FROM ${p}agg LEFT JOIN chi2 ON chi2.df = ${p}agg.k_groups - 1"""
          .stripMargin
      "WITH chi2 AS (SELECT * FROM " + chi2Values + "),\n" +
        blk("e4", "events.value~event_type",
          "SELECT event_type AS gk, cast(floor(value * 100.0D + 0.5D) AS BIGINT) AS vc " +
            "FROM events WHERE value IS NOT NULL") + ",\n" +
        blk("o4", "orders.totalprice~priority",
          "SELECT o_orderpriority AS gk, " +
            "cast(floor(o_totalprice * 100.0D + 0.5D) AS BIGINT) AS vc FROM orders") + "\n" +
        body("e4") + "\nUNION ALL\n" + body("o4")
    },
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
