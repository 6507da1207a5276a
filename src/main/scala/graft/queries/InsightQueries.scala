package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Round-12 decision-analytics surface: the classics a data team runs
  * AFTER the audits pass — market-basket association rules (the
  * retail cross-sell kernel), robust outlier screening (median/MAD —
  * the audit that survives the heavy tails that break q227's
  * mean/stddev z-scores), and weight-of-evidence / information value
  * (the credit-scoring feature screen: how much does a feature
  * separate converters from non-converters).
  *
  * Parity rules as everywhere in this battery: counts and medians are
  * exact integers; every integer product that could wrap at the
  * 100 TB row regime widens per-factor (double or decimal here,
  * HUGEINT in the oracle) BEFORE multiplying; transcendental terms
  * (ln) quantize to fixed point before any cross-row sum; top-k cuts
  * carry a total-order tiebreak.
  */
object InsightQueries {

  // ---------------------------------------------------------------
  // q246 — MARKET-BASKET ASSOCIATION RULES: which part PAIRS are
  // bought together beyond chance — support, directional confidence,
  // and lift over the order baskets, the apriori 2-itemset readout
  // (Agrawal & Srikant 1994) every retailer starts from. The scale
  // story is the apriori PRUNE: items below support 5 are cut BEFORE
  // any pairing (frequent-item join, not a filter after the blowup),
  // and pairs form by an equi-join on the order key, so the fan-out
  // is Σ_orders |basket|² — baskets are small by construction (a
  // TPC-H order has ≤ 7 lines), never corpus-quadratic. Exactness:
  // all counts are exact integers off ONE distinct (order, part)
  // grid; support/confidence are single IEEE divides of exact ints;
  // lift widens EACH factor to double before multiplying (n·c_ab and
  // c_a·c_b wrap LONG at ~1e10-order scale); the top-100 cut orders
  // by (lift, part_a, part_b) — a total order, so the selected set
  // is deterministic. Replica-invariance: lift is scale-free (×100
  // orders multiply n and every count by 100), so the 100× probe
  // answers the SAME rules.
  private def q246(s: SparkSession, dir: String): DataFrame =
    basketRules(Tables.lineitem(s, dir))

  private[graft] def basketRules(lineitem: DataFrame,
                                 minItem: Long = 5L, minPair: Long = 2L,
                                 topK: Int = 100): DataFrame = {
    // ONE volume-sized exchange, REUSED by every consumer, all of it
    // whole-stage codegen: the rows repartition by order key once;
    // hashpartitioning(o) satisfies the clustering of EVERY
    // downstream grouping and join here — the (o, p) distinct, the
    // order count, and the basket self-join all run exchange-free on
    // top of it (Catalyst's ReuseExchange collapses the four
    // identical shuffles into one), and only the bounded outputs
    // (part supports, pair cells) cross further tiny exchanges. The
    // pair fan-out is the self-join on o — Σ|basket|² rows, baskets
    // ≤ 7 in a TPC-H order. Two rejected alternatives, both measured
    // at 100×: per-basket pair generation with higher-order lambdas
    // (transform/filter run INTERPRETED per element — 56 s of
    // allocation churn vs the codegen join) and a persisted basket
    // table (array columns cache columnar-slow: 133 s re-read).
    val sp = lineitem
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .repartition(col("o"))
      .distinct() // clustering satisfied by hashpartitioning(o): no exchange
    val nOrders = sp.select(col("o")).distinct().agg(count(lit(1)).as("n"))
    val items = sp.groupBy(col("p")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= minItem)
    val a = sp.select(col("o"), col("p").as("pa"))
    val b = sp.select(col("o"), col("p").as("pb"))
    val pairs = a.join(b, Seq("o")).filter(col("pa") < col("pb"))
      .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("cab"))
      .filter(col("cab") >= minPair)
    val d = (c: Column) => c.cast("double")
    val r6 = (c: Column) => floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
    pairs
      .join(items.select(col("p").as("pa"), col("c").as("ca")), Seq("pa"))
      .join(items.select(col("p").as("pb"), col("c").as("cb")), Seq("pb"))
      .crossJoin(broadcast(nOrders))
      .select(col("pa").as("part_a"), col("pb").as("part_b"),
        col("ca").as("c_a"), col("cb").as("c_b"), col("cab").as("c_ab"),
        r6(d(col("cab")) / d(col("n"))).as("support_r6"),
        r6(d(col("cab")) / d(col("ca"))).as("conf_a_to_b_r6"),
        r6(d(col("cab")) / d(col("cb"))).as("conf_b_to_a_r6"),
        r6((d(col("n")) * d(col("cab"))) / (d(col("ca")) * d(col("cb"))))
          .as("lift_r6"))
      .orderBy(col("lift_r6").desc, col("part_a"), col("part_b"))
      .limit(topK)
  }

  // ---------------------------------------------------------------
  // q248 — MEDIAN/MAD ROBUST OUTLIER AUDIT: per event_type, the
  // median, the median absolute deviation, and how many observations
  // sit outside median ± 3·1.4826·MAD — the outlier screen that
  // SURVIVES heavy tails (q227's mean/stddev z-score is itself
  // dragged by the outliers it hunts; the median/MAD pair has a 50%
  // breakdown point, Hampel 1974). Exactness: values quantize ONCE
  // to cents; both medians are LOWER MEDIANS — the smallest value
  // whose running count reaches (n+1) DIV 2, a pure integer
  // definition with no interpolation — and the outlier test
  // cross-multiplies integers (|vc−med|·10⁴ > 44478·mad, since
  // 3·1.4826 = 4.4478 exactly), so NO float boundary decides
  // anything. Scale shape: everything runs on the (type, cent-value)
  // GRID (domain-bounded, not row-bounded): one partial agg to grid
  // grain, running sums via ChunkedFrame (type × value-band
  // parallelism — no per-type sort task), a second grid at deviation
  // grain, one final rollup. Output: |types| rows.
  private def q248(s: SparkSession, dir: String): DataFrame =
    madOutliers(Tables.events(s, dir).select(col("event_type"), col("value")))

  private[graft] def madOutliers(e: DataFrame): DataFrame = {
    val g1 = e.filter(col("value").isNotNull)
      .withColumn("vc", floor(col("value") * lit(100d) + lit(0.5d)).cast("long"))
      .groupBy(col("event_type"), col("vc")).agg(count(lit(1)).as("x"))
    val tot = g1.groupBy(col("event_type")).agg(sum(col("x")).as("n"))
    def lowerMedian(grid: DataFrame, vCol: String): DataFrame =
      graft.operators.ChunkedFrame.withRunningSum(
        grid, "event_type", expr(s"$vCol DIV 100"), Seq(vCol), "x", "cx")
        .join(broadcast(tot), Seq("event_type"))
        .filter(col("cx") >= expr("(n + 1) DIV 2")) // integer DIV, not double /
        .groupBy(col("event_type")).agg(min(col(vCol)).as("m"))
    val med = lowerMedian(g1, "vc").withColumnRenamed("m", "med")
    val devGrid = g1.join(broadcast(med), Seq("event_type"))
      .groupBy(col("event_type"), abs(col("vc") - col("med")).as("dv"))
      .agg(sum(col("x")).as("x"))
    val mad = lowerMedian(devGrid, "dv").withColumnRenamed("m", "mad")
    val out = g1.join(broadcast(med), Seq("event_type"))
      .join(broadcast(mad), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(coalesce(sum(when(
        abs(col("vc") - col("med")) * lit(10000L) > lit(44478L) * col("mad"),
        col("x"))), lit(0L)).as("n_out"))
    tot.join(med, Seq("event_type")).join(mad, Seq("event_type"))
      .join(out, Seq("event_type"))
      .select(col("event_type"), col("n"),
        (col("med").cast("double") / lit(100d)).as("median_r2"),
        (col("mad").cast("double") / lit(100d)).as("mad_r2"),
        col("n_out"),
        (floor(col("n_out").cast("double") / col("n").cast("double") * lit(1e6)
          + lit(0.5)) / lit(1e6)).as("out_share_r6"))
  }

  // ---------------------------------------------------------------
  // q249 — WEIGHT OF EVIDENCE / INFORMATION VALUE: the
  // credit-scoring feature screen (Siddiqi 2006) — how well does the
  // event-value band separate POWER-BUYER traffic (users with > 13
  // purchases) from the rest? Per band b: WoE_b = ln(share of good-
  // user events / share of bad-user events), IV = Σ_b (pg−pb)·WoE_b;
  // IV < 0.02 is noise, > 0.3 a strong feature. Bands are q229's
  // micro-log2 cells (no raw double boundary); shares are Laplace-
  // smoothed (n + 0.5) / (N + 0.5·B) so every WoE is finite; each
  // band's IV term (≥ 0) quantizes to 1e-12 fixed point BEFORE the
  // sum (order-free integer), and the total closes in integer
  // arithmetic (the q229 closing). Scale shape: one user-grain
  // partial agg labels the users; the label joins back on user_id
  // (key-grain ⋈ row-grain equi-join, AQE free to broadcast a
  // dim-sized user set); then ONE partial agg to (band, label)
  // grain. Output: |bands| rows + the __overall IV row (band
  // -1000000, the sentinel outside the valueBand range).
  private def q249(s: SparkSession, dir: String): DataFrame =
    infoValue(Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("value")))

  private[graft] def infoValue(e: DataFrame): DataFrame = {
    val labels = e.groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "purchase", lit(1L))
        .otherwise(lit(0L))).as("np"))
      .select(col("user_id"), (col("np") > 13L).as("good"))
    val cells = e.filter(col("value").isNotNull)
      .join(labels, Seq("user_id"))
      .groupBy(AuditQueries.valueBand(col("value")).as("band"))
      .agg(coalesce(sum(when(col("good"), lit(1L))), lit(0L)).as("g"),
        coalesce(sum(when(!col("good"), lit(1L))), lit(0L)).as("b"))
    val tot = cells.agg(sum(col("g")).as("tg"), sum(col("b")).as("tb"),
      count(lit(1)).as("nbands"))
    val pg = (col("g").cast("double") + lit(0.5)) /
      (col("tg").cast("double") + lit(0.5) * col("nbands").cast("double"))
    val pb = (col("b").cast("double") + lit(0.5)) /
      (col("tb").cast("double") + lit(0.5) * col("nbands").cast("double"))
    val woe = log(pg / pb)
    val perBand = cells.crossJoin(broadcast(tot))
      .withColumn("woe_r6",
        floor(woe * lit(1e6) + lit(0.5)) / lit(1e6))
      .withColumn("tfp", floor((pg - pb) * woe * lit(1e12) + lit(0.5)).cast("long"))
    val bands = perBand.select(col("band"), col("g").as("n_good"),
      col("b").as("n_bad"), col("woe_r6"),
      (col("tfp").cast("double") / lit(1e12)).as("iv_term"))
    val overall = perBand.agg(sum(col("g")).as("n_good"), sum(col("b")).as("n_bad"),
      sum(col("tfp")).as("sfp"))
      .select(lit(-1000000L).as("band"), col("n_good"), col("n_bad"),
        lit(null).cast("double").as("woe_r6"),
        (expr("(sfp + 500000) DIV 1000000").cast("double") / lit(1e6)).as("iv_term"))
    bands.unionByName(overall)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q246_basket_rules" -> q246 _,
    "q248_mad_outliers" -> q248 _,
    "q249_info_value" -> q249 _
  )

  val oracleSql: Map[String, String] = Map(
    "q246_basket_rules" ->
      """WITH sp AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |nn AS (SELECT count(DISTINCT o)::BIGINT AS n FROM sp),
        |it AS (SELECT p, count(*)::BIGINT AS c FROM sp GROUP BY 1 HAVING count(*) >= 5),
        |pr AS (
        |  SELECT a.p AS pa, b.p AS pb, ia.c AS ca, ib.c AS cb, count(*)::BIGINT AS cab
        |  FROM sp a JOIN sp b ON a.o = b.o AND a.p < b.p
        |  JOIN it ia ON ia.p = a.p JOIN it ib ON ib.p = b.p
        |  GROUP BY 1, 2, 3, 4 HAVING count(*) >= 2
        |)
        |SELECT pa AS part_a, pb AS part_b, ca AS c_a, cb AS c_b, cab AS c_ab,
        |  floor(cab::DOUBLE / n::DOUBLE * 1e6 + 0.5)/1e6 AS support_r6,
        |  floor(cab::DOUBLE / ca::DOUBLE * 1e6 + 0.5)/1e6 AS conf_a_to_b_r6,
        |  floor(cab::DOUBLE / cb::DOUBLE * 1e6 + 0.5)/1e6 AS conf_b_to_a_r6,
        |  floor((n::DOUBLE * cab::DOUBLE) / (ca::DOUBLE * cb::DOUBLE) * 1e6 + 0.5)/1e6 AS lift_r6
        |FROM pr, nn
        |ORDER BY lift_r6 DESC, pa, pb LIMIT 100""".stripMargin,
    "q248_mad_outliers" ->
      """WITH v AS (
        |  SELECT event_type, floor(value * 100 + 0.5)::BIGINT AS vc
        |  FROM events WHERE value IS NOT NULL
        |), g AS (SELECT event_type, vc, count(*)::BIGINT AS x FROM v GROUP BY 1, 2),
        |t AS (SELECT event_type, sum(x)::BIGINT AS n FROM g GROUP BY 1),
        |c1 AS (
        |  SELECT *, sum(x) OVER (PARTITION BY event_type ORDER BY vc
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cx
        |  FROM g
        |), med AS (
        |  SELECT c1.event_type, min(vc) AS med
        |  FROM c1 JOIN t USING (event_type)
        |  WHERE cx >= (n + 1) // 2 GROUP BY 1
        |), dg AS (
        |  SELECT g.event_type, abs(vc - med) AS dv, sum(x)::BIGINT AS x
        |  FROM g JOIN med USING (event_type) GROUP BY 1, 2
        |), c2 AS (
        |  SELECT *, sum(x) OVER (PARTITION BY event_type ORDER BY dv
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cx
        |  FROM dg
        |), mad AS (
        |  SELECT c2.event_type, min(dv) AS mad
        |  FROM c2 JOIN t USING (event_type)
        |  WHERE cx >= (n + 1) // 2 GROUP BY 1
        |), o AS (
        |  SELECT g.event_type,
        |    coalesce(sum(CASE WHEN abs(vc - med) * 10000 > 44478 * mad THEN x END), 0)::BIGINT AS n_out
        |  FROM g JOIN med USING (event_type) JOIN mad USING (event_type)
        |  GROUP BY 1
        |)
        |SELECT event_type, n, med::DOUBLE / 100 AS median_r2,
        |  mad::DOUBLE / 100 AS mad_r2, n_out,
        |  floor(n_out::DOUBLE / n::DOUBLE * 1e6 + 0.5)/1e6 AS out_share_r6
        |FROM t JOIN med USING (event_type) JOIN mad USING (event_type)
        |  JOIN o USING (event_type)""".stripMargin,
    "q249_info_value" ->
      """WITH lab AS (
        |  SELECT user_id,
        |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) > 13 AS good
        |  FROM events GROUP BY 1
        |), cells AS (
        |  SELECT CASE WHEN value > 0
        |      THEN CAST(floor(floor(log2(value) * 1e6 + 0.5)::BIGINT / 1000000.0) AS BIGINT)
        |      ELSE -999 END AS band,
        |    coalesce(sum(CASE WHEN good THEN 1 END), 0)::BIGINT AS g,
        |    coalesce(sum(CASE WHEN NOT good THEN 1 END), 0)::BIGINT AS b
        |  FROM events JOIN lab USING (user_id)
        |  WHERE value IS NOT NULL GROUP BY 1
        |), tot AS (
        |  SELECT sum(g)::BIGINT AS tg, sum(b)::BIGINT AS tb, count(*)::BIGINT AS nbands
        |  FROM cells
        |), terms AS (
        |  SELECT band, g, b,
        |    floor(ln(((g::DOUBLE + 0.5) / (tg::DOUBLE + 0.5 * nbands::DOUBLE))
        |            / ((b::DOUBLE + 0.5) / (tb::DOUBLE + 0.5 * nbands::DOUBLE)))
        |      * 1e6 + 0.5) / 1e6 AS woe_r6,
        |    floor((((g::DOUBLE + 0.5) / (tg::DOUBLE + 0.5 * nbands::DOUBLE))
        |         - ((b::DOUBLE + 0.5) / (tb::DOUBLE + 0.5 * nbands::DOUBLE)))
        |      * ln(((g::DOUBLE + 0.5) / (tg::DOUBLE + 0.5 * nbands::DOUBLE))
        |          / ((b::DOUBLE + 0.5) / (tb::DOUBLE + 0.5 * nbands::DOUBLE)))
        |      * 1e12 + 0.5)::BIGINT AS tfp
        |  FROM cells, tot
        |)
        |SELECT band, g AS n_good, b AS n_bad, woe_r6, tfp::DOUBLE / 1e12 AS iv_term
        |FROM terms
        |UNION ALL
        |SELECT -1000000, sum(g)::BIGINT, sum(b)::BIGINT, NULL,
        |  ((sum(tfp) + 500000) // 1000000)::DOUBLE / 1e6
        |FROM terms""".stripMargin
  )
}
