package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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
  // any pairing (a broadcast frequent-item semi-join into the
  // baskets, not a filter after the blowup), and pairs form by an
  // equi-join on the order key, so the fan-out is
  // Σ_orders |frequent-basket|² — baskets are small by construction
  // (a TPC-H order has ≤ 7 lines) and a singleton-heavy vocabulary
  // prunes to near-nothing, never corpus-quadratic. Exactness:
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
    // the DECLARED plan builds the three frames directly off the one
    // reused exchange — routing the batch query through the unioned
    // cell grid (basketCells + persist) was measured 2× slower at
    // 100× (54 s vs 26 s: the union materialization serializes what
    // ReuseExchange otherwise overlaps). The closing is the SAME
    // rulesClosing the streaming serve uses, so batch ≡ serve stays
    // structural (InsightStreamSpec pins it bitwise).
    val sp = basketBase(lineitem)
    val nOrders = sp.select(col("o")).distinct().agg(count(lit(1)).as("n"))
    val items = sp.groupBy(col("p")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= minItem)
    // the apriori prune, applied BEFORE pairing: a broadcast join
    // cuts every infrequent item out of the baskets ahead of the
    // self-join, so the fan-out is Σ|frequent-basket|², not Σ|basket|²
    // — on a singleton-heavy retail vocabulary that is the whole
    // game (InsightStreamSpec measures the cut on a planted feed).
    // Result-identical by construction: rulesClosing inner-joins
    // pairs to the frequent-item supports on BOTH keys, so any pair
    // touching an infrequent item is dropped downstream anyway. The
    // broadcast preserves hashpartitioning(o) on the probe side
    // (frequent-item dictionaries are support-thresholded — the
    // classic apriori assumption that they fit one node; TPC-H 100×
    // is ~2M parts ≈ 16 MB). Deliberately an INNER join on the
    // UNIQUE key set, not LEFT SEMI (identical result): Catalyst's
    // PushDownLeftSemiAntiJoin pushes a semi THROUGH the distinct
    // aggregate and the order-key exchange down to the raw scans,
    // which re-probes the broadcast at LINE grain on BOTH pair
    // sides, splits the shared subtree, and cost 26→69 s at the
    // 100× probe (golden-plan diff caught it); the inner join has
    // no such pushdown rule, so the prune runs exactly once at
    // basket grain ON TOP of the one reused exchange.
    val spF = sp.join(broadcast(items.select(col("p"))), Seq("p"))
    val a = spF.select(col("o"), col("p").as("pa"))
    val b = spF.select(col("o"), col("p").as("pb"))
    val pairs = a.join(b, Seq("o")).filter(col("pa") < col("pb"))
      .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("cab"))
      .filter(col("cab") >= minPair)
    rulesClosing(pairs, items, nOrders, topK)
  }

  /** The (o, p) distinct repartitioned ONCE by order key —
    * hashpartitioning(o) satisfies the clustering of every downstream
    * grouping and join, so Catalyst's ReuseExchange collapses the
    * consumers' shuffles into one. */
  private def basketBase(lineitem: DataFrame): DataFrame =
    lineitem
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .repartition(col("o"))
      .distinct() // clustering satisfied by hashpartitioning(o): no exchange

  /** The additive (ka, kb, cnt) COUNTING-CELL grid of an order-line
    * feed — q246's mergeable state: pair cells (both keys set),
    * item-support cells (kb null), and the order-count sentinel (both
    * null), all built off the one reused order-key exchange. Cells
    * merge by ADDITION across disjoint order sets, so the same build
    * serves batch q246 and the streaming maintainer
    * (StreamPipeline.basketMaintain — contract there: an order's
    * lines arrive within ONE micro-batch, the completed-basket /
    * transactional-outbox shape).
    *
    * DELIBERATELY UNPRUNED, unlike [[basketRules]]' pre-pair
    * semi-join: cells merge additively across batches, and an item
    * below the support threshold in THIS batch may be frequent
    * globally once later batches land — a per-batch apriori prune
    * would silently drop its pair counts forever. The prune is
    * applied where it is sound: at SERVE time, by [[rulesFromCells]]'
    * thresholds over the accumulated grid. The per-batch fan-out
    * stays Σ|batch-basket|² — bounded by the micro-batch, not the
    * corpus, which is the quantity that matters for a maintainer. */
  private[graft] def basketCells(lineitem: DataFrame): DataFrame = {
    val sp = basketBase(lineitem)
    val nOrders = sp.select(col("o")).distinct().agg(count(lit(1)).as("cnt"))
      .select(lit(null).cast("long").as("ka"), lit(null).cast("long").as("kb"),
        col("cnt"))
    val items = sp.groupBy(col("p")).agg(count(lit(1)).as("cnt"))
      .select(col("p").cast("long").as("ka"), lit(null).cast("long").as("kb"),
        col("cnt"))
    val a = sp.select(col("o"), col("p").as("pa"))
    val b = sp.select(col("o"), col("p").as("pb"))
    val pairs = a.join(b, Seq("o")).filter(col("pa") < col("pb"))
      .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("cnt"))
      .select(col("pa").cast("long").as("ka"), col("pb").cast("long").as("kb"),
        col("cnt"))
    pairs.unionByName(items).unionByName(nOrders)
  }

  /** q246's closing over any (ka, kb, cnt) cell grid — ONE code path
    * with the streaming serve (StreamPipeline.basketServe). */
  private[graft] def rulesFromCells(cells: DataFrame,
                                    minItem: Long = 5L, minPair: Long = 2L,
                                    topK: Int = 100): DataFrame = {
    val nOrders = cells.filter(col("ka").isNull && col("kb").isNull)
      .agg(coalesce(sum(col("cnt")), lit(0L)).as("n"))
    val items = cells.filter(col("ka").isNotNull && col("kb").isNull)
      .select(col("ka").as("p"), col("cnt").as("c"))
      .filter(col("c") >= minItem)
    val pairs = cells.filter(col("ka").isNotNull && col("kb").isNotNull)
      .select(col("ka").as("pa"), col("kb").as("pb"), col("cnt").as("cab"))
      .filter(col("cab") >= minPair)
    rulesClosing(pairs, items, nOrders, topK)
  }

  /** The shared metric closing over (pa, pb, cab) pairs, (p, c) item
    * supports and the 1-row order count — identical expressions for
    * the declared plan and the cell-grid serve, so the two paths
    * cannot drift. */
  private def rulesClosing(pairs: DataFrame, items: DataFrame,
                           nOrders: DataFrame, topK: Int): DataFrame = {
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

  /** The additive (event_type, cent-value) count grid — q248's
    * mergeable state (domain-bounded, merge-by-addition, no arrival
    * contract: the psiGrid convergence class), shared by the declared
    * query and the streaming maintainer (StreamPipeline.madMaintain). */
  private[graft] def madGrid(e: DataFrame): DataFrame =
    e.filter(col("value").isNotNull)
      .withColumn("vc", floor(col("value") * lit(100d) + lit(0.5d)).cast("long"))
      .groupBy(col("event_type"), col("vc")).agg(count(lit(1)).as("x"))

  private[graft] def madOutliers(e: DataFrame): DataFrame =
    madFromGrid(madGrid(e))

  /** q248's closing over any (event_type, vc, x) grid — ONE code path
    * with the streaming serve (StreamPipeline.madServe). */
  private[graft] def madFromGrid(g1: DataFrame): DataFrame = {
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
  // q260 — TRIMMED / WINSORIZED MEAN AUDIT: each event_type's raw
  // mean next to its 5% trimmed mean (drop the k smallest and k
  // largest, k = ⌊0.05·n⌋) and 5% winsorized mean (clamp them to the
  // order statistics x₍ₖ₊₁₎ / x₍ₙ₋ₖ₎, Tukey's robustification) — the
  // single number that says HOW MUCH of q248's outlier mass actually
  // moves the location estimate (MAD says the tails are heavy; the
  // trimmed-vs-raw gap says whether your dashboards should care).
  // Exactness: everything is exact integer arithmetic on q248's
  // (type, cent-value) grid — the kept mass of a cell is a pure
  // rank-range overlap max(0, min(ct, n−k) − max(prev, k)), the two
  // clamp values are lower order statistics (smallest vc whose
  // running count reaches the rank — the q248 lower-median rule,
  // interpolation-free), and the three sums widen cell-count ×
  // cents PER FACTOR to decimal(38,0) (HUGEINT oracle — count is
  // volume-scale, cents value-scale; the q240/q241 class). The only
  // IEEE ops are the three closing divides. Scale shape: q248's —
  // one partial agg to the domain-bounded grid, ChunkedFrame banded
  // running counts (type × value-band parallelism, no per-type sort
  // task), |types| output rows. The grid is the SAME additive store
  // madMaintain keeps live, so the streaming serve is free
  // (StreamPipeline.trimmedServe — one store, two serves).
  private def q260(s: SparkSession, dir: String): DataFrame =
    trimmedFromGrid(madGrid(
      Tables.events(s, dir).select(col("event_type"), col("value"))))

  /** q260's closing over any (event_type, vc, x) grid — ONE code path
    * with the streaming serve (StreamPipeline.trimmedServe). */
  private[graft] def trimmedFromGrid(g1: DataFrame): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val tot = g1.groupBy(col("event_type")).agg(sum(col("x")).as("n"))
    val cum = graft.operators.ChunkedFrame.withRunningSum(
      g1, "event_type", expr("vc DIV 100"), Seq("vc"), "x", "ct")
      .join(broadcast(tot), Seq("event_type"))
      .withColumn("k", expr("(n * 5) DIV 100"))
      .withColumn("prev", col("ct") - col("x"))
    val kept = cum.withColumn("keep", greatest(lit(0L),
      least(col("ct"), col("n") - col("k")) - greatest(col("prev"), col("k"))))
    val pLo = cum.filter(col("ct") >= col("k") + lit(1L))
      .groupBy(col("event_type")).agg(min(col("vc")).as("p_lo"))
    val pHi = cum.filter(col("ct") >= col("n") - col("k"))
      .groupBy(col("event_type")).agg(min(col("vc")).as("p_hi"))
    val sums = kept.groupBy(col("event_type")).agg(
      sum(d38(col("x")) * d38(col("vc"))).as("s_all"),
      sum(d38(col("keep")) * d38(col("vc"))).as("s_trim"))
    def dd(c: Column) = c.cast("double")
    val sWins = col("s_trim") + d38(col("k")) * d38(col("p_lo")) +
      d38(col("k")) * d38(col("p_hi"))
    tot.join(sums, Seq("event_type"))
      .join(broadcast(pLo), Seq("event_type"))
      .join(broadcast(pHi), Seq("event_type"))
      .withColumn("k", expr("(n * 5) DIV 100"))
      .select(col("event_type"), col("n"), col("k").as("n_trim_each"),
        r4(dd(col("s_all")) / dd(col("n")) / lit(100d)).as("mean_r4"),
        when(col("n") - lit(2L) * col("k") > 0,
          r4(dd(col("s_trim")) / dd(col("n") - lit(2L) * col("k")) / lit(100d)))
          .as("trimmed_r4"),
        r4(dd(sWins) / dd(col("n")) / lit(100d)).as("winsor_r4"))
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

  // ---------------------------------------------------------------
  // q250 — MANN-WHITNEY U RANK-SUM DRIFT TEST: the rank-based
  // two-sample companion to q241's KS — does each event_type's LATE
  // half tend to larger values than its EARLY half (Mann & Whitney
  // 1947)? KS sees any distributional change; the U test targets the
  // location shift a metric owner usually means by "drifted up".
  // Exactness: the whole statistic is exact integer arithmetic on
  // the (type, cent-value) grid — midranks double to stay integer
  // (2·midrank = 2·prev + t + 1), so 2R₁ = Σ_v a_v·(2·prev_v+t_v+1)
  // and 2U₁ = 2R₁ − n₁(n₁+1) are exact, with every product widened
  // to decimal(38,0) (HUGEINT oracle) BEFORE multiplying (a_v·prev_v
  // wraps LONG in the 100 TB regime — the q240/q241 lesson). The
  // tie-corrected normal z closes in ONE shared IEEE sequence; the
  // α = 0.05 rejection tests the QUANTIZED |z₄| > 19600, never a raw
  // float boundary. Scale shape: q241's — one partial agg to grid
  // grain, chunked running sums, |types| output rows.
  private def q250(s: SparkSession, dir: String): DataFrame =
    mannWhitney(Tables.events(s, dir)
      .select(col("event_type"), to_date(col("ts")).as("day"), col("value")))

  private[graft] def mannWhitney(e: DataFrame): DataFrame = {
    val bounds = e.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val vals = e.crossJoin(broadcast(bounds))
      .withColumn("late",
        datediff(col("day"), col("d0")) >= expr("(datediff(d1, d0) + 1) DIV 2"))
      .filter(col("value").isNotNull)
      .withColumn("vc", floor(col("value") * lit(100d) + lit(0.5d)).cast("long"))
      .groupBy(col("event_type"), col("vc"))
      .agg(count(when(!col("late"), lit(1))).as("a"),
        count(when(col("late"), lit(1))).as("b"))
      .withColumn("t", col("a") + col("b"))
    val cum = graft.operators.ChunkedFrame.withRunningSum(
      vals, "event_type", expr("vc DIV 100"), Seq("vc"), "t", "ct")
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val per = cum
      .withColumn("prev", col("ct") - col("t"))
      .groupBy(col("event_type"))
      .agg(sum(col("a")).as("n1"), sum(col("b")).as("n2"),
        sum(d38(col("a")) * d38(col("prev") * lit(2L) + col("t") + lit(1L)))
          .as("r1x2"),
        sum(d38(col("t")) * d38(col("t")) * d38(col("t")) - d38(col("t")))
          .as("ties"))
    val dd = (c: Column) => c.cast("double")
    val u1x2 = col("r1x2") - d38(col("n1")) * d38(col("n1") + lit(1L))
    val nTot = col("n1") + col("n2")
    val num = (u1x2 - d38(col("n1")) * d38(col("n2"))).cast("double")
    val varCore = dd(col("n1")) * dd(col("n2")) *
      ((dd(nTot) + lit(1.0)) -
        col("ties").cast("double") / (dd(nTot) * (dd(nTot) - lit(1.0)))) / lit(12.0)
    val z = num / (lit(2.0) * sqrt(varCore))
    val z4 = floor(z * lit(1e4) + lit(0.5)).cast("long")
    per
      .withColumn("u1", u1x2.cast("double") / lit(2.0))
      .select(col("event_type"), col("n1").as("n_early"), col("n2").as("n_late"),
        col("u1"),
        when(varCore > 0, z4.cast("double") / lit(1e4)).as("z_r4"),
        when(varCore > 0, abs(z4) > 19600L).as("reject"))
  }

  // ---------------------------------------------------------------
  // q251 — SPEARMAN RANK CORRELATION PAIRS SCREEN: the rank-based
  // companion to the Pearson/cointegration pair screens (q198/q223)
  // — monotone co-movement that survives outliers and nonlinearity.
  // Exactness: midranks DOUBLE to stay integer (2·midrank =
  // 2·rank + ties − 1, from one rank() and one tie-count window per
  // axis), Spearman is then the Pearson of the doubled ranks — five
  // exact integer power sums widened to decimal (HUGEINT oracle)
  // with ONE shared IEEE closing. Ties make the classic 6Σd²
  // shortcut wrong, midranks keep it exact. Scale shape: returns
  // join day-grain (the day grid is volume-independent after
  // DailyCloses' one partial agg); the rank windows partition per
  // PAIR over day-grid rows — never a volume-sized sort.
  private def q251(s: SparkSession, dir: String): DataFrame =
    spearmanPairs(MarketQueries.dailyReturns(s, dir))

  private[graft] def spearmanPairs(rets: DataFrame): DataFrame = {
    val a = rets.select(col("event_type").as("ta"), col("day"), col("r_fp").as("x"))
    val b = rets.select(col("event_type").as("tb"), col("day"), col("r_fp").as("y"))
    val j = a.join(b, Seq("day")).filter(col("ta") < col("tb"))
    val wx = Window.partitionBy(col("ta"), col("tb")).orderBy(col("x"))
    val wy = Window.partitionBy(col("ta"), col("tb")).orderBy(col("y"))
    val twx = Window.partitionBy(col("ta"), col("tb"), col("x"))
    val twy = Window.partitionBy(col("ta"), col("tb"), col("y"))
    val ranked = j
      .withColumn("rx2", lit(2L) * rank().over(wx) + count(lit(1)).over(twx) - lit(1L))
      .withColumn("ry2", lit(2L) * rank().over(wy) + count(lit(1)).over(twy) - lit(1L))
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val g = ranked.groupBy(col("ta"), col("tb"))
      .agg(count(lit(1)).as("n"),
        sum(col("rx2")).as("sx"), sum(col("ry2")).as("sy"),
        sum(d38(col("rx2")) * d38(col("ry2"))).as("sxy"),
        sum(d38(col("rx2")) * d38(col("rx2"))).as("sxx"),
        sum(d38(col("ry2")) * d38(col("ry2"))).as("syy"))
    val num = (d38(col("n")) * col("sxy") - d38(col("sx")) * d38(col("sy"))).cast("double")
    val dxx = (d38(col("n")) * col("sxx") - d38(col("sx")) * d38(col("sx"))).cast("double")
    val dyy = (d38(col("n")) * col("syy") - d38(col("sy")) * d38(col("sy"))).cast("double")
    g.select(col("ta").as("type_a"), col("tb").as("type_b"), col("n").as("n_days"),
      when(col("n") > 1 && dxx > 0 && dyy > 0,
        floor(num / sqrt(dxx * dyy) * lit(1e6) + lit(0.5)) / lit(1e6))
        .as("spearman_r6"))
  }

  // ---------------------------------------------------------------
  // q252 — THEIL-SEN ROBUST TREND: the median of all pairwise slopes
  // of each instrument's daily-close series (Theil 1950, Sen 1968) —
  // the trend estimate a single flash-crash day cannot drag, next to
  // the OLS slope it is robust AGAINST (reported alongside for the
  // contrast). Exactness: closes are micro-log2 integers on the
  // day-INDEX axis, so each pairwise slope is one IEEE divide of
  // exact ints — identical doubles on both engines — and the median
  // is the LOWER median (order statistic, no interpolation) of the
  // sorted slope list; the OLS twin closes from exact integer power
  // sums (decimal-widened / HUGEINT). Scale shape: the day grid is
  // volume-independent, so the C(n,2) slope enumeration is a
  // per-type ARRAY fold over bounded n — never a row-grain pair
  // join. Output: |types| rows, slopes in log2-units/day.
  private def q252(s: SparkSession, dir: String): DataFrame =
    theilSen(graft.operators.DailyCloses.closes(
      graft.operators.DailyCloses.state(Tables.events(s, dir))))

  private[graft] def theilSen(cl: DataFrame): DataFrame = {
    val base = graft.operators.DayGrid
      .series(cl, "event_type", "day", "close_lv", "theilSen")
      .withColumnRenamed("n", "m")
      .filter(col("m") >= 2)
      .withColumn("slopes", expr(
        "sort_array(flatten(transform(sequence(0, CAST(m - 2 AS INT)), " +
          "i -> transform(sequence(i + 1, CAST(m - 1 AS INT)), " +
          "j -> CAST(xs[j] - xs[i] AS DOUBLE) / CAST(j - i AS DOUBLE)))))"))
      .withColumn("np", size(col("slopes")).cast("long"))
      .withColumn("ts_fp", expr("element_at(slopes, CAST((np + 1) DIV 2 AS INT))"))
      // OLS twin over the same (index, close) points: exact integer
      // power sums, decimal-widened
      .withColumn("st", expr(
        "aggregate(sequence(0, CAST(m - 1 AS INT)), CAST(0 AS BIGINT), (a, i) -> a + i)"))
      .withColumn("sy", expr(
        "aggregate(xs, CAST(0 AS BIGINT), (a, e) -> a + e)"))
      .withColumn("sty", expr(
        "aggregate(sequence(0, CAST(m - 1 AS INT)), CAST(0 AS DECIMAL(38,0)), " +
          "(a, i) -> a + CAST(i AS DECIMAL(38,0)) * CAST(xs[i] AS DECIMAL(38,0)))"))
      .withColumn("stt", expr(
        "aggregate(sequence(0, CAST(m - 1 AS INT)), CAST(0 AS DECIMAL(38,0)), " +
          "(a, i) -> a + CAST(i AS DECIMAL(38,0)) * CAST(i AS DECIMAL(38,0)))"))
    val olsNum = (expr("CAST(m AS DECIMAL(38,0)) * sty") -
      expr("CAST(st AS DECIMAL(38,0)) * CAST(sy AS DECIMAL(38,0))")).cast("double")
    val olsDen = (expr("CAST(m AS DECIMAL(38,0)) * stt") -
      expr("CAST(st AS DECIMAL(38,0)) * CAST(st AS DECIMAL(38,0))")).cast("double")
    base.select(col("event_type"), col("m").as("n_days"), col("np").as("n_pairs"),
      r4(col("ts_fp") / lit(1e6)).as("ts_slope_r4"),
      when(olsDen > 0, r4(olsNum / olsDen / lit(1e6))).as("ols_slope_r4"))
  }

  // ---------------------------------------------------------------
  // q253 — DECISION-STUMP SPLIT / INFORMATION GAIN: the one-level
  // tree a feature platform fits first — over q249's value bands and
  // power-buyer label, which threshold "band ≤ θ" maximizes
  // information gain (Quinlan 1986)? The readout next to q249: IV
  // says the feature separates, the stump says WHERE to cut it.
  // Exactness: all counts are exact integers off the same (band,
  // label) cells as q249; cumulative left/right splits come from a
  // band-domain self-join (≤|bands|² ~ tiny — no window, no sort);
  // each candidate's gain is PER-ROW double arithmetic over exact
  // integer ratios (ln is cross-engine-safe; nothing float ever
  // sums ACROSS rows), quantized to r6; the best row is the QUANTIZED
  // argmax with the smallest-band tiebreak — an integer decision.
  // Scale shape: q249's two partial aggs; everything after is
  // band-domain. Output: one row per candidate threshold.
  private def q253(s: SparkSession, dir: String): DataFrame =
    stumpSplit(Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("value")))

  private[graft] def stumpSplit(e: DataFrame): DataFrame = {
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
      max(col("band")).as("maxband"))
    // cumulative left counts by a band-domain self-join (≤|bands|²)
    val cum = cells.select(col("band").as("thr"))
      .join(cells, col("band") <= col("thr"))
      .groupBy(col("thr"))
      .agg(sum(col("g")).as("gl"), sum(col("b")).as("bl"))
    val dd = (c: Column) => c.cast("double")
    def h(g: Column, b: Column): Column = {
      val n = dd(g) + dd(b)
      val pg = dd(g) / n
      val pb = dd(b) / n
      when(g === 0L || b === 0L, lit(0.0))
        .otherwise(-(pg * log(pg) + pb * log(pb)))
    }
    val withTot = cum.crossJoin(broadcast(tot))
      .filter(col("thr") < col("maxband")) // right side must be non-empty
      .withColumn("gr", col("tg") - col("gl"))
      .withColumn("br", col("tb") - col("bl"))
    val n = dd(col("tg")) + dd(col("tb"))
    val nL = dd(col("gl")) + dd(col("bl"))
    val nR = dd(col("gr")) + dd(col("br"))
    val gain = h(col("tg"), col("tb")) -
      (nL / n) * h(col("gl"), col("bl")) - (nR / n) * h(col("gr"), col("br"))
    val scored = withTot
      .withColumn("gain_r6", floor(gain * lit(1e6) + lit(0.5)) / lit(1e6))
    val best = scored.agg(max(col("gain_r6")).as("bg"))
    val bestThr = scored.join(broadcast(best), scored("gain_r6") === best("bg"))
      .agg(min(col("thr")).as("bthr"))
    scored.crossJoin(broadcast(bestThr))
      .select(col("thr").as("band_thresh"),
        col("gl").as("n_left_good"), col("bl").as("n_left_bad"),
        col("gr").as("n_right_good"), col("br").as("n_right_bad"),
        col("gain_r6"), (col("thr") === col("bthr")).as("is_best"))
  }

  // ---------------------------------------------------------------
  // q254 — KENDALL'S TAU-B PAIRS SCREEN: the third member of the
  // co-movement triple (q198 Pearson, q251 Spearman) — the
  // concordance probability interpretation a risk committee actually
  // reads ("in what share of day pairs do the two instruments move
  // the same way?"), tie-corrected (tau-b, Kendall 1945). Exactness:
  // EVERYTHING is exact integer counting — concordant/discordant/
  // x-tie/y-tie pair counts from one day<day self-join per pair, n₀
  // = m(m−1)/2 from the same join — and the closing
  // (C−D)/√((n₀−nx)(n₀−ny)) widens each factor to decimal (HUGEINT
  // oracle) with one IEEE sqrt+divide. Scale shape: the self-join
  // runs on DAY-GRID rows (volume-independent after DailyCloses'
  // one partial agg) — Σ_pairs m² pairs of a bounded m, all codegen
  // (no interpreted lambdas: the q246 lesson). Output: |pairs| rows.
  private def q254(s: SparkSession, dir: String): DataFrame =
    kendallPairs(MarketQueries.dailyReturns(s, dir))

  private[graft] def kendallPairs(rets: DataFrame): DataFrame = {
    val a = rets.select(col("event_type").as("ta"), col("day"), col("r_fp").as("x"))
    val b = rets.select(col("event_type").as("tb"), col("day"), col("r_fp").as("y"))
    val j = a.join(b, Seq("day")).filter(col("ta") < col("tb"))
    val l = j.select(col("ta"), col("tb"), col("day").as("d1"),
      col("x").as("x1"), col("y").as("y1"))
    val r = j.select(col("ta"), col("tb"), col("day").as("d2"),
      col("x").as("x2"), col("y").as("y2"))
    val strict = col("x1") =!= col("x2") && col("y1") =!= col("y2")
    val same = (col("x1") < col("x2")) === (col("y1") < col("y2"))
    val g = l.join(r, Seq("ta", "tb")).filter(col("d1") < col("d2"))
      .groupBy(col("ta"), col("tb"))
      .agg(count(lit(1)).as("n0"),
        coalesce(sum(when(strict && same, lit(1L))), lit(0L)).as("c"),
        coalesce(sum(when(strict && !same, lit(1L))), lit(0L)).as("d"),
        coalesce(sum(when(col("x1") === col("x2"), lit(1L))), lit(0L)).as("nx"),
        coalesce(sum(when(col("y1") === col("y2"), lit(1L))), lit(0L)).as("ny"))
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val den = ((d38(col("n0")) - d38(col("nx"))) *
      (d38(col("n0")) - d38(col("ny")))).cast("double")
    g.select(col("ta").as("type_a"), col("tb").as("type_b"), col("n0").as("n_pairs"),
      col("c").as("n_concordant"), col("d").as("n_discordant"),
      when(den > 0,
        floor((col("c") - col("d")).cast("double") / sqrt(den) * lit(1e6) + lit(0.5))
          / lit(1e6)).as("tau_b_r6"))
  }

  // ---------------------------------------------------------------
  // q255 — HERFINDAHL-HIRSCHMAN REVENUE CONCENTRATION: per nation,
  // how concentrated is customer revenue — HHI = Σ share², the
  // antitrust/portfolio concentration index that pairs with q228's
  // Gini (Gini measures inequality of the whole curve, HHI weights
  // the TOP: one dominant account moves HHI far more). Exactness:
  // per-customer revenue quantizes ONCE to cents; HHI's numerator
  // Σc² and denominator S² are exact decimal sums (c² wraps LONG at
  // ~$30B accounts — HUGEINT oracle); the "concentrated" flag tests
  // the EXACT integer inequality 4·Σc² > S² (HHI > 0.25 cleared of
  // its divide), and the top share is one IEEE divide. Scale shape:
  // q228's — one order-grain partial agg to customer grain, nation
  // rollups on the customer-domain table. Output: |nations| rows.
  private def q255(s: SparkSession, dir: String): DataFrame = {
    val rev = Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(floor(col("o_totalprice") * lit(100d) + lit(0.5d)).cast("long"))
        .as("cents"))
    val cust = Tables.customer(s, dir)
      .join(rev, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_nationkey"), coalesce(col("cents"), lit(0L)).as("cents"))
    hhi(cust)
  }

  private[graft] def hhi(cust: DataFrame): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val g = cust.groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_cust"),
        sum(col("cents")).as("s1"),
        sum(d38(col("cents")) * d38(col("cents"))).as("s2"),
        max(col("cents")).as("mx"))
    g.select(col("c_nationkey"), col("n_cust"),
      (floor(col("s1").cast("double") / lit(100d) * lit(1e4) + lit(0.5)) / lit(1e4))
        .as("total_rev_r4"),
      when(col("s1") > 0,
        floor(col("s2").cast("double") /
          (d38(col("s1")) * d38(col("s1"))).cast("double") * lit(1e6) + lit(0.5))
          / lit(1e6)).as("hhi_r6"),
      when(col("s1") > 0,
        floor(col("mx").cast("double") / col("s1").cast("double") * lit(1e6)
          + lit(0.5)) / lit(1e6)).as("top_share_r6"),
      when(col("s1") > 0,
        lit(4) * col("s2") > d38(col("s1")) * d38(col("s1"))).as("concentrated"))
  }

  // ---------------------------------------------------------------
  // q263 — KRUSKAL-WALLIS H: do the k GROUPS of a categorical column
  // draw their values from the same distribution (Kruskal & Wallis
  // 1952) — the k-sample generalization of q250's two-sample U test,
  // run over two relations: event values across event_types (do the
  // instruments trade in the same price regime?) and order totals
  // across order priorities (does priority correlate with basket
  // size? TPC-H says no — a designed negative). Exactness: q250's
  // doubled-midrank machinery on the GLOBAL (value-cent) grid —
  // 2·midrank = 2·prev + t + 1 from one domain-bounded running sum
  // (ChunkedFrame — value-band parallelism, no global sort task);
  // per-group 2R_g = Σ_v a_gv·(2·prev_v+t_v+1) is exact decimal
  // (HUGEINT oracle, per-factor widening). The closing uses the
  // DEVIATION form H = 3/(N(N+1))·Σ_g e_g²/n_g with
  // e_g = 2R_g − n_g(N+1) exact decimal — each group's term is ONE
  // IEEE expression quantized to 1e6 fixed point BEFORE the k-row
  // sum (the q230 cell discipline); the tie correction
  // 1 − Σ(t³−t)/(N³−N) and the α = 0.05 decision against the shared
  // χ²(0.95) literal table (StatTables, df = k−1, NULL past 40)
  // close in one mirrored sequence on the QUANTIZED h4. Scale
  // shape: one partial agg to (group, cent) grain, a vc-grain join,
  // k-row closing; 2 output rows. Grid-grain caveat (100× probe):
  // the EVENTS relation's cent grid is domain-bounded (tick prices),
  // but ORDER TOTALS are near-unique cents, so that relation's grid
  // is row-scale — the work stays LINEAR (partial agg + vc join +
  // chunk-banded running sums, 312 MB shuffle / zero spill /
  // maxTask 2.2 s at 100×, no global sort task), it just doesn't
  // collapse the way a bounded domain does.
  private def q263(s: SparkSession, dir: String): DataFrame = {
    val evObs = Tables.events(s, dir).filter(col("value").isNotNull)
      .select(lit("events.value~event_type").as("rel"),
        col("event_type").as("gk"),
        floor(col("value") * lit(100d) + lit(0.5d)).cast("long").as("vc"))
    val ordObs = Tables.orders(s, dir)
      .select(lit("orders.totalprice~priority").as("rel"),
        col("o_orderpriority").as("gk"),
        floor(col("o_totalprice") * lit(100d) + lit(0.5d)).cast("long").as("vc"))
    kruskalWallisFused(evObs.unionByName(ordObs))
  }

  /** Single-relation wrapper (spec/twin surface): identical output to
    * the fused form over one `rel`. */
  private[graft] def kruskalWallis(obs: DataFrame, rel: String): DataFrame =
    kruskalWallisFused(obs.select(lit(rel).as("rel"), col("gk"), col("vc")))

  /** Fused multi-relation KW over `obs(rel, gk, vc)` — round-16
    * optimization (guide §2.4: do fewer passes): the former
    * per-relation trees each paid the full partial-agg → grid →
    * running-sum → closing stage chain and the query unioned two of
    * them; keying every exchange by `rel` runs BOTH relations through
    * ONE chain (half the stages, same shuffled bytes in total).
    * Arithmetic is per-relation row-local throughout, so results are
    * bitwise identical (oracle unchanged — proof: 292/292 hash match
    * after the change). */
  private[graft] def kruskalWallisFused(obs: DataFrame): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val dd = (c: Column) => c.cast("double")
    val cells = obs.groupBy(col("rel"), col("gk"), col("vc"))
      .agg(count(lit(1)).as("a"))
    val tv = cells.groupBy(col("rel"), col("vc")).agg(sum(col("a")).as("t"))
    val cum = graft.operators.ChunkedFrame.withRunningSum(
      tv, "rel", expr("vc DIV 100"), Seq("vc"), "t", "ct")
      .withColumn("prev", col("ct") - col("t"))
    val ties = cum.groupBy(col("rel")).agg(
      sum(d38(col("t")) * d38(col("t")) * d38(col("t")) - d38(col("t")))
        .as("ties"))
    val per = cells
      .join(cum.select(col("rel"), col("vc"), col("t"), col("prev")),
        Seq("rel", "vc"))
      .groupBy(col("rel"), col("gk"))
      .agg(sum(col("a")).as("n"),
        sum(d38(col("a")) * d38(col("prev") * lit(2L) + col("t") + lit(1L)))
          .as("r2"))
    val glob = per.groupBy(col("rel"))
      .agg(count(lit(1)).as("k"), sum(col("n")).as("nn"))
    val eg = col("r2") - d38(col("n")) * d38(col("nn") + lit(1L))
    val term = dd(eg) * dd(eg) / dd(col("n"))
    val agg = per.join(broadcast(glob), Seq("rel"))
      .withColumn("tfp", floor(term * lit(1e6) + lit(0.5)).cast("decimal(38,0)"))
      .groupBy(col("rel").as("relation"))
      .agg(max(col("k")).as("k_groups"), max(col("nn")).as("n"),
        sum(col("tfp")).as("sfp"))
      .join(broadcast(ties.withColumnRenamed("rel", "relation")), Seq("relation"))
      .withColumn("df", col("k_groups") - lit(1L))
    val h = lit(3.0) * (dd(col("sfp")) / lit(1e6)) /
      (dd(col("n")) * (dd(col("n")) + lit(1.0)))
    val corr = lit(1.0) - dd(col("ties")) /
      (dd(col("n")) * dd(col("n")) * dd(col("n")) - dd(col("n")))
    val h4 = floor(h / corr * lit(1e4) + lit(0.5)).cast("long")
    agg.join(StatTables.chi2Frame(obs.sparkSession), Seq("df"), "left")
      .select(col("relation"), col("k_groups"), col("n"),
        when(col("n") > 1 && corr > 0, h4.cast("double") / lit(1e4)).as("h_r4"),
        when(col("n") > 1 && corr > 0 && col("q95x1e4").isNotNull,
          h4 > col("q95x1e4")).as("reject"))
  }

  // ---------------------------------------------------------------
  // q266 — FRIEDMAN TEST: across the days where EVERY instrument has
  // a close (complete blocks), do the instruments keep the same
  // within-day ORDERING of closes (Friedman 1937) — the blocked
  // companion to q263 (KW pools all rows; Friedman ranks WITHIN each
  // day, so a level difference between instruments doesn't mask a
  // day-by-day pattern). Exactness: doubled midranks within each
  // complete day (2·rank + ties − 1, the q251 windows — partitioned
  // per DAY over k rows, never a volume-sized sort); the
  // tie-corrected statistic is the pure ratio of two EXACT decimal
  // sums, Q = (k−1)·Σ_g (2R_g − n(k+1))² / Σ_ij (2r_ij − (k+1))²
  // (the doubling cancels — both sides carry the same ×4), closed by
  // ONE IEEE divide; the α = 0.05 decision tests the QUANTIZED q4
  // against the shared χ²(0.95) table at df = k−1. Scale shape: the
  // day grid is volume-independent after DailyCloses' one partial
  // agg (the q221 argument); rank windows are k-row per day; one
  // |types|-row closing. Output: 1 row.
  private def q266(s: SparkSession, dir: String): DataFrame =
    friedman(graft.operators.DailyCloses.closes(
      graft.operators.DailyCloses.state(Tables.events(s, dir))))

  // ---------------------------------------------------------------
  // q288 — KENDALL'S W (COEFFICIENT OF CONCORDANCE): HOW STRONGLY do
  // the instruments agree on their daily price ORDERING — the [0, 1]
  // effect-size companion to q266's Friedman decision (Kendall &
  // Babington Smith 1939): Friedman says "the rankings are not
  // exchangeable", W says how far toward perfect lockstep they sit
  // (the q290 significant-vs-big distinction, applied to the two-way
  // layout). One identity links them — Q = n(k−1)·W — so the engine
  // closes W from the SAME complete-block doubled-midrank aggregate
  // (exact decimal num0/den off the day-grid grid, ONE shared IEEE
  // sequence, one extra divide), quantized r6, with q266's χ² call
  // carried alongside as the significance gate. Scale shape: q266's
  // — day-grid blocks after DailyCloses' one partial agg. Output:
  // 1 row.
  private def q288(s: SparkSession, dir: String): DataFrame =
    kendallW(graft.operators.DailyCloses.closes(
      graft.operators.DailyCloses.state(Tables.events(s, dir))))

  /** The shared Friedman construction through its closing aggregate
    * (k_types, n_days, num0, den, df) — q266 closes it as the χ²
    * statistic, q288 re-expresses the SAME aggregate as Kendall's W
    * (the two are the one identity Q = n(k−1)·W; Kendall & Babington
    * Smith 1939). */
  private def friedmanAgg(cl: DataFrame): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val dd = (c: Column) => c.cast("double")
    val kk = cl.agg(countDistinct(col("event_type")).as("k"))
    val dayCnt = cl.groupBy(col("day")).agg(count(lit(1)).as("cnt"))
    // cnt > k is impossible on a day grid (≤ one row per (type, day));
    // a tick-grain feed trips it on the first busy day — loud grain
    // failure, not a silently-empty complete-block set (DayGrid rule)
    val complete = cl.join(dayCnt, Seq("day")).crossJoin(broadcast(kk))
      .filter(when(col("cnt") <= col("k"), col("cnt") === col("k"))
        .otherwise(raise_error(concat(lit("friedman: day "),
          col("day").cast("string"), lit(" has "), col("cnt").cast("string"),
          lit(" rows for "), col("k").cast("string"),
          lit(" instruments — input must be day-grid (one row per " +
            "(event_type, day)), not tick-grain"))).cast("boolean")))
    val wv = Window.partitionBy(col("day")).orderBy(col("close_lv"))
    val tw = Window.partitionBy(col("day"), col("close_lv"))
    val ranked = complete.withColumn("r2",
      lit(2L) * rank().over(wv) + count(lit(1)).over(tw) - lit(1L))
    val den = ranked.agg(
      sum(d38(col("r2") - col("k") - lit(1L)) *
        d38(col("r2") - col("k") - lit(1L))).as("den"))
    val per = ranked.groupBy(col("event_type"), col("k"))
      .agg(count(lit(1)).as("n"), sum(col("r2")).as("rs2"))
    val e2 = col("rs2") - d38(col("n")) * d38(col("k") + lit(1L))
    val agg = per
      .withColumn("sq", e2 * e2)
      .groupBy(lit(1).as("g"))
      .agg(max(col("k")).as("k_types"), max(col("n")).as("n_days"),
        sum(col("sq")).as("num0"))
      .crossJoin(broadcast(den))
      .withColumn("df", col("k_types") - lit(1L))
    agg
  }

  private[graft] def friedman(cl: DataFrame): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val dd = (c: Column) => c.cast("double")
    val agg = friedmanAgg(cl)
    val q = d38(col("k_types") - lit(1L)).cast("double") * dd(col("num0")) /
      dd(col("den"))
    val q4 = floor(q * lit(1e4) + lit(0.5)).cast("long")
    agg.join(StatTables.chi2Frame(cl.sparkSession), Seq("df"), "left")
      .select(col("k_types"), col("n_days"),
        when(col("den").isNotNull && dd(col("den")) > 0,
          q4.cast("double") / lit(1e4)).as("q_r4"),
        when(col("den").isNotNull && dd(col("den")) > 0 &&
          col("q95x1e4").isNotNull, q4 > col("q95x1e4")).as("reject"))
  }

  /** q288's closing: Kendall's coefficient of concordance W over the
    * SAME Friedman aggregate — W = Q/(n(k−1)) under the tie-general
    * Q, the [0, 1] agreement readout (0 = no agreement across days,
    * 1 = the instruments rank identically every day). The same raw
    * IEEE q sequence as [[friedman]], one extra divide, quantized r6;
    * the α = 0.05 call is by construction the SAME decision as q266's
    * (W > 0 "significant concordance" ⟺ Friedman rejects). */
  private[graft] def kendallW(cl: DataFrame): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val dd = (c: Column) => c.cast("double")
    val agg = friedmanAgg(cl)
    val q = d38(col("k_types") - lit(1L)).cast("double") * dd(col("num0")) /
      dd(col("den"))
    val q4 = floor(q * lit(1e4) + lit(0.5)).cast("long")
    val w = q / (dd(col("n_days")) * (dd(col("k_types")) - lit(1.0)))
    val w6 = floor(w * lit(1e6) + lit(0.5)).cast("long")
    val valid = col("den").isNotNull && dd(col("den")) > 0 &&
      col("n_days") > 0 && col("k_types") >= 2
    agg.join(StatTables.chi2Frame(cl.sparkSession), Seq("df"), "left")
      .select(col("k_types"), col("n_days"),
        when(valid, w6.cast("double") / lit(1e6)).as("w_r6"),
        when(valid && col("q95x1e4").isNotNull, q4 > col("q95x1e4"))
          .as("reject"))
  }

  // ---------------------------------------------------------------
  // q267 — COCHRAN'S Q: across the days where EVERY instrument has a
  // return (complete blocks), do the instruments share the same
  // up-day RATE (Cochran 1950) — the binary companion to q266
  // (Friedman ranks the magnitudes; Cochran's Q needs only the SIGN,
  // so a few huge days can't drag it) and the k-sample extension of
  // what q258 tests within one instrument. Exactness: the whole
  // statistic is exact integer arithmetic on day-grid counts —
  // Q = (k−1)·(k·ΣC_j² − (ΣC_j)²) / (k·ΣR_i − ΣR_i²) with C_j the
  // per-instrument up-count and R_i the per-day up-count, both
  // decimal-widened per factor (HUGEINT oracle); ONE IEEE divide,
  // the α = 0.05 decision on the QUANTIZED q4 against the shared
  // χ²(0.95) table at df = k−1. All-up/all-down days contribute
  // nothing to either sum and a degenerate denominator (every
  // complete day unanimous) yields NULL. Scale shape: the day grid
  // is volume-independent after DailyCloses' one partial agg; two
  // grid-grain aggregations, 1 output row.
  private def q267(s: SparkSession, dir: String): DataFrame =
    cochranQ(MarketQueries.dailyReturns(s, dir))

  private[graft] def cochranQ(rets: DataFrame): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val dd = (c: Column) => c.cast("double")
    val kk = rets.agg(countDistinct(col("event_type")).as("k"))
    val dayCnt = rets.groupBy(col("day")).agg(count(lit(1)).as("cnt"))
    // same loud grain guard as friedman: cnt > k ⇒ not a day grid
    val complete = rets.join(dayCnt, Seq("day")).crossJoin(broadcast(kk))
      .filter(when(col("cnt") <= col("k"), col("cnt") === col("k"))
        .otherwise(raise_error(concat(lit("cochranQ: day "),
          col("day").cast("string"), lit(" has "), col("cnt").cast("string"),
          lit(" rows for "), col("k").cast("string"),
          lit(" instruments — input must be day-grid (one row per " +
            "(event_type, day)), not tick-grain"))).cast("boolean")))
      .withColumn("up", when(col("r_fp") > 0, lit(1L)).otherwise(lit(0L)))
    val cj = complete.groupBy(col("event_type"), col("k"))
      .agg(sum(col("up")).as("c"), count(lit(1)).as("n"))
    val ri = complete.groupBy(col("day")).agg(sum(col("up")).as("r0"))
    val cAgg = cj.groupBy(lit(1).as("g"))
      .agg(max(col("k")).as("k_types"), max(col("n")).as("n_days"),
        sum(col("c")).as("sc"), sum(d38(col("c")) * d38(col("c"))).as("sc2"))
    val rAgg = ri.agg(sum(col("r0")).as("sr"),
      sum(d38(col("r0")) * d38(col("r0"))).as("sr2"))
    val agg = cAgg.crossJoin(broadcast(rAgg))
      .withColumn("df", col("k_types") - lit(1L))
    val num = d38(col("k_types") - lit(1L)) *
      (d38(col("k_types")) * col("sc2") - d38(col("sc")) * d38(col("sc")))
    val den = d38(col("k_types")) * d38(col("sr")) - col("sr2")
    val q4 = floor(dd(num) / dd(den) * lit(1e4) + lit(0.5)).cast("long")
    agg.join(StatTables.chi2Frame(rets.sparkSession), Seq("df"), "left")
      .select(col("k_types"), col("n_days"), col("sc").as("n_up"),
        when(dd(den) > 0, q4.cast("double") / lit(1e4)).as("q_r4"),
        when(dd(den) > 0 && col("q95x1e4").isNotNull,
          q4 > col("q95x1e4")).as("reject"))
  }

  // ---------------------------------------------------------------
  // q273 — BARTLETT VARIANCE-HOMOGENEITY TEST: do the event types
  // share ONE value variance (Bartlett 1937) — the dispersion
  // companion to q263 (KW compares locations; Bartlett compares
  // SPREADS — the ANOVA precondition every stats text checks first):
  // χ² = [(N−k)·ln(Sp²) − Σᵢ(nᵢ−1)·ln(Sᵢ²)] / C with
  // C = 1 + (Σᵢ 1/(nᵢ−1) − 1/(N−k)) / (3(k−1)), df = k−1.
  // Exactness: per-group variance numerators nᵢ·Σx² − (Σx)² are
  // EXACT decimals off cent-quantized values (every product widened
  // per factor — HUGEINT oracle); the three cross-group sums are
  // quantized BEFORE summing ((nᵢ−1)Sᵢ² to integer cents² — wq; the
  // ln terms to 1e-6 fixed point; the 1/(nᵢ−1) reciprocals to 1e-12)
  // so no float ever sums across groups; the closing
  // ((N−k)·ln(Sp²) − slt/1e6)/C is ONE shared IEEE sequence and the
  // α = 0.05 decision joins the shared χ²(0.95) literal table on the
  // DATA-DEPENDENT df = k−1 (integer compare of the QUANTIZED b₄,
  // NULL past df 40 — the q263/q265/q266 contract). A zero-variance
  // group NULLs the statistic (ln undefined — Bartlett requires
  // positive variances). Scale shape: ONE partial agg to group grain
  // (count + two power sums — map-side combine does almost all the
  // work), k-row closing. Output: 1 row.
  private def q273(s: SparkSession, dir: String): DataFrame = {
    val evObs = Tables.events(s, dir).filter(col("value").isNotNull)
      .select(col("event_type").as("gk"),
        floor(col("value") * lit(100d) + lit(0.5d)).cast("long").as("vc"))
    bartlett(evObs, "events.value~event_type")
  }

  /** floor(x + 0.5) on a decimal(38,0) carrier, bitwise ≡ the DuckDB
    * oracle's floor(x + 0.5)::HUGEINT for EVERY double x (round-15
    * advice: the previous HALF_UP double→decimal CAST diverges from
    * floor(x+0.5) when the IEEE add crosses an integer — frac(x)
    * within half an ulp below 0.5, or odd integer-valued doubles in
    * [2^52, 2^53) tying to even). Two regimes: below 2^52 the long
    * carrier of Spark's floor(double) is safe and the IEEE add+floor
    * is the oracle's own arithmetic; at/above 2^52 every double is
    * integral, so y = x + 0.5 (the SAME IEEE add both engines
    * perform, including the ties-to-even bump of odd integers in
    * [2^52, 2^53)) is itself integral and the double→decimal cast of
    * y is exact — no rounding left to disagree on. */
  private[graft] def floorHalf38(x: Column): Column = {
    val y = x + lit(0.5d)
    when(x < lit(4.503599627370496e15), floor(y).cast("decimal(38,0)"))
      .otherwise(y.cast("decimal(38,0)"))
  }

  private[graft] def bartlett(obs: DataFrame, rel: String): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val dd = (c: Column) => c.cast("double")
    val per = obs.groupBy(col("gk")).agg(count(lit(1)).as("ni"),
        sum(d38(col("vc"))).as("s1"),
        sum(d38(col("vc")) * d38(col("vc"))).as("s2"))
      .filter(col("ni") >= 2)
    val num = d38(col("ni")) * col("s2") - col("s1") * col("s1")
    val wi = dd(num) / dd(col("ni")) // (ni−1)·Si², exact-rational → IEEE
    val si2 = dd(num) / (dd(col("ni")) * (dd(col("ni")) - lit(1.0)))
    val g = per
      // wq's quantizer is floorHalf38 — the two-regime floor(wi+0.5)
      // on a decimal(38,0) carrier that is bitwise ≡ the oracle's
      // floor(x+0.5)::HUGEINT in every regime (wi — cents²·rows —
      // passes 2⁶³ in the 100 TB regime, so a bare long floor can't
      // carry it; the previous HALF_UP cast agreed with the oracle
      // only away from IEEE boundary cases — round-15 advice). lt
      // keeps the long floor: its magnitude bound (ni−1)·|ln si2|·1e6
      // stays inside long at any realistic grouping.
      .withColumn("wq", floorHalf38(wi))
      .withColumn("lt", when(si2 > 0,
        floor((dd(col("ni")) - lit(1.0)) * log(si2) * lit(1e6) + lit(0.5))
          .cast("decimal(38,0)")))
      .withColumn("iv",
        floor(lit(1e12) / (dd(col("ni")) - lit(1.0)) + lit(0.5)).cast("long"))
    val agg = g.groupBy(lit(rel).as("relation"))
      .agg(count(lit(1)).as("k_groups"), sum(col("ni")).as("n"),
        sum(col("wq")).as("sw"), sum(col("lt")).as("slt"),
        count(col("lt")).as("nlt"), sum(col("iv")).as("siv"))
      .withColumn("df", col("k_groups") - lit(1L))
    val nk = dd(col("n") - col("k_groups"))
    val sp2 = dd(col("sw")) / nk
    val chi2num = nk * log(sp2) - dd(col("slt")) / lit(1e6)
    val cc = lit(1.0) + (dd(col("siv")) / lit(1e12) - lit(1.0) / nk) /
      (lit(3.0) * (dd(col("k_groups")) - lit(1.0)))
    val valid = col("k_groups") >= 2 && col("nlt") === col("k_groups") &&
      dd(col("sw")) > 0
    val b4 = floor(chi2num / cc * lit(1e4) + lit(0.5)).cast("long")
    agg.join(StatTables.chi2Frame(obs.sparkSession), Seq("df"), "left")
      .select(col("relation"), col("k_groups"), col("n"),
        when(valid, b4.cast("double") / lit(1e4)).as("b_r4"),
        when(valid && col("q95x1e4").isNotNull, b4 > col("q95x1e4"))
          .as("reject"))
  }

  // ---------------------------------------------------------------
  // q279 — MOOD'S MEDIAN TEST: do the groups share ONE median — the
  // bluntest, most outlier-proof of the k-sample location tests
  // (Mood 1950; Brown & Mood 1951): dichotomize every observation at
  // the GLOBAL median and χ²-test the k×2 (group × above/not-above)
  // contingency table, df = k−1. The robustness complement to q263
  // (KW uses full ranks — more power; Mood survives arbitrary tail
  // corruption because only the side of the median enters). It is
  // also this battery's only k-sample test whose statistic needs NO
  // per-observation ranks — the whole table reads off the (gk, vc)
  // cell grid. Exactness: the global LOWER median is an exact order
  // statistic off the value grid's chunk-banded running counts (the
  // q248 discipline — min vc with cum ≥ (N+1) DIV 2); every count is
  // an exact integer; the χ² cell deviation D = a·N − nᵢ·C widens
  // per-factor to decimal (HUGEINT oracle), and each group's two-cell
  // term closes in ONE shared IEEE sequence ((D/N)²/E per cell)
  // quantized to 1e-6 BEFORE the k-row sum — no float ever sums
  // across groups (the q273 rule); the final χ²·1e4 is the pure
  // integer (s6 + 50) DIV 100, decided against the shared χ²(0.95)
  // literal table on the data-dependent df = k−1 (NULL past df 40).
  // Degenerate parity: grouping BY the literal relation on both
  // engines, so an empty feed emits zero rows (the q273 lesson,
  // baked in). Scale shape: ONE volume-sized partial agg to the
  // (gk, vc) cell grid; everything after is grid-bounded (the value
  // grid rides ChunkedFrame — no global single-partition window).
  // Output: 1 row per relation × 2 relations.
  private def q279(s: SparkSession, dir: String): DataFrame = {
    val evObs = Tables.events(s, dir).filter(col("value").isNotNull)
      .select(lit("events.value~event_type").as("rel"),
        col("event_type").as("gk"),
        floor(col("value") * lit(100d) + lit(0.5d)).cast("long").as("vc"))
    val ordObs = Tables.orders(s, dir)
      .select(lit("orders.totalprice~priority").as("rel"),
        col("o_orderpriority").as("gk"),
        floor(col("o_totalprice") * lit(100d) + lit(0.5d)).cast("long").as("vc"))
    moodMedianFused(evObs.unionByName(ordObs))
  }

  /** Single-relation wrapper (spec/twin surface): identical output to
    * the fused form over one `rel`. */
  private[graft] def moodMedian(obs: DataFrame, rel: String): DataFrame =
    moodMedianFused(obs.select(lit(rel).as("rel"), col("gk"), col("vc")))

  /** Fused multi-relation Mood over `obs(rel, gk, vc)` — the q263
    * round-16 move (guide §2.4): one rel-keyed chain instead of one
    * full chain per relation; per-relation arithmetic unchanged, so
    * bitwise-identical output. */
  private[graft] def moodMedianFused(obs: DataFrame): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val dd = (c: Column) => c.cast("double")
    val cells = obs.groupBy(col("rel"), col("gk"), col("vc"))
      .agg(count(lit(1)).as("a"))
    val tv = cells.groupBy(col("rel"), col("vc")).agg(sum(col("a")).as("t"))
    val cum = graft.operators.ChunkedFrame.withRunningSum(
      tv, "rel", expr("vc DIV 100"), Seq("vc"), "t", "ct")
    val tot = tv.groupBy(col("rel")).agg(sum(col("t")).as("nn"))
    // lower median = min vc with cum ≥ (N+1) DIV 2 — integer DIV on
    // both engines, no float position arithmetic
    val med = cum.join(broadcast(tot), Seq("rel"))
      .filter(expr("ct >= (nn + 1) DIV 2"))
      .groupBy(col("rel")).agg(min(col("vc")).as("med"))
    val per = cells.join(broadcast(med), Seq("rel"))
      .groupBy(col("rel"), col("gk")).agg(sum(col("a")).as("ni"),
        sum(when(col("vc") > col("med"), col("a")).otherwise(lit(0L))).as("ai"))
    val glob = per.groupBy(col("rel"))
      .agg(count(lit(1)).as("k_groups"), sum(col("ni")).as("n"),
        sum(col("ai")).as("c1"))
    val j = per.join(broadcast(glob), Seq("rel"))
      .withColumn("bi", col("ni") - col("ai"))
      .withColumn("c2", col("n") - col("c1"))
      .withColumn("da", d38(col("ai")) * d38(col("n")) - d38(col("ni")) * d38(col("c1")))
      .withColumn("db", d38(col("bi")) * d38(col("n")) - d38(col("ni")) * d38(col("c2")))
    // per-group two-cell term, ONE shared IEEE sequence, quantized
    // to 1e-6 fixed point BEFORE the cross-group sum
    val term = (dd(col("da")) / dd(col("n"))) * (dd(col("da")) / dd(col("n"))) /
      (dd(col("ni")) * dd(col("c1")) / dd(col("n"))) +
      (dd(col("db")) / dd(col("n"))) * (dd(col("db")) / dd(col("n"))) /
        (dd(col("ni")) * dd(col("c2")) / dd(col("n")))
    val g = j.withColumn("t6", when(col("c1") > 0 && col("c2") > 0,
      floor(term * lit(1e6) + lit(0.5)).cast("decimal(38,0)")))
    val agg = g.groupBy(col("rel").as("relation"))
      .agg(max(col("k_groups")).as("k_groups"), max(col("n")).as("n"),
        max(col("c1")).as("n_above"), sum(col("t6")).as("s6"),
        count(col("t6")).as("nt"))
      .withColumn("df", col("k_groups") - lit(1L))
    // (s6 + 50) DIV 100 runs on the decimal(38,0) carrier — Spark's
    // IntegralDivide divides in decimal and only the QUOTIENT lands
    // in long, mirroring the oracle's HUGEINT // then ::BIGINT order
    // (round-15 advice: casting s6 first gave 100× less headroom).
    val q4 = expr("(s6 + 50) DIV 100")
    val valid = col("k_groups") >= 2 && col("nt") === col("k_groups")
    agg.join(StatTables.chi2Frame(obs.sparkSession), Seq("df"), "left")
      .select(col("relation"), col("k_groups"), col("n"), col("n_above"),
        when(valid, q4.cast("double") / lit(1e4)).as("chi2_r4"),
        when(valid && col("q95x1e4").isNotNull, q4 > col("q95x1e4"))
          .as("reject"))
  }

  // ---------------------------------------------------------------
  // q280 — BROWN-FORSYTHE (median-centered Levene) SPREAD TEST: the
  // ROBUST companion to q273 — Bartlett's χ² is exquisitely sensitive
  // to non-normal tails (its own α blows up under kurtosis), so every
  // stats text pairs it with Levene's F on absolute deviations, in
  // the Brown & Forsythe (1974) median-centered form that keeps the
  // size honest under skew. Construction: per-group LOWER MEDIAN
  // (exact order statistic off the per-group value grid's
  // chunk-banded running counts — the q248/q279 discipline), then
  // z = |vc − med_g| is an EXACT integer and the one-way ANOVA on z
  // closes from exact power sums: between = Σ_g (D_g/N)²/n_g with
  // D_g = N·S_g − n_g·S (the q279 per-factor-widened deviation,
  // (D/N)² in IEEE to keep the square inside double range), within =
  // Σ_g (n_g·Q_g − S_g²)/n_g — BOTH quantized per group to 1e-6
  // BEFORE their cross-group sums (the q273 rule). Decision: as
  // N → ∞, (k−1)·F(k−1, N−k) → χ²(k−1), so the α = 0.05 call tests
  // the quantized (k−1)·W against the SAME shared χ²(0.95) literal
  // table on df = k−1 (documented asymptote — at this battery's N
  // the F and χ² boundaries agree to 3 decimals; NULL past df 40).
  // Scale shape: ONE volume-sized partial agg to the (gk, vc) cell
  // grid; medians, sums, and the k-row closing are all grid-bounded.
  // Output: 1 row per relation × 2 relations.
  private def q280(s: SparkSession, dir: String): DataFrame = {
    val evObs = Tables.events(s, dir).filter(col("value").isNotNull)
      .select(lit("events.value~event_type").as("rel"),
        col("event_type").as("gk"),
        floor(col("value") * lit(100d) + lit(0.5d)).cast("long").as("vc"))
    val ordObs = Tables.orders(s, dir)
      .select(lit("orders.totalprice~priority").as("rel"),
        col("o_orderpriority").as("gk"),
        floor(col("o_totalprice") * lit(100d) + lit(0.5d)).cast("long").as("vc"))
    brownForsytheFused(evObs.unionByName(ordObs))
  }

  /** Single-relation wrapper (spec/twin surface): identical output to
    * the fused form over one `rel`. */
  private[graft] def brownForsythe(obs: DataFrame, rel: String): DataFrame =
    brownForsytheFused(obs.select(lit(rel).as("rel"), col("gk"), col("vc")))

  /** Fused multi-relation Brown-Forsythe over `obs(rel, gk, vc)` —
    * the q263 round-16 move (guide §2.4). The per-group median pass
    * keys its running counts by the COMPOSITE (rel, gk) via
    * [[graft.operators.ChunkedFrame.withRunningSumsKeys]]; per-
    * relation arithmetic unchanged, bitwise-identical output. */
  private[graft] def brownForsytheFused(obs: DataFrame): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val dd = (c: Column) => c.cast("double")
    val cells = obs.groupBy(col("rel"), col("gk"), col("vc"))
      .agg(count(lit(1)).as("a"))
    // per-group lower median off chunk-banded running counts
    val cum = graft.operators.ChunkedFrame.withRunningSumsKeys(
      cells, Seq("rel", "gk"), expr("vc DIV 100"), Seq("vc"),
      Seq("a" -> "ct"))
    val nPer = cells.groupBy(col("rel"), col("gk")).agg(sum(col("a")).as("ng"))
    val med = cum.join(broadcast(nPer), Seq("rel", "gk"))
      .filter(expr("ct >= (ng + 1) DIV 2"))
      .groupBy(col("rel"), col("gk")).agg(min(col("vc")).as("med"))
    // exact |deviation| power sums, still on the CELL grid
    val per = cells.join(broadcast(med), Seq("rel", "gk"))
      .withColumn("z", abs(col("vc") - col("med")))
      .groupBy(col("rel"), col("gk")).agg(sum(col("a")).as("ni"),
        sum(d38(col("a")) * d38(col("z"))).as("s1"),
        sum(d38(col("a")) * d38(col("z")) * d38(col("z"))).as("q1"))
    val glob = per.groupBy(col("rel"))
      .agg(count(lit(1)).as("k_groups"), sum(col("ni")).as("n"),
        sum(col("s1")).as("s"))
    val j = per.join(broadcast(glob), Seq("rel"))
      .withColumn("dg", d38(col("n")) * col("s1") - d38(col("ni")) * col("s"))
      // between term (D/N)²/n_g and within term (n_g·Q−S²)/n_g, each
      // ONE shared IEEE sequence quantized to 1e-6 before the k-sum.
      // The quantizer is floorHalf38 — floor(x+0.5) on a decimal
      // carrier (these cents²-scaled terms pass 2⁶³ at sf0.01
      // already, wt·1e6 ≈ 1.5e23 for orders, so a bare long floor
      // can't carry them), bitwise ≡ the oracle's
      // floor(x+0.5)::HUGEINT in every IEEE regime (round-15 advice
      // replaced the boundary-divergent HALF_UP cast).
      .withColumn("bt6", floorHalf38((dd(col("dg")) / dd(col("n"))) *
        (dd(col("dg")) / dd(col("n"))) / dd(col("ni")) * lit(1e6)))
      .withColumn("wt6", floorHalf38(
        dd(d38(col("ni")) * col("q1") - col("s1") * col("s1")) /
          dd(col("ni")) * lit(1e6)))
    val agg = j.groupBy(col("rel").as("relation"))
      .agg(max(col("k_groups")).as("k_groups"), max(col("n")).as("n"),
        sum(col("bt6")).as("b6"), sum(col("wt6")).as("w6"))
      .withColumn("df", col("k_groups") - lit(1L))
    // W = ((N−k)/(k−1)) · between/within; the α call tests the
    // quantized (k−1)·W = (N−k)·between/within against χ²(k−1)
    val w = (dd(col("n")) - dd(col("k_groups"))) / (dd(col("k_groups")) - lit(1.0)) *
      (dd(col("b6")) / dd(col("w6")))
    val kw4 = floor((dd(col("n")) - dd(col("k_groups"))) *
      (dd(col("b6")) / dd(col("w6"))) * lit(1e4) + lit(0.5)).cast("long")
    val valid = col("k_groups") >= 2 && dd(col("w6")) > 0 &&
      col("n") > col("k_groups")
    agg.join(StatTables.chi2Frame(obs.sparkSession), Seq("df"), "left")
      .select(col("relation"), col("k_groups"), col("n"),
        when(valid, r4(w)).as("w_r4"),
        when(valid && col("q95x1e4").isNotNull, kw4 > col("q95x1e4"))
          .as("reject"))
  }

  // ---------------------------------------------------------------
  // q285 — JONCKHEERE-TERPSTRA ORDERED-TREND TEST: does the value
  // distribution shift MONOTONICALLY across ORDERED groups — the
  // question q263/q279 cannot ask (they test "any difference"; JT
  // tests "difference in the stated order", with far more power when
  // the order is real — Terpstra 1952, Jonckheere 1954). Here: does
  // order value trend across the five TPC-H priorities 1-URGENT →
  // 5-LOW (a FIXED five-slot domain, so the group unroll is plan-
  // time constant — the q197 Shapley fixed-coalition precedent).
  // Construction: J* = Σ_{i<j} [#(xᵢ<yⱼ) + ½#(xᵢ=yⱼ)] collapses
  // EXACTLY onto the global value grid — per value v with per-group
  // cell counts c_j and exclusive below-counts B_j, 4J* accumulates
  // 4·Σ_j c_j·(B₁+…+B_{j−1}) + (t² − Σc²) per grid row (the tie term
  // is 2·Σ_{i<j}c_ic_j — always even), so 4J* is an EXACT decimal
  // with NO pair enumeration (the q283/q271 grid-identity move); the
  // per-group below-counts ride ONE fused chunk-banded running-sums
  // pass (ChunkedFrame.withRunningSums — the q268 API). The normal
  // approximation uses the FULL tie-corrected variance (Hollander &
  // Wolfe): three terms from exact integer tie/group cubics (decimal
  // / HUGEINT; the cross product fn3·ft3 would pass 10³⁸, so the two
  // exact factors close in IEEE), z = (4J* − (N²−Σn²)) / (4σ), and
  // the α = 0.05 ONE-SIDED calls test the quantized z₄ against
  // ±16449 in each direction. Scale shape: ONE volume-sized partial
  // agg to (gi, vc) cells; grid-bounded running sums; two k-row/
  // grid-grain closings. Output: 1 row.
  private def q285(s: SparkSession, dir: String): DataFrame = {
    val obs = Tables.orders(s, dir).select(
      substring(col("o_orderpriority"), 1, 1).cast("int").as("gi"),
      floor(col("o_totalprice") * lit(100d) + lit(0.5d)).cast("long").as("vc"))
    jonckheere(obs, "orders.totalprice~priority_order", 5)
  }

  /** JT over `obs(gi, vc)` with group indexes 1..k known at plan
    * time (fixed-domain unroll). */
  private[graft] def jonckheere(obs: DataFrame, rel: String, k: Int): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val dd = (c: Column) => c.cast("double")
    val cells = obs.groupBy(col("gi"), col("vc")).agg(count(lit(1)).as("a"))
    val gridCols = (1 to k).map(i =>
      sum(when(col("gi") === i, col("a")).otherwise(lit(0L))).as(s"c$i")) :+
      sum(col("a")).as("t")
    val grid = cells.groupBy(col("vc"))
      .agg(gridCols.head, gridCols.tail: _*)
      .withColumn("g", lit(1))
    val cum = graft.operators.ChunkedFrame.withRunningSums(
      grid, "g", expr("vc DIV 100"), Seq("vc"),
      (1 to k).map(i => s"c$i" -> s"ct$i"))
    val pre = (2 to k).map { j =>
      val below = (1 until j).map(i => col(s"ct$i") - col(s"c$i")).reduce(_ + _)
      d38(col(s"c$j")) * d38(below)
    }.reduce(_ + _)
    val eq2 = d38(col("t")) * d38(col("t")) -
      (1 to k).map(i => d38(col(s"c$i")) * d38(col(s"c$i"))).reduce(_ + _)
    val withJ = cum
      .withColumn("j4v", lit(4).cast("decimal(38,0)") * pre + eq2)
      .withColumn("t21",
        d38(col("t")) * d38(col("t") - 1) * d38(lit(2) * col("t") + 5))
      .withColumn("t3", d38(col("t")) * d38(col("t") - 1) * d38(col("t") - 2))
      .withColumn("t2", d38(col("t")) * d38(col("t") - 1))
    val gridAgg = withJ.groupBy(lit(rel).as("relation"))
      .agg(sum(col("j4v")).as("j4"), sum(col("t21")).as("ft21"),
        sum(col("t3")).as("ft3"), sum(col("t2")).as("ft2"))
    val per = cells.groupBy(col("gi")).agg(sum(col("a")).as("ni"))
    val gAgg = per.groupBy(lit(rel).as("relation"))
      .agg(count(lit(1)).as("k_groups"), sum(col("ni")).as("n"),
        sum(d38(col("ni")) * d38(col("ni"))).as("sn2"),
        sum(d38(col("ni")) * d38(col("ni") - 1) * d38(lit(2) * col("ni") + 5))
          .as("fn21"),
        sum(d38(col("ni")) * d38(col("ni") - 1) * d38(col("ni") - 2)).as("fn3"),
        sum(d38(col("ni")) * d38(col("ni") - 1)).as("fn2"))
    val jn = gridAgg.join(gAgg, Seq("relation"))
    val nD = dd(col("n"))
    val aT = d38(col("n")) * d38(col("n") - 1) * d38(lit(2) * col("n") + 5) -
      col("fn21") - col("ft21")
    val varJ = dd(aT) / lit(72.0) +
      dd(col("fn3")) * dd(col("ft3")) /
        (lit(36.0) * nD * (nD - lit(1.0)) * (nD - lit(2.0))) +
      dd(col("fn2")) * dd(col("ft2")) / (lit(8.0) * nD * (nD - lit(1.0)))
    val mu4 = d38(col("n")) * d38(col("n")) - col("sn2")
    val z = (dd(col("j4")) - dd(mu4)) / (lit(4.0) * sqrt(varJ))
    val z4c = floor(z * lit(1e4) + lit(0.5)).cast("long")
    val valid = col("k_groups") >= 2 && col("n") >= 3 && varJ > 0
    jn.select(col("relation"), col("k_groups"), col("n"),
      when(valid, z4c.cast("double") / lit(1e4)).as("z_r4"),
      when(valid, z4c > lit(16449L)).as("inc_trend"),
      when(valid, z4c < lit(-16449L)).as("dec_trend"))
  }

  // ---------------------------------------------------------------
  // q286 — ANSARI-BRADLEY SCALE DRIFT TEST: did each event_type's
  // late half become more (or less) DISPERSED than its early half —
  // the rank-based two-sample SCALE companion to q250's location
  // test (Ansari & Bradley 1960; the same early/late split, the same
  // grid). A location shift says "the metric moved"; a scale shift
  // says "the metric got noisier" — variance drift that q250 cannot
  // see (its U statistic is location-only) and Levene-style tests
  // only ask k-sample-wise (q280). Construction: rank the pooled
  // sample from BOTH ends (score = min(rank, N+1−rank)); tied
  // observations take the AVERAGE of the scores their rank range
  // covers (Hollander & Wolfe). DOUBLED score-range sums stay exact:
  // with h = (N+1) DIV 2, 2·S(x) = Σ_{r≤x} 2·min(r, N+1−r) is the
  // closed form x(x+1) below h and 2h(h+1) + 2(x−h)(N+1) − x(x+1)
  // above it — pure integers off the grid's chunk-banded running
  // counts, so each tie group's doubled score-range sum num2_v =
  // 2S(hi) − 2S(prev) is exact decimal. The per-row terms
  // a_v·num2_v/t_v (sample-1 score mass) and num2_v²/t_v (the score
  // power sum the conditional variance needs) are rationals with
  // per-row denominators, so each closes in ONE shared IEEE sequence
  // quantized to 1e-6 via floorHalf38 BEFORE the cross-row sum (the
  // q273 rule; Σnum2_v = 2·ΣA needs no quantizer — it is exact).
  // Close: E[AB] = n1·ΣA/N, Var[AB] = n1n2(N·ΣA² − (ΣA)²)/(N²(N−1))
  // (the permutation-conditional moments over the realized scores —
  // exact under ties), z two-sided at the quantized |z₄| > 19600.
  // Decimal headroom: the worst single-row num2²/t·1e6 is
  // t·(N+1)²·1e6 ≤ N³·1e6 — inside decimal(38) to N ≈ 2×10¹⁰ per
  // type; the dispersed-grid regime (t_v ≪ N) stays orders below
  // (the q285 fn3·ft3 headroom note's discipline). Scale shape:
  // q250's — one volume-sized partial agg to the (type, cents) grid,
  // chunk-banded running counts, |types| output rows.
  private def q286(s: SparkSession, dir: String): DataFrame =
    ansariBradley(Tables.events(s, dir)
      .select(col("event_type"), to_date(col("ts")).as("day"), col("value")))

  private[graft] def ansariBradley(e: DataFrame): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val dd = (c: Column) => c.cast("double")
    val bounds = e.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val vals = e.crossJoin(broadcast(bounds))
      .withColumn("late",
        datediff(col("day"), col("d0")) >= expr("(datediff(d1, d0) + 1) DIV 2"))
      .filter(col("value").isNotNull)
      .withColumn("vc", floor(col("value") * lit(100d) + lit(0.5d)).cast("long"))
      .groupBy(col("event_type"), col("vc"))
      .agg(count(when(!col("late"), lit(1))).as("a"),
        count(when(col("late"), lit(1))).as("b"))
      .withColumn("t", col("a") + col("b"))
    val cum = graft.operators.ChunkedFrame.withRunningSum(
      vals, "event_type", expr("vc DIV 100"), Seq("vc"), "t", "ct")
    val nPer = vals.groupBy(col("event_type"))
      .agg((sum(col("t"))).as("nn"), sum(col("a")).as("n1"),
        sum(col("b")).as("n2"), count(lit(1)).as("n_cells"))
    // doubled both-ends score-range prefix 2S(x) at h = (N+1) DIV 2
    def s2(x: Column, nn: Column, h: Column): Column =
      when(x <= h, d38(x) * d38(x + lit(1L)))
        .otherwise(lit(2L).cast("decimal(38,0)") * d38(h) * d38(h + lit(1L)) +
          lit(2L).cast("decimal(38,0)") * d38(x - h) * d38(nn + lit(1L)) -
          d38(x) * d38(x + lit(1L)))
    val rows = cum.join(broadcast(nPer), Seq("event_type"))
      .withColumn("h", expr("(nn + 1) DIV 2"))
      .withColumn("num2",
        s2(col("ct"), col("nn"), col("h")) -
          s2(col("ct") - col("t"), col("nn"), col("h")))
      // per-row rational terms: ONE IEEE sequence each, 1e-6 fixed
      // point via the two-regime floor(x+0.5) quantizer
      .withColumn("ab6", floorHalf38(
        dd(col("a")) * dd(col("num2")) / dd(col("t")) * lit(1e6)))
      .withColumn("sq6", floorHalf38(
        dd(col("num2")) * dd(col("num2")) / dd(col("t")) * lit(1e6)))
    val per = rows.groupBy(col("event_type"))
      .agg(max(col("n1")).as("n1"), max(col("n2")).as("n2"),
        max(col("nn")).as("nn"), max(col("n_cells")).as("n_cells"),
        sum(col("num2")).as("sn2"), sum(col("ab6")).as("sab6"),
        sum(col("sq6")).as("ssq6"))
    // AB = sab6/2e6; ΣA = sn2/2; ΣA² = ssq6/4e6 (doubled-score scale)
    val nD = dd(col("nn"))
    val ab = dd(col("sab6")) / lit(2e6)
    val sa = dd(col("sn2")) / lit(2.0)
    val sa2 = dd(col("ssq6")) / lit(4e6)
    val vr = dd(col("n1")) * dd(col("n2")) * (nD * sa2 - sa * sa) /
      (nD * nD * (nD - lit(1.0)))
    val z = (ab - dd(col("n1")) * sa / nD) / sqrt(vr)
    val z4 = floor(z * lit(1e4) + lit(0.5)).cast("long")
    val valid = col("n1") > 0 && col("n2") > 0 && col("n_cells") >= 2 && vr > 0
    per.select(col("event_type"), col("n1").as("n_early"), col("n2").as("n_late"),
      when(valid, floorHalf38(ab * lit(1e4)).cast("double") /
        lit(1e4)).as("ab_r4"),
      when(valid, z4.cast("double") / lit(1e4)).as("z_r4"),
      when(valid, abs(z4) > 19600L).as("reject"))
  }

  // ---------------------------------------------------------------
  // q287 — DUNN'S POST-HOC PAIRWISE TEST: WHICH groups differ, once
  // an omnibus k-sample screen (q263 KW / q279 Mood) has said "some
  // do" — the standard rank-based follow-up (Dunn 1964): for every
  // pair (i, j), z = (R̄ᵢ − R̄ⱼ) / σᵢⱼ with the GLOBAL midranks the
  // omnibus already used and σᵢⱼ² = (N(N+1)/12 − ΣT/(12(N−1)))·
  // (1/nᵢ + 1/nⱼ) (tie-corrected), each |z| tested at the
  // Bonferroni-corrected two-sided level 0.05/m, m = k(k−1)/2.
  // The critical value depends on the DATA (m) — the same reason the
  // χ² table exists — so both engines join the shared 45-row
  // Φ⁻¹(1−0.025/m)·1e4 literal (StatTables.ZBonf975x1e4; NULL past
  // m = 45, where familywise control should yield to FDR).
  // Exactness: doubled midranks keep every rank sum an exact decimal
  // off the global value grid's chunk-banded running counts (2R̄ᵢ =
  // r2sᵢ/nᵢ with r2s = Σ aᵥ(2·prevᵥ + tᵥ + 1) — the q250/q263
  // machinery); the tie sum Σ(t³−t) is exact decimal; each pair's z
  // closes in ONE shared IEEE sequence and the decision compares the
  // QUANTIZED |z₄| against the integer table entry. Scale shape: ONE
  // volume-sized partial agg to the (gk, vc) cell grid; the pairwise
  // self-join is k-row × k-row (dim-sized). Output: k(k−1)/2 rows
  // per relation × 2 relations.
  private def q287(s: SparkSession, dir: String): DataFrame = {
    val evObs = Tables.events(s, dir).filter(col("value").isNotNull)
      .select(lit("events.value~event_type").as("rel"),
        col("event_type").as("gk"),
        floor(col("value") * lit(100d) + lit(0.5d)).cast("long").as("vc"))
    val ordObs = Tables.orders(s, dir)
      .select(lit("orders.totalprice~priority").as("rel"),
        col("o_orderpriority").as("gk"),
        floor(col("o_totalprice") * lit(100d) + lit(0.5d)).cast("long").as("vc"))
    dunnFused(evObs.unionByName(ordObs))
  }

  /** Single-relation wrapper (spec surface): identical output to the
    * fused form over one `rel`. */
  private[graft] def dunn(obs: DataFrame, rel: String): DataFrame =
    dunnFused(obs.select(lit(rel).as("rel"), col("gk"), col("vc")))

  /** Fused multi-relation Dunn over `obs(rel, gk, vc)` — the q263
    * round-16 move (guide §2.4): one rel-keyed grid chain; the
    * pairwise expansion stays dim-sized per relation (join on `rel`,
    * a < b). Per-relation arithmetic unchanged, bitwise-identical
    * output. */
  private[graft] def dunnFused(obs: DataFrame): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val dd = (c: Column) => c.cast("double")
    val cells = obs.groupBy(col("rel"), col("gk"), col("vc"))
      .agg(count(lit(1)).as("a"))
    val tv = cells.groupBy(col("rel"), col("vc")).agg(sum(col("a")).as("t"))
    val cum = graft.operators.ChunkedFrame.withRunningSum(
      tv, "rel", expr("vc DIV 100"), Seq("vc"), "t", "ct")
    val per = cells
      .join(cum.select(col("rel"), col("vc"), col("t"),
        (col("ct") - col("t")).as("prev")), Seq("rel", "vc"))
      .groupBy(col("rel"), col("gk"))
      .agg(sum(col("a")).as("ni"),
        sum(d38(col("a")) * d38(col("prev") * lit(2L) + col("t") + lit(1L)))
          .as("r2s"))
    val glob = cum.groupBy(col("rel"))
      .agg(sum(col("t")).as("n"),
        sum(d38(col("t")) * d38(col("t")) * d38(col("t")) - d38(col("t")))
          .as("tt"))
    // Round-17 (guide §2.4 / VERDICT Next #5): the closing used to
    // self-join `per` on rel (two exchange arms + a join) and then
    // join a SEPARATE per-rel count aggregate — three grid-bounded
    // passes over the same k-row-per-rel table. One collect_list per
    // rel carries the whole group vector; the k×k pair expansion and
    // k_groups = size(gs) fall out of the SAME row (the bucketPairs
    // idiom; k ≤ tens, so the per-row expansion is trivially small).
    // Pair set, per-pair values, and every downstream IEEE sequence
    // are unchanged — only the plan shape.
    val byRel = per.groupBy(col("rel"))
      .agg(collect_list(struct(col("gk"), col("ni"), col("r2s"))).as("gs"))
    val pairs = byRel
      .select(col("rel"), size(col("gs")).cast("long").as("k_groups"),
        explode(expr(
          "flatten(transform(gs, a -> transform(filter(gs, b -> b.gk > a.gk), " +
            "b -> struct(a.gk AS type_a, b.gk AS type_b, a.ni AS na, " +
            "a.r2s AS ra, b.ni AS nb, b.r2s AS rb))))")).as("p"))
      .select(col("rel"), col("k_groups"), col("p.type_a").as("type_a"),
        col("p.type_b").as("type_b"), col("p.na").as("na"), col("p.ra").as("ra"),
        col("p.nb").as("nb"), col("p.rb").as("rb"))
      .join(broadcast(glob), Seq("rel"))
      .withColumn("m", expr("k_groups * (k_groups - 1) DIV 2"))
    val nD = dd(col("n"))
    val sig2 = (nD * (nD + lit(1.0)) / lit(12.0) -
      dd(col("tt")) / (lit(12.0) * (nD - lit(1.0)))) *
      (lit(1.0) / dd(col("na")) + lit(1.0) / dd(col("nb")))
    val diff = dd(col("ra")) / (lit(2.0) * dd(col("na"))) -
      dd(col("rb")) / (lit(2.0) * dd(col("nb")))
    val z = diff / sqrt(sig2)
    val z4 = floor(z * lit(1e4) + lit(0.5)).cast("long")
    val valid = col("n") > 1 && sig2 > 0
    pairs.join(StatTables.zbonfFrame(obs.sparkSession), Seq("m"), "left")
      .select(col("rel").as("relation"), col("type_a"), col("type_b"),
        col("na").as("n_a"), col("nb").as("n_b"),
        when(valid, z4.cast("double") / lit(1e4)).as("z_r4"),
        when(valid && col("zcrit4").isNotNull, abs(z4) > col("zcrit4"))
          .as("reject"))
  }

  // ---------------------------------------------------------------
  // q291 — PAGE'S L ORDERED-ALTERNATIVE TREND TEST (two-way layout):
  // does daily revenue trend MONOTONICALLY across the five order
  // priorities — the Friedman-layout sibling of q285's Jonckheere
  // (Page 1963): q266 asks "do the treatments differ at all" across
  // blocks; Page's L = Σⱼ j·Rⱼ asks "do they differ IN THE STATED
  // ORDER", with far more power when the order is real. Blocks are
  // order DAYS, treatments the fixed priority slots 1-URGENT…5-LOW,
  // the block value each (day, priority)'s exact revenue-cents sum;
  // only complete blocks (all five priorities traded) enter — the
  // q266 complete-block rule. Exactness: within-block doubled
  // midranks keep every rank sum exact (2L = Σⱼ j·R2ⱼ, decimal-
  // widened per factor); E[2L] = n·k(k+1)²/2 and Var[L] =
  // n·k²(k+1)(k²−1)/144 are the textbook no-tie null moments
  // (midranks + the unadjusted variance is the standard practice —
  // revenue-cents ties across priorities within one day are
  // measure-zero and identical on both engines either way), both
  // closed from exactly-representable integer factors; z closes in
  // ONE IEEE sequence and the one-sided α = 0.05 calls test the
  // QUANTIZED z₄ against ±16449 in both directions (the q285
  // convention). An empty complete-block set emits ZERO rows on both
  // engines (literal-relation GROUP BY). Scale shape: ONE partial
  // agg to the (day, priority) grid — day-grain, volume-independent
  // after it; the rank window partitions per day over 5 rows.
  // Output: 1 row.
  private def q291(s: SparkSession, dir: String): DataFrame = {
    val blocks = Tables.orders(s, dir)
      .select(col("o_orderdate").as("day"),
        substring(col("o_orderpriority"), 1, 1).cast("int").as("gi"),
        floor(col("o_totalprice") * lit(100d) + lit(0.5d)).cast("long").as("vc"))
      .groupBy(col("day"), col("gi"))
      .agg(sum(col("vc")).as("rev"))
    pageTrend(blocks, 5, "orders.revenue~priority_order")
  }

  /** Page's L over complete blocks of `(day, gi, rev)` with the k
    * treatment slots 1..k known at plan time. */
  private[graft] def pageTrend(blocks: DataFrame, k: Int,
                               rel: String): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val dd = (c: Column) => c.cast("double")
    val dc = blocks.groupBy(col("day")).agg(count(lit(1)).as("cnt"))
    val complete = blocks.join(dc, Seq("day")).filter(col("cnt") === k)
    val wv = Window.partitionBy(col("day")).orderBy(col("rev"))
    val tw = Window.partitionBy(col("day"), col("rev"))
    val ranked = complete.withColumn("r2",
      lit(2L) * rank().over(wv) + count(lit(1)).over(tw) - lit(1L))
    val per = ranked.groupBy(col("gi"))
      .agg(count(lit(1)).as("n"), sum(col("r2")).as("rs2"))
    val agg = per.groupBy(lit(rel).as("relation"))
      .agg(max(col("n")).as("n_days"), count(lit(1)).as("k_eff"),
        sum(d38(col("gi")) * d38(col("rs2"))).as("l2"))
    val nD = dd(col("n_days"))
    val kD = lit(k.toDouble)
    val e2 = nD * kD * (kD + lit(1.0)) * (kD + lit(1.0)) / lit(2.0)
    val sig = sqrt(nD * kD * kD * (kD + lit(1.0)) *
      (kD * kD - lit(1.0)) / lit(144.0))
    val z = (dd(col("l2")) - e2) / (lit(2.0) * sig)
    val z4 = floor(z * lit(1e4) + lit(0.5)).cast("long")
    val valid = col("k_eff") === k && col("n_days") >= 1 && sig > 0
    agg.select(col("relation"), lit(k).cast("long").as("k_slots"),
      col("n_days"),
      when(valid, dd(col("l2")) / lit(2.0)).as("l_stat"),
      when(valid, z4.cast("double") / lit(1e4)).as("z_r4"),
      when(valid, z4 > lit(16449L)).as("inc_trend"),
      when(valid, z4 < lit(-16449L)).as("dec_trend"))
  }

  // ---------------------------------------------------------------
  // q290 — CLIFF'S DELTA / VARGHA-DELANEY EFFECT SIZE: HOW BIG is
  // the early→late shift q250's U test only calls significant — at
  // 100 TB row counts EVERYTHING is "significant", and the standard
  // remedy (Cliff 1993; Vargha & Delaney 2000) is the ordinal effect
  // size δ = P(late > early) − P(late < early) and its companion
  // A = P(late > early) + ½P(late = early) = (δ+1)/2 (the identity
  // holds EXACTLY under ties since gt + lt + eq = n₁n₂). Exactness:
  // the pair counts collapse onto the value grid — gt = Σᵥ bᵥ·(caᵥ −
  // aᵥ) (late at v × early strictly below) and lt = n₁n₂ − Σᵥ bᵥ·caᵥ
  // off the SAME inclusive early running count, both exact decimals
  // from one fused two-column chunk-banded pass (the q268 API) — so
  // δ is ONE IEEE divide of exact integers, quantized r6, and the
  // magnitude label is an INTEGER compare on the quantized |δ₆|
  // against the Romano et al. (2006) thresholds 0.147/0.33/0.474 —
  // never a float boundary. Scale shape: q250's — one volume-sized
  // partial agg to the (type, cents) grid, |types| output rows.
  private def q290(s: SparkSession, dir: String): DataFrame =
    cliffsDelta(Tables.events(s, dir)
      .select(col("event_type"), to_date(col("ts")).as("day"), col("value")))

  private[graft] def cliffsDelta(e: DataFrame): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val dd = (c: Column) => c.cast("double")
    val bounds = e.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val vals = e.crossJoin(broadcast(bounds))
      .withColumn("late",
        datediff(col("day"), col("d0")) >= expr("(datediff(d1, d0) + 1) DIV 2"))
      .filter(col("value").isNotNull)
      .withColumn("vc", floor(col("value") * lit(100d) + lit(0.5d)).cast("long"))
      .groupBy(col("event_type"), col("vc"))
      .agg(count(when(!col("late"), lit(1))).as("a"),
        count(when(col("late"), lit(1))).as("b"))
      .withColumn("t", col("a") + col("b"))
    val cum = graft.operators.ChunkedFrame.withRunningSums(
      vals, "event_type", expr("vc DIV 100"), Seq("vc"),
      Seq("t" -> "ct", "a" -> "ca"))
    val per = cum.groupBy(col("event_type"))
      .agg(sum(col("a")).as("n1"), sum(col("b")).as("n2"),
        sum(d38(col("b")) * d38(col("ca") - col("a"))).as("sgt"),
        sum(d38(col("b")) * d38(col("ca"))).as("sbca"))
    val n12 = d38(col("n1")) * d38(col("n2"))
    val lt = n12 - col("sbca")
    val delta = dd(col("sgt") - lt) / dd(n12)
    val d6 = floor(delta * lit(1e6) + lit(0.5)).cast("long")
    val valid = col("n1") > 0 && col("n2") > 0
    per.select(col("event_type"), col("n1").as("n_early"), col("n2").as("n_late"),
      when(valid, d6.cast("double") / lit(1e6)).as("delta_r6"),
      when(valid, floor((delta + lit(1.0)) / lit(2.0) * lit(1e6) + lit(0.5))
        .cast("long").cast("double") / lit(1e6)).as("vda_r6"),
      when(valid,
        when(abs(d6) < 147000L, lit("negligible"))
          .when(abs(d6) < 330000L, lit("small"))
          .when(abs(d6) < 474000L, lit("medium"))
          .otherwise(lit("large"))).as("magnitude"))
  }

  // ---------------------------------------------------------------
  // q283 — GINI COEFFICIENT (mean-absolute-difference form): HOW
  // UNEQUAL is the distribution — the inequality readout q255's HHI
  // only proxies (HHI is share-of-squares; Gini is the Lorenz-curve
  // area every economics text defines, Gini 1912): G = Δ/(2μ) with
  // Δ the mean absolute pairwise difference. Exactness: on the value
  // grid (v, c) sorted ascending, Σ_{i<j}|xᵢ−xⱼ| = Σ_v c_v·(v·Cₚ −
  // Sₚ) with Cₚ/Sₚ the EXCLUSIVE running count/value-sum — an EXACT
  // integer in one grid pass (ties contribute zero by construction),
  // so G = T/(n·S) is ONE IEEE divide of exact decimals, quantized
  // r6. No per-pair enumeration ever happens — the C(n,2) sum
  // collapses onto the grid exactly (the q271 rank-count-identity
  // move applied to L1 differences). Scale shape: ONE volume-sized
  // partial agg to the value grid (customer-revenue grain for the
  // orders relation — the q255 shape — and raw n_chars for
  // documents), then chunk-banded running sums — no global window,
  // no join wider than the grid. Output: 1 row per relation.
  private def q283(s: SparkSession, dir: String): DataFrame = {
    val rev = Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(floor(col("o_totalprice") * lit(100d) + lit(0.5d)).cast("long"))
        .as("vc"))
      .select(col("vc"))
    val chars = Tables.documents(s, dir).select(col("n_chars").as("vc"))
    giniMd(rev, "customer.revenue")
      .unionByName(giniMd(chars, "documents.n_chars"))
  }

  private[graft] def giniMd(vals: DataFrame, rel: String): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val dd = (c: Column) => c.cast("double")
    val tv = vals.groupBy(col("vc")).agg(count(lit(1)).as("c"))
      .withColumn("cv", d38(col("vc")) * d38(col("c")))
      .withColumn("g", lit(1))
    val cum = graft.operators.ChunkedFrame.withRunningSums(
      tv, "g", expr("vc DIV 100"), Seq("vc"), Seq("c" -> "ct", "cv" -> "cs"))
      .withColumn("pc", col("ct") - col("c"))
      .withColumn("ps", col("cs") - col("cv"))
      .withColumn("pt", d38(col("c")) *
        (d38(col("vc")) * d38(col("pc")) - d38(col("ps"))))
    val agg = cum.groupBy(lit(rel).as("relation"))
      .agg(sum(col("c")).as("n"), sum(col("cv")).as("s"), sum(col("pt")).as("t"))
    agg.select(col("relation"), col("n"),
      when(dd(col("s")) > 0 && col("n") >= 2,
        floor(dd(col("t")) / (dd(col("n")) * dd(col("s"))) * lit(1e6) + lit(0.5))
          / lit(1e6)).as("gini_r6"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q279_mood_median" -> q279 _,
    "q280_brown_forsythe" -> q280 _,
    "q283_gini" -> q283 _,
    "q286_ansari_bradley" -> q286 _,
    "q287_dunn_posthoc" -> q287 _,
    "q288_kendall_w" -> q288 _,
    "q290_cliffs_delta" -> q290 _,
    "q291_page_trend" -> q291 _,
    "q285_jonckheere" -> q285 _,
    "q273_bartlett" -> q273 _,
    "q263_kruskal_wallis" -> q263 _,
    "q266_friedman" -> q266 _,
    "q267_cochran_q" -> q267 _,
    "q254_kendall_pairs" -> q254 _,
    "q255_hhi_concentration" -> q255 _,
    "q246_basket_rules" -> q246 _,
    "q248_mad_outliers" -> q248 _,
    "q249_info_value" -> q249 _,
    "q260_trimmed_means" -> q260 _,
    "q250_mann_whitney" -> q250 _,
    "q251_spearman_pairs" -> q251 _,
    "q252_theil_sen" -> q252 _,
    "q253_stump_split" -> q253 _
  )

  /** The entropy term H(g, b), mirrored textually between engines —
    * the exact expression shape of [[stumpSplit]]'s `h`. */
  private def hSql(g: String, b: String): String =
    s"CASE WHEN $g = 0 OR $b = 0 THEN 0.0 ELSE " +
      s"-(($g::DOUBLE / ($g::DOUBLE + $b::DOUBLE)) * ln($g::DOUBLE / ($g::DOUBLE + $b::DOUBLE)) " +
      s"+ ($b::DOUBLE / ($g::DOUBLE + $b::DOUBLE)) * ln($b::DOUBLE / ($g::DOUBLE + $b::DOUBLE))) END"

  val oracleSql: Map[String, String] = Map(
    "q279_mood_median" -> {
      // per-relation CTE block (the q263-twin prefix pattern): cell
      // grid -> global lower median -> k x 2 table -> quantized
      // per-group terms -> literal-relation aggregate (GROUP BY the
      // literal so an empty feed emits ZERO rows on both engines)
      def blk(p: String, rel: String, obs: String) =
        s"""${p}cells AS (SELECT gk, vc, count(*)::BIGINT AS a FROM ($obs) GROUP BY 1, 2),
           |${p}tv AS (SELECT vc, sum(a)::BIGINT AS t FROM ${p}cells GROUP BY 1),
           |${p}tot AS (SELECT sum(t)::BIGINT AS nn FROM ${p}tv),
           |${p}med AS (
           |  SELECT min(vc) AS med FROM (
           |    SELECT vc, sum(t) OVER (ORDER BY vc ROWS UNBOUNDED PRECEDING) AS ct
           |    FROM ${p}tv) c CROSS JOIN ${p}tot WHERE ct >= (nn + 1) // 2),
           |${p}per AS (
           |  SELECT gk, sum(a)::BIGINT AS ni,
           |    sum(CASE WHEN vc > med THEN a ELSE 0 END)::BIGINT AS ai
           |  FROM ${p}cells CROSS JOIN ${p}med GROUP BY 1),
           |${p}glob AS (
           |  SELECT count(*)::BIGINT AS k_groups, sum(ni)::BIGINT AS n,
           |    sum(ai)::BIGINT AS c1 FROM ${p}per),
           |${p}terms AS (
           |  SELECT k_groups, n, c1,
           |    CASE WHEN c1 > 0 AND (n - c1) > 0 THEN
           |      floor(((da::DOUBLE / n::DOUBLE) * (da::DOUBLE / n::DOUBLE)
           |          / (ni::DOUBLE * c1::DOUBLE / n::DOUBLE)
           |        + (db::DOUBLE / n::DOUBLE) * (db::DOUBLE / n::DOUBLE)
           |          / (ni::DOUBLE * (n - c1)::DOUBLE / n::DOUBLE)) * 1e6 + 0.5)::HUGEINT
           |    END AS t6
           |  FROM (
           |    SELECT ni, ai, k_groups, n, c1,
           |      ai::HUGEINT * n::HUGEINT - ni::HUGEINT * c1::HUGEINT AS da,
           |      (ni - ai)::HUGEINT * n::HUGEINT - ni::HUGEINT * (n - c1)::HUGEINT AS db
           |    FROM ${p}per CROSS JOIN ${p}glob) j),
           |${p}agg AS (
           |  SELECT '$rel' AS relation, max(k_groups) AS k_groups,
           |    max(n) AS n, max(c1) AS n_above,
           |    sum(t6) AS s6, count(t6)::BIGINT AS nt
           |  FROM ${p}terms GROUP BY 1)""".stripMargin
      def body(p: String) =
        s"""SELECT relation, k_groups, n, n_above,
           |  CASE WHEN k_groups >= 2 AND nt = k_groups THEN
           |    ((s6 + 50) // 100)::BIGINT::DOUBLE / 1e4 END AS chi2_r4,
           |  CASE WHEN k_groups >= 2 AND nt = k_groups AND q95x1e4 IS NOT NULL THEN
           |    ((s6 + 50) // 100)::BIGINT > q95x1e4 END AS reject
           |FROM ${p}agg LEFT JOIN ${StatTables.chi2ValuesSql}
           |  ON chi2.df = ${p}agg.k_groups - 1""".stripMargin
      "WITH " +
        blk("e1", "events.value~event_type",
          "SELECT event_type AS gk, floor(value * 100 + 0.5)::BIGINT AS vc " +
            "FROM events WHERE value IS NOT NULL") + ",\n" +
        blk("o1", "orders.totalprice~priority",
          "SELECT o_orderpriority AS gk, " +
            "floor(o_totalprice * 100 + 0.5)::BIGINT AS vc FROM orders") + "\n" +
        body("e1") + "\nUNION ALL\n" + body("o1")
    },
    "q280_brown_forsythe" -> {
      def blk(p: String, rel: String, obs: String) =
        s"""${p}cells AS (SELECT gk, vc, count(*)::BIGINT AS a FROM ($obs) GROUP BY 1, 2),
           |${p}cum AS (
           |  SELECT gk, vc, a, sum(a) OVER (PARTITION BY gk ORDER BY vc
           |    ROWS UNBOUNDED PRECEDING) AS ct
           |  FROM ${p}cells),
           |${p}np AS (SELECT gk, sum(a)::BIGINT AS ng FROM ${p}cells GROUP BY 1),
           |${p}med AS (
           |  SELECT gk, min(vc) AS med FROM ${p}cum JOIN ${p}np USING (gk)
           |  WHERE ct >= (ng + 1) // 2 GROUP BY 1),
           |${p}per AS (
           |  SELECT gk, sum(a)::BIGINT AS ni,
           |    sum(a::HUGEINT * abs(vc - med)::HUGEINT) AS s1,
           |    sum(a::HUGEINT * abs(vc - med)::HUGEINT * abs(vc - med)::HUGEINT) AS q1
           |  FROM ${p}cells JOIN ${p}med USING (gk) GROUP BY 1),
           |${p}glob AS (
           |  SELECT count(*)::BIGINT AS k_groups, sum(ni)::BIGINT AS n,
           |    sum(s1)::HUGEINT AS s FROM ${p}per),
           |${p}terms AS (
           |  SELECT k_groups, n,
           |    floor((dg::DOUBLE / n::DOUBLE) * (dg::DOUBLE / n::DOUBLE)
           |      / ni::DOUBLE * 1e6 + 0.5)::HUGEINT AS bt6,
           |    floor((ni::HUGEINT * q1 - s1 * s1)::DOUBLE / ni::DOUBLE * 1e6
           |      + 0.5)::HUGEINT AS wt6
           |  FROM (
           |    SELECT ni, s1, q1, k_groups, n,
           |      n::HUGEINT * s1 - ni::HUGEINT * s AS dg
           |    FROM ${p}per CROSS JOIN ${p}glob) j),
           |${p}agg AS (
           |  SELECT '$rel' AS relation, max(k_groups) AS k_groups,
           |    max(n) AS n, sum(bt6) AS b6, sum(wt6) AS w6
           |  FROM ${p}terms GROUP BY 1)""".stripMargin
      def body(p: String) =
        s"""SELECT relation, k_groups, n,
           |  CASE WHEN k_groups >= 2 AND w6::DOUBLE > 0 AND n > k_groups THEN
           |    floor((n::DOUBLE - k_groups::DOUBLE) / (k_groups::DOUBLE - 1.0)
           |      * (b6::DOUBLE / w6::DOUBLE) * 1e4 + 0.5)::BIGINT::DOUBLE / 1e4
           |  END AS w_r4,
           |  CASE WHEN k_groups >= 2 AND w6::DOUBLE > 0 AND n > k_groups
           |      AND q95x1e4 IS NOT NULL THEN
           |    floor((n::DOUBLE - k_groups::DOUBLE) * (b6::DOUBLE / w6::DOUBLE)
           |      * 1e4 + 0.5)::BIGINT > q95x1e4 END AS reject
           |FROM ${p}agg LEFT JOIN ${StatTables.chi2ValuesSql}
           |  ON chi2.df = ${p}agg.k_groups - 1""".stripMargin
      "WITH " +
        blk("e2", "events.value~event_type",
          "SELECT event_type AS gk, floor(value * 100 + 0.5)::BIGINT AS vc " +
            "FROM events WHERE value IS NOT NULL") + ",\n" +
        blk("o2", "orders.totalprice~priority",
          "SELECT o_orderpriority AS gk, " +
            "floor(o_totalprice * 100 + 0.5)::BIGINT AS vc FROM orders") + "\n" +
        body("e2") + "\nUNION ALL\n" + body("o2")
    },
    "q286_ansari_bradley" ->
      """WITH e AS (
        |  SELECT event_type, ts::TIMESTAMP::DATE AS day, value FROM events
        |), bd AS (SELECT min(day) AS d0, max(day) AS d1 FROM e),
        |v AS (
        |  SELECT event_type,
        |    date_diff('day', d0, day) >= (date_diff('day', d0, d1) + 1) // 2 AS late,
        |    floor(value * 100 + 0.5)::BIGINT AS vc
        |  FROM e, bd WHERE value IS NOT NULL
        |), g AS (
        |  SELECT event_type, vc,
        |    count(CASE WHEN NOT late THEN 1 END)::BIGINT AS a,
        |    count(CASE WHEN late THEN 1 END)::BIGINT AS b,
        |    count(*)::BIGINT AS t
        |  FROM v GROUP BY 1, 2
        |), np AS (
        |  SELECT event_type, sum(t)::BIGINT AS nn, sum(a)::BIGINT AS n1,
        |    sum(b)::BIGINT AS n2, count(*)::BIGINT AS n_cells
        |  FROM g GROUP BY 1
        |), cc AS (
        |  SELECT g.*, (sum(t) OVER (PARTITION BY event_type ORDER BY vc
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS ct
        |  FROM g
        |), r_ AS (
        |  SELECT cc.event_type, a, t, ct, nn, n1, n2, n_cells,
        |    (nn + 1) // 2 AS h
        |  FROM cc JOIN np USING (event_type)
        |), s2 AS (
        |  SELECT *,
        |    (CASE WHEN ct <= h THEN ct::HUGEINT * (ct + 1)::HUGEINT
        |      ELSE 2::HUGEINT * h::HUGEINT * (h + 1)::HUGEINT
        |        + 2::HUGEINT * (ct - h)::HUGEINT * (nn + 1)::HUGEINT
        |        - ct::HUGEINT * (ct + 1)::HUGEINT END)
        |    - (CASE WHEN (ct - t) <= h
        |        THEN (ct - t)::HUGEINT * (ct - t + 1)::HUGEINT
        |      ELSE 2::HUGEINT * h::HUGEINT * (h + 1)::HUGEINT
        |        + 2::HUGEINT * (ct - t - h)::HUGEINT * (nn + 1)::HUGEINT
        |        - (ct - t)::HUGEINT * (ct - t + 1)::HUGEINT END) AS num2
        |  FROM r_
        |), q AS (
        |  SELECT event_type, n1, n2, nn, n_cells, sum(num2) AS sn2,
        |    sum(floor(a::DOUBLE * num2::DOUBLE / t::DOUBLE * 1e6 + 0.5)::HUGEINT)
        |      AS sab6,
        |    sum(floor(num2::DOUBLE * num2::DOUBLE / t::DOUBLE * 1e6 + 0.5)::HUGEINT)
        |      AS ssq6
        |  FROM s2 GROUP BY 1, 2, 3, 4, 5
        |), zz AS (
        |  SELECT *, sab6::DOUBLE / 2e6 AS ab, sn2::DOUBLE / 2.0 AS sa,
        |    ssq6::DOUBLE / 4e6 AS sa2
        |  FROM q
        |), z2_ AS (
        |  SELECT *,
        |    n1::DOUBLE * n2::DOUBLE * (nn::DOUBLE * sa2 - sa * sa)
        |      / (nn::DOUBLE * nn::DOUBLE * (nn::DOUBLE - 1.0)) AS vr
        |  FROM zz
        |)
        |SELECT event_type, n1 AS n_early, n2 AS n_late,
        |  CASE WHEN n1 > 0 AND n2 > 0 AND n_cells >= 2 AND vr > 0 THEN
        |    floor(ab * 1e4 + 0.5)::HUGEINT::DOUBLE / 1e4 END AS ab_r4,
        |  CASE WHEN n1 > 0 AND n2 > 0 AND n_cells >= 2 AND vr > 0 THEN
        |    floor((ab - n1::DOUBLE * sa / nn::DOUBLE) / sqrt(vr) * 1e4
        |      + 0.5)::BIGINT::DOUBLE / 1e4 END AS z_r4,
        |  CASE WHEN n1 > 0 AND n2 > 0 AND n_cells >= 2 AND vr > 0 THEN
        |    abs(floor((ab - n1::DOUBLE * sa / nn::DOUBLE) / sqrt(vr) * 1e4
        |      + 0.5)::BIGINT) > 19600 END AS reject
        |FROM z2_""".stripMargin,
    "q287_dunn_posthoc" -> {
      def blk(p: String, rel: String, obs: String) =
        s"""${p}cells AS (SELECT gk, vc, count(*)::BIGINT AS a FROM ($obs) GROUP BY 1, 2),
           |${p}tv AS (SELECT vc, sum(a)::BIGINT AS t FROM ${p}cells GROUP BY 1),
           |${p}cum AS (
           |  SELECT vc, t, (sum(t) OVER (ORDER BY vc ROWS UNBOUNDED PRECEDING)
           |    - t)::HUGEINT AS prev
           |  FROM ${p}tv),
           |${p}per AS (
           |  SELECT gk, sum(a)::BIGINT AS ni,
           |    sum(a::HUGEINT * (prev * 2 + t::HUGEINT + 1)) AS r2s
           |  FROM ${p}cells JOIN ${p}cum USING (vc) GROUP BY 1),
           |${p}glob AS (
           |  SELECT sum(t)::BIGINT AS n,
           |    sum(t::HUGEINT * t::HUGEINT * t::HUGEINT - t::HUGEINT) AS tt
           |  FROM ${p}tv),
           |${p}kc AS (SELECT count(*)::BIGINT AS k_groups FROM ${p}per),
           |${p}pairs AS (
           |  SELECT '$rel' AS relation, a.gk AS type_a, b.gk AS type_b,
           |    a.ni AS na, b.ni AS nb, a.r2s AS ra, b.r2s AS rb,
           |    n, tt, k_groups * (k_groups - 1) // 2 AS m
           |  FROM ${p}per a CROSS JOIN ${p}per b
           |    CROSS JOIN ${p}glob CROSS JOIN ${p}kc
           |  WHERE a.gk < b.gk),
           |${p}zz AS (
           |  SELECT relation, type_a, type_b, na, nb, n, m,
           |    (n::DOUBLE * (n::DOUBLE + 1.0) / 12.0
           |      - tt::DOUBLE / (12.0 * (n::DOUBLE - 1.0)))
           |      * (1.0 / na::DOUBLE + 1.0 / nb::DOUBLE) AS sig2,
           |    ra::DOUBLE / (2.0 * na::DOUBLE)
           |      - rb::DOUBLE / (2.0 * nb::DOUBLE) AS diff
           |  FROM ${p}pairs)""".stripMargin
      def body(p: String) =
        s"""SELECT relation, type_a, type_b, na AS n_a, nb AS n_b,
           |  CASE WHEN n > 1 AND sig2 > 0 THEN
           |    floor(diff / sqrt(sig2) * 1e4 + 0.5)::BIGINT::DOUBLE / 1e4
           |  END AS z_r4,
           |  CASE WHEN n > 1 AND sig2 > 0 AND zcrit4 IS NOT NULL THEN
           |    abs(floor(diff / sqrt(sig2) * 1e4 + 0.5)::BIGINT) > zcrit4
           |  END AS reject
           |FROM ${p}zz LEFT JOIN ${StatTables.zbonfValuesSql}
           |  ON zb.m = ${p}zz.m""".stripMargin
      "WITH " +
        blk("e5", "events.value~event_type",
          "SELECT event_type AS gk, floor(value * 100 + 0.5)::BIGINT AS vc " +
            "FROM events WHERE value IS NOT NULL") + ",\n" +
        blk("o5", "orders.totalprice~priority",
          "SELECT o_orderpriority AS gk, " +
            "floor(o_totalprice * 100 + 0.5)::BIGINT AS vc FROM orders") + "\n" +
        body("e5") + "\nUNION ALL\n" + body("o5")
    },
    "q290_cliffs_delta" ->
      """WITH e AS (
        |  SELECT event_type, ts::TIMESTAMP::DATE AS day, value FROM events
        |), bd AS (SELECT min(day) AS d0, max(day) AS d1 FROM e),
        |v AS (
        |  SELECT event_type,
        |    date_diff('day', d0, day) >= (date_diff('day', d0, d1) + 1) // 2 AS late,
        |    floor(value * 100 + 0.5)::BIGINT AS vc
        |  FROM e, bd WHERE value IS NOT NULL
        |), g AS (
        |  SELECT event_type, vc,
        |    count(CASE WHEN NOT late THEN 1 END)::BIGINT AS a,
        |    count(CASE WHEN late THEN 1 END)::BIGINT AS b
        |  FROM v GROUP BY 1, 2
        |), cc AS (
        |  SELECT g.*, (sum(a) OVER (PARTITION BY event_type ORDER BY vc
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS ca
        |  FROM g
        |), per AS (
        |  SELECT event_type, sum(a)::BIGINT AS n1, sum(b)::BIGINT AS n2,
        |    sum(b::HUGEINT * (ca - a)::HUGEINT) AS sgt,
        |    sum(b::HUGEINT * ca::HUGEINT) AS sbca
        |  FROM cc GROUP BY 1
        |), dd_ AS (
        |  SELECT *,
        |    (sgt - (n1::HUGEINT * n2::HUGEINT - sbca))::DOUBLE
        |      / (n1::HUGEINT * n2::HUGEINT)::DOUBLE AS delta
        |  FROM per
        |)
        |SELECT event_type, n1 AS n_early, n2 AS n_late,
        |  CASE WHEN n1 > 0 AND n2 > 0 THEN
        |    floor(delta * 1e6 + 0.5)::BIGINT::DOUBLE / 1e6 END AS delta_r6,
        |  CASE WHEN n1 > 0 AND n2 > 0 THEN
        |    floor((delta + 1.0) / 2.0 * 1e6 + 0.5)::BIGINT::DOUBLE / 1e6
        |  END AS vda_r6,
        |  CASE WHEN n1 > 0 AND n2 > 0 THEN
        |    CASE WHEN abs(floor(delta * 1e6 + 0.5)::BIGINT) < 147000 THEN 'negligible'
        |      WHEN abs(floor(delta * 1e6 + 0.5)::BIGINT) < 330000 THEN 'small'
        |      WHEN abs(floor(delta * 1e6 + 0.5)::BIGINT) < 474000 THEN 'medium'
        |      ELSE 'large' END END AS magnitude
        |FROM dd_""".stripMargin,
    "q291_page_trend" ->
      """WITH obs AS (
        |  SELECT o_orderdate AS day, substring(o_orderpriority, 1, 1)::INT AS gi,
        |    floor(o_totalprice * 100 + 0.5)::BIGINT AS vc
        |  FROM orders
        |), blocks AS (
        |  SELECT day, gi, sum(vc)::HUGEINT AS rev FROM obs GROUP BY 1, 2
        |), dc AS (SELECT day, count(*)::BIGINT AS cnt FROM blocks GROUP BY 1),
        |cb AS (
        |  SELECT b.day, b.gi, b.rev FROM blocks b JOIN dc USING (day)
        |  WHERE cnt = 5
        |), rk AS (
        |  SELECT gi,
        |    2 * rank() OVER (PARTITION BY day ORDER BY rev)
        |      + count(*) OVER (PARTITION BY day, rev) - 1 AS r2
        |  FROM cb
        |), pt AS (
        |  SELECT gi, count(*)::BIGINT AS n, sum(r2)::BIGINT AS rs2
        |  FROM rk GROUP BY 1
        |), ag AS (
        |  SELECT 'orders.revenue~priority_order' AS relation,
        |    max(n)::BIGINT AS n_days, count(*)::BIGINT AS k_eff,
        |    sum(gi::HUGEINT * rs2::HUGEINT) AS l2
        |  FROM pt GROUP BY 1
        |), zz AS (
        |  SELECT relation, n_days, k_eff, l2,
        |    n_days::DOUBLE * 5.0 * (5.0 + 1.0) * (5.0 + 1.0) / 2.0 AS e2,
        |    sqrt(n_days::DOUBLE * 5.0 * 5.0 * (5.0 + 1.0)
        |      * (5.0 * 5.0 - 1.0) / 144.0) AS sig
        |  FROM ag
        |)
        |SELECT relation, 5::BIGINT AS k_slots, n_days,
        |  CASE WHEN k_eff = 5 AND n_days >= 1 AND sig > 0 THEN
        |    l2::DOUBLE / 2.0 END AS l_stat,
        |  CASE WHEN k_eff = 5 AND n_days >= 1 AND sig > 0 THEN
        |    floor((l2::DOUBLE - e2) / (2.0 * sig) * 1e4 + 0.5)::BIGINT::DOUBLE
        |      / 1e4 END AS z_r4,
        |  CASE WHEN k_eff = 5 AND n_days >= 1 AND sig > 0 THEN
        |    floor((l2::DOUBLE - e2) / (2.0 * sig) * 1e4 + 0.5)::BIGINT > 16449
        |  END AS inc_trend,
        |  CASE WHEN k_eff = 5 AND n_days >= 1 AND sig > 0 THEN
        |    floor((l2::DOUBLE - e2) / (2.0 * sig) * 1e4 + 0.5)::BIGINT < -16449
        |  END AS dec_trend
        |FROM zz""".stripMargin,
    "q285_jonckheere" ->
      """WITH obs AS (
        |  SELECT substring(o_orderpriority, 1, 1)::INT AS gi,
        |    floor(o_totalprice * 100 + 0.5)::BIGINT AS vc
        |  FROM orders
        |), cells AS (
        |  SELECT gi, vc, count(*)::BIGINT AS a FROM obs GROUP BY 1, 2
        |), grid AS (
        |  SELECT vc,
        |    sum(CASE WHEN gi = 1 THEN a ELSE 0 END)::BIGINT AS c1,
        |    sum(CASE WHEN gi = 2 THEN a ELSE 0 END)::BIGINT AS c2,
        |    sum(CASE WHEN gi = 3 THEN a ELSE 0 END)::BIGINT AS c3,
        |    sum(CASE WHEN gi = 4 THEN a ELSE 0 END)::BIGINT AS c4,
        |    sum(CASE WHEN gi = 5 THEN a ELSE 0 END)::BIGINT AS c5,
        |    sum(a)::BIGINT AS t
        |  FROM cells GROUP BY 1
        |), cum AS (
        |  SELECT *,
        |    sum(c1) OVER w AS ct1, sum(c2) OVER w AS ct2,
        |    sum(c3) OVER w AS ct3, sum(c4) OVER w AS ct4,
        |    sum(c5) OVER w AS ct5
        |  FROM grid WINDOW w AS (ORDER BY vc ROWS UNBOUNDED PRECEDING)
        |), jr AS (
        |  SELECT
        |    4::HUGEINT * (
        |      c2::HUGEINT * (ct1 - c1)::HUGEINT
        |      + c3::HUGEINT * ((ct1 - c1) + (ct2 - c2))::HUGEINT
        |      + c4::HUGEINT * ((ct1 - c1) + (ct2 - c2) + (ct3 - c3))::HUGEINT
        |      + c5::HUGEINT * ((ct1 - c1) + (ct2 - c2) + (ct3 - c3) + (ct4 - c4))::HUGEINT)
        |    + (t::HUGEINT * t::HUGEINT
        |      - (c1::HUGEINT * c1 + c2::HUGEINT * c2 + c3::HUGEINT * c3
        |        + c4::HUGEINT * c4 + c5::HUGEINT * c5)) AS j4v,
        |    t::HUGEINT * (t - 1)::HUGEINT * (2 * t + 5)::HUGEINT AS t21,
        |    t::HUGEINT * (t - 1)::HUGEINT * (t - 2)::HUGEINT AS t3,
        |    t::HUGEINT * (t - 1)::HUGEINT AS t2
        |  FROM cum
        |), ga AS (
        |  SELECT 'orders.totalprice~priority_order' AS relation,
        |    sum(j4v) AS j4, sum(t21) AS ft21, sum(t3) AS ft3, sum(t2) AS ft2
        |  FROM jr GROUP BY 1
        |), per AS (
        |  SELECT gi, sum(a)::BIGINT AS ni FROM cells GROUP BY 1
        |), gg AS (
        |  SELECT 'orders.totalprice~priority_order' AS relation,
        |    count(*)::BIGINT AS k_groups, sum(ni)::BIGINT AS n,
        |    sum(ni::HUGEINT * ni::HUGEINT) AS sn2,
        |    sum(ni::HUGEINT * (ni - 1)::HUGEINT * (2 * ni + 5)::HUGEINT) AS fn21,
        |    sum(ni::HUGEINT * (ni - 1)::HUGEINT * (ni - 2)::HUGEINT) AS fn3,
        |    sum(ni::HUGEINT * (ni - 1)::HUGEINT) AS fn2
        |  FROM per GROUP BY 1
        |), z AS (
        |  SELECT relation, k_groups, n,
        |    (n::HUGEINT * (n - 1)::HUGEINT * (2 * n + 5)::HUGEINT - fn21 - ft21)::DOUBLE
        |        / 72.0
        |      + fn3::DOUBLE * ft3::DOUBLE
        |        / (36.0 * n::DOUBLE * (n::DOUBLE - 1.0) * (n::DOUBLE - 2.0))
        |      + fn2::DOUBLE * ft2::DOUBLE / (8.0 * n::DOUBLE * (n::DOUBLE - 1.0)) AS vr,
        |    (j4::DOUBLE - (n::HUGEINT * n::HUGEINT - sn2)::DOUBLE) AS num4
        |  FROM ga JOIN gg USING (relation)
        |)
        |SELECT relation, k_groups, n,
        |  CASE WHEN k_groups >= 2 AND n >= 3 AND vr > 0 THEN
        |    floor(num4 / (4.0 * sqrt(vr)) * 1e4 + 0.5)::BIGINT::DOUBLE / 1e4
        |  END AS z_r4,
        |  CASE WHEN k_groups >= 2 AND n >= 3 AND vr > 0 THEN
        |    floor(num4 / (4.0 * sqrt(vr)) * 1e4 + 0.5)::BIGINT > 16449
        |  END AS inc_trend,
        |  CASE WHEN k_groups >= 2 AND n >= 3 AND vr > 0 THEN
        |    floor(num4 / (4.0 * sqrt(vr)) * 1e4 + 0.5)::BIGINT < -16449
        |  END AS dec_trend
        |FROM z""".stripMargin,
    "q283_gini" -> {
      def one(rel: String, src: String) =
        s"""SELECT relation, n,
           |  CASE WHEN s::DOUBLE > 0 AND n >= 2 THEN
           |    floor(t::DOUBLE / (n::DOUBLE * s::DOUBLE) * 1e6 + 0.5)::BIGINT::DOUBLE / 1e6
           |  END AS gini_r6
           |FROM (
           |  SELECT '$rel' AS relation, sum(c)::BIGINT AS n,
           |    sum(cv)::HUGEINT AS s, sum(pt)::HUGEINT AS t
           |  FROM (
           |    SELECT c, cv,
           |      c::HUGEINT * (vc::HUGEINT * (ct - c)::HUGEINT - (cs - cv)) AS pt
           |    FROM (
           |      SELECT vc, c, cv,
           |        sum(c) OVER w AS ct,
           |        sum(cv) OVER w AS cs
           |      FROM (SELECT vc, count(*)::BIGINT AS c,
           |              vc::HUGEINT * count(*)::HUGEINT AS cv
           |            FROM ($src) GROUP BY 1)
           |      WINDOW w AS (ORDER BY vc ROWS UNBOUNDED PRECEDING)
           |    )
           |  ) GROUP BY 1
           |)""".stripMargin
      one("customer.revenue",
        "SELECT sum(floor(o_totalprice * 100 + 0.5)::BIGINT)::BIGINT AS vc " +
          "FROM orders GROUP BY o_custkey") +
        "\nUNION ALL\n" +
        one("documents.n_chars", "SELECT n_chars AS vc FROM documents")
    },
    "q273_bartlett" ->
      (s"""WITH obs AS (
         |  SELECT event_type AS gk, floor(value * 100 + 0.5)::BIGINT AS vc
         |  FROM events WHERE value IS NOT NULL
         |), per AS (
         |  SELECT gk, count(*)::BIGINT AS ni, sum(vc::HUGEINT) AS s1,
         |    sum(vc::HUGEINT * vc::HUGEINT) AS s2
         |  FROM obs GROUP BY 1 HAVING count(*) >= 2
         |), g AS (
         |  SELECT gk, ni, (ni::HUGEINT * s2 - s1 * s1) AS num FROM per
         |), g2 AS (
         |  SELECT gk, ni,
         |    floor(num::DOUBLE / ni::DOUBLE + 0.5)::HUGEINT AS wq,
         |    CASE WHEN num::DOUBLE / (ni::DOUBLE * (ni::DOUBLE - 1.0)) > 0 THEN
         |      floor((ni::DOUBLE - 1.0)
         |        * ln(num::DOUBLE / (ni::DOUBLE * (ni::DOUBLE - 1.0)))
         |        * 1e6 + 0.5)::HUGEINT END AS lt,
         |    floor(1e12 / (ni::DOUBLE - 1.0) + 0.5)::BIGINT AS iv
         |  FROM g
         |), agg AS (
         |  -- GROUP BY the literal relation (not a global aggregate):
         |  -- when no group reaches ni >= 2, BOTH engines emit zero
         |  -- rows — the engine side groups by lit(rel) the same way
         |  -- (round-14 advice: degenerate all-singleton parity).
         |  SELECT 'events.value~event_type' AS relation,
         |    count(*)::BIGINT AS k_groups, sum(ni)::BIGINT AS n,
         |    sum(wq) AS sw, sum(lt) AS slt, count(lt)::BIGINT AS nlt,
         |    sum(iv)::HUGEINT AS siv
         |  FROM g2 GROUP BY 1
         |), z AS (
         |  SELECT relation, k_groups, n, sw, slt, nlt, siv, k_groups - 1 AS df,
         |    ((n - k_groups)::DOUBLE * ln(sw::DOUBLE / (n - k_groups)::DOUBLE)
         |        - slt::DOUBLE / 1e6)
         |      / (1.0 + (siv::DOUBLE / 1e12 - 1.0 / (n - k_groups)::DOUBLE)
         |        / (3.0 * (k_groups::DOUBLE - 1.0))) AS b
         |  FROM agg
         |)
         |SELECT relation, k_groups, n,
         |  CASE WHEN k_groups >= 2 AND nlt = k_groups AND sw::DOUBLE > 0 THEN
         |    floor(b * 1e4 + 0.5)::BIGINT::DOUBLE / 1e4 END AS b_r4,
         |  CASE WHEN k_groups >= 2 AND nlt = k_groups AND sw::DOUBLE > 0
         |      AND q95x1e4 IS NOT NULL THEN
         |    floor(b * 1e4 + 0.5)::BIGINT > q95x1e4 END AS reject
         |FROM z LEFT JOIN """.stripMargin + StatTables.chi2ValuesSql +
        " ON chi2.df = z.df"),
    "q263_kruskal_wallis" -> {
      def one(rel: String, obs: String) =
        s"""SELECT '$rel' AS relation, k_groups, n,
           |  CASE WHEN n > 1 AND corr > 0 THEN
           |    floor(h / corr * 1e4 + 0.5)::BIGINT::DOUBLE / 1e4 END AS h_r4,
           |  CASE WHEN n > 1 AND corr > 0 AND q95x1e4 IS NOT NULL THEN
           |    floor(h / corr * 1e4 + 0.5)::BIGINT > q95x1e4 END AS reject
           |FROM (
           |  SELECT k_groups, n,
           |    3.0 * (sfp::DOUBLE / 1e6) / (n::DOUBLE * (n::DOUBLE + 1.0)) AS h,
           |    1.0 - ties::DOUBLE
           |      / (n::DOUBLE * n::DOUBLE * n::DOUBLE - n::DOUBLE) AS corr
           |  FROM (
           |    SELECT count(*)::BIGINT AS k_groups, sum(ng)::BIGINT AS n,
           |      sum(floor(((r2 - ng::HUGEINT * (nn + 1)::HUGEINT)::DOUBLE
           |           * (r2 - ng::HUGEINT * (nn + 1)::HUGEINT)::DOUBLE
           |           / ng::DOUBLE) * 1e6 + 0.5)::HUGEINT) AS sfp
           |    FROM (
           |      SELECT gk, sum(a)::BIGINT AS ng,
           |        sum(a::HUGEINT * (prev * 2 + t::HUGEINT + 1)) AS r2
           |      FROM (
           |        SELECT gk, vc, count(*)::BIGINT AS a FROM ($obs) GROUP BY 1, 2
           |      ) cells
           |      JOIN (
           |        SELECT vc, t, (sum(t) OVER (ORDER BY vc ROWS BETWEEN
           |          UNBOUNDED PRECEDING AND CURRENT ROW) - t)::HUGEINT AS prev
           |        FROM (SELECT vc, count(*)::BIGINT AS t FROM ($obs) GROUP BY 1)
           |      ) cum USING (vc)
           |      GROUP BY 1
           |    ) per
           |    CROSS JOIN (SELECT count(*)::BIGINT AS nn FROM ($obs)) gl
           |  ) s1
           |  CROSS JOIN (
           |    SELECT sum(t::HUGEINT * t::HUGEINT * t::HUGEINT - t::HUGEINT) AS ties
           |    FROM (SELECT vc, count(*)::BIGINT AS t FROM ($obs) GROUP BY 1)
           |  ) tq
           |) z
           |LEFT JOIN ${StatTables.chi2ValuesSql} ON chi2.df = z.k_groups - 1"""
          .stripMargin
      one("events.value~event_type",
        "SELECT event_type AS gk, floor(value * 100 + 0.5)::BIGINT AS vc " +
          "FROM events WHERE value IS NOT NULL") +
        "\nUNION ALL\n" +
        one("orders.totalprice~priority",
          "SELECT o_orderpriority AS gk, " +
            "floor(o_totalprice * 100 + 0.5)::BIGINT AS vc FROM orders")
    },
    "q266_friedman" ->
      (MarketQueries.dayRetCtes +
        """, kk AS (SELECT count(DISTINCT event_type)::BIGINT AS k FROM c),
          |dc AS (SELECT day, count(*)::BIGINT AS cnt FROM c GROUP BY 1),
          |cb AS (
          |  SELECT c.event_type, c.day, c.close_lv, k
          |  FROM c JOIN dc USING (day) CROSS JOIN kk WHERE cnt = k
          |), rk AS (
          |  SELECT event_type, k,
          |    2 * rank() OVER (PARTITION BY day ORDER BY close_lv)
          |      + count(*) OVER (PARTITION BY day, close_lv) - 1 AS r2
          |  FROM cb
          |), dn AS (
          |  SELECT sum((r2 - k - 1)::HUGEINT * (r2 - k - 1)::HUGEINT) AS den
          |  FROM rk
          |), pt AS (
          |  SELECT event_type, max(k)::BIGINT AS k, count(*)::BIGINT AS n,
          |    sum(r2)::BIGINT AS rs2
          |  FROM rk GROUP BY 1
          |), ag AS (
          |  SELECT max(k)::BIGINT AS k_types, max(n)::BIGINT AS n_days,
          |    sum((rs2 - n::HUGEINT * (k + 1)::HUGEINT)
          |      * (rs2 - n::HUGEINT * (k + 1)::HUGEINT)) AS num0
          |  FROM pt
          |)
          |SELECT k_types, n_days,
          |  CASE WHEN den IS NOT NULL AND den::DOUBLE > 0 THEN
          |    floor(((k_types - 1)::HUGEINT)::DOUBLE * num0::DOUBLE / den::DOUBLE
          |      * 1e4 + 0.5)::BIGINT::DOUBLE / 1e4 END AS q_r4,
          |  CASE WHEN den IS NOT NULL AND den::DOUBLE > 0
          |      AND q95x1e4 IS NOT NULL THEN
          |    floor(((k_types - 1)::HUGEINT)::DOUBLE * num0::DOUBLE / den::DOUBLE
          |      * 1e4 + 0.5)::BIGINT > q95x1e4 END AS reject
          |FROM ag CROSS JOIN dn
          |LEFT JOIN """.stripMargin + StatTables.chi2ValuesSql +
        " ON chi2.df = ag.k_types - 1"),
    "q288_kendall_w" ->
      (MarketQueries.dayRetCtes +
        """, kk AS (SELECT count(DISTINCT event_type)::BIGINT AS k FROM c),
          |dc AS (SELECT day, count(*)::BIGINT AS cnt FROM c GROUP BY 1),
          |cb AS (
          |  SELECT c.event_type, c.day, c.close_lv, k
          |  FROM c JOIN dc USING (day) CROSS JOIN kk WHERE cnt = k
          |), rk AS (
          |  SELECT event_type, k,
          |    2 * rank() OVER (PARTITION BY day ORDER BY close_lv)
          |      + count(*) OVER (PARTITION BY day, close_lv) - 1 AS r2
          |  FROM cb
          |), dn AS (
          |  SELECT sum((r2 - k - 1)::HUGEINT * (r2 - k - 1)::HUGEINT) AS den
          |  FROM rk
          |), pt AS (
          |  SELECT event_type, max(k)::BIGINT AS k, count(*)::BIGINT AS n,
          |    sum(r2)::BIGINT AS rs2
          |  FROM rk GROUP BY 1
          |), ag AS (
          |  SELECT max(k)::BIGINT AS k_types, max(n)::BIGINT AS n_days,
          |    sum((rs2 - n::HUGEINT * (k + 1)::HUGEINT)
          |      * (rs2 - n::HUGEINT * (k + 1)::HUGEINT)) AS num0
          |  FROM pt
          |)
          |SELECT k_types, n_days,
          |  CASE WHEN den IS NOT NULL AND den::DOUBLE > 0 AND n_days > 0
          |      AND k_types >= 2 THEN
          |    floor(((k_types - 1)::HUGEINT)::DOUBLE * num0::DOUBLE / den::DOUBLE
          |      / (n_days::DOUBLE * (k_types::DOUBLE - 1.0))
          |      * 1e6 + 0.5)::BIGINT::DOUBLE / 1e6 END AS w_r6,
          |  CASE WHEN den IS NOT NULL AND den::DOUBLE > 0 AND n_days > 0
          |      AND k_types >= 2 AND q95x1e4 IS NOT NULL THEN
          |    floor(((k_types - 1)::HUGEINT)::DOUBLE * num0::DOUBLE / den::DOUBLE
          |      * 1e4 + 0.5)::BIGINT > q95x1e4 END AS reject
          |FROM ag CROSS JOIN dn
          |LEFT JOIN """.stripMargin + StatTables.chi2ValuesSql +
        " ON chi2.df = ag.k_types - 1"),
    "q267_cochran_q" ->
      (MarketQueries.dayRetCtes +
        """, kk AS (SELECT count(DISTINCT event_type)::BIGINT AS k FROM r),
          |dc AS (SELECT day, count(*)::BIGINT AS cnt FROM r GROUP BY 1),
          |cb AS (
          |  SELECT r.event_type, r.day, k,
          |    (CASE WHEN r.r_fp > 0 THEN 1 ELSE 0 END)::BIGINT AS up
          |  FROM r JOIN dc USING (day) CROSS JOIN kk WHERE cnt = k
          |), cj AS (
          |  SELECT event_type, max(k)::BIGINT AS k, sum(up)::BIGINT AS c,
          |    count(*)::BIGINT AS n
          |  FROM cb GROUP BY 1
          |), ri AS (SELECT day, sum(up)::BIGINT AS r0 FROM cb GROUP BY 1),
          |ca AS (
          |  SELECT max(k)::BIGINT AS k_types, max(n)::BIGINT AS n_days,
          |    sum(c)::BIGINT AS sc, sum(c::HUGEINT * c::HUGEINT) AS sc2
          |  FROM cj
          |), ra AS (
          |  SELECT sum(r0)::BIGINT AS sr, sum(r0::HUGEINT * r0::HUGEINT) AS sr2
          |  FROM ri
          |), zz AS (
          |  SELECT k_types, n_days, sc,
          |    ((k_types - 1)::HUGEINT
          |      * (k_types::HUGEINT * sc2 - sc::HUGEINT * sc::HUGEINT)) AS num,
          |    (k_types::HUGEINT * sr::HUGEINT - sr2) AS den
          |  FROM ca CROSS JOIN ra
          |)
          |SELECT k_types, n_days, sc AS n_up,
          |  CASE WHEN den::DOUBLE > 0 THEN
          |    floor(num::DOUBLE / den::DOUBLE * 1e4 + 0.5)::BIGINT::DOUBLE / 1e4
          |  END AS q_r4,
          |  CASE WHEN den::DOUBLE > 0 AND q95x1e4 IS NOT NULL THEN
          |    floor(num::DOUBLE / den::DOUBLE * 1e4 + 0.5)::BIGINT > q95x1e4
          |  END AS reject
          |FROM zz LEFT JOIN """.stripMargin + StatTables.chi2ValuesSql +
        " ON chi2.df = zz.k_types - 1"),
    "q254_kendall_pairs" ->
      (MarketQueries.dayRetCtes +
        """, j AS (
          |  SELECT a.event_type AS ta, b.event_type AS tb, a.day,
          |    a.r_fp AS x, b.r_fp AS y
          |  FROM r a JOIN r b ON a.day = b.day AND a.event_type < b.event_type
          |), g AS (
          |  SELECT l.ta, l.tb, count(*)::BIGINT AS n0,
          |    coalesce(sum(CASE WHEN l.x <> rr.x AND l.y <> rr.y
          |      AND ((l.x < rr.x) = (l.y < rr.y)) THEN 1 END), 0)::BIGINT AS c,
          |    coalesce(sum(CASE WHEN l.x <> rr.x AND l.y <> rr.y
          |      AND ((l.x < rr.x) <> (l.y < rr.y)) THEN 1 END), 0)::BIGINT AS d,
          |    coalesce(sum(CASE WHEN l.x = rr.x THEN 1 END), 0)::BIGINT AS nx,
          |    coalesce(sum(CASE WHEN l.y = rr.y THEN 1 END), 0)::BIGINT AS ny
          |  FROM j l JOIN j rr ON l.ta = rr.ta AND l.tb = rr.tb AND l.day < rr.day
          |  GROUP BY 1, 2
          |)
          |SELECT ta AS type_a, tb AS type_b, n0 AS n_pairs,
          |  c AS n_concordant, d AS n_discordant,
          |  CASE WHEN ((n0 - nx)::HUGEINT * (n0 - ny)::HUGEINT)::DOUBLE > 0 THEN
          |    floor((c - d)::DOUBLE
          |      / sqrt(((n0 - nx)::HUGEINT * (n0 - ny)::HUGEINT)::DOUBLE)
          |      * 1e6 + 0.5) / 1e6 END AS tau_b_r6
          |FROM g""".stripMargin),
    "q255_hhi_concentration" ->
      """WITH rev AS (
        |  SELECT o_custkey, sum(floor(o_totalprice * 100 + 0.5)::BIGINT)::BIGINT AS cents
        |  FROM orders GROUP BY 1
        |), cust AS (
        |  SELECT c_nationkey, coalesce(cents, 0)::BIGINT AS cents
        |  FROM customer LEFT JOIN rev ON c_custkey = o_custkey
        |), g AS (
        |  SELECT c_nationkey, count(*)::BIGINT AS n_cust, sum(cents)::BIGINT AS s1,
        |    sum(cents::HUGEINT * cents::HUGEINT) AS s2, max(cents)::BIGINT AS mx
        |  FROM cust GROUP BY 1
        |)
        |SELECT c_nationkey, n_cust,
        |  floor(s1::DOUBLE / 100 * 1e4 + 0.5) / 1e4 AS total_rev_r4,
        |  CASE WHEN s1 > 0 THEN
        |    floor(s2::DOUBLE / (s1::HUGEINT * s1::HUGEINT)::DOUBLE * 1e6 + 0.5) / 1e6
        |  END AS hhi_r6,
        |  CASE WHEN s1 > 0 THEN
        |    floor(mx::DOUBLE / s1::DOUBLE * 1e6 + 0.5) / 1e6 END AS top_share_r6,
        |  CASE WHEN s1 > 0 THEN 4 * s2 > s1::HUGEINT * s1::HUGEINT END AS concentrated
        |FROM g""".stripMargin,
    "q250_mann_whitney" ->
      """WITH e AS (
        |  SELECT event_type, ts::TIMESTAMP::DATE AS day, value FROM events
        |), bd AS (SELECT min(day) AS d0, max(day) AS d1 FROM e),
        |v AS (
        |  SELECT event_type,
        |    date_diff('day', d0, day) >= (date_diff('day', d0, d1) + 1) // 2 AS late,
        |    floor(value * 100 + 0.5)::BIGINT AS vc
        |  FROM e, bd WHERE value IS NOT NULL
        |), g AS (
        |  SELECT event_type, vc,
        |    count(CASE WHEN NOT late THEN 1 END)::BIGINT AS a,
        |    count(CASE WHEN late THEN 1 END)::BIGINT AS b,
        |    count(*)::BIGINT AS t
        |  FROM v GROUP BY 1, 2
        |), cc AS (
        |  SELECT *, (sum(t) OVER (PARTITION BY event_type ORDER BY vc
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - t)::HUGEINT AS prev
        |  FROM g
        |), per AS (
        |  SELECT event_type, sum(a)::BIGINT AS n1, sum(b)::BIGINT AS n2,
        |    sum(a::HUGEINT * (prev * 2 + t::HUGEINT + 1)) AS r1x2,
        |    sum(t::HUGEINT * t::HUGEINT * t::HUGEINT - t::HUGEINT) AS ties
        |  FROM cc GROUP BY 1
        |), f AS (
        |  SELECT *, r1x2 - n1::HUGEINT * (n1 + 1)::HUGEINT AS u1x2,
        |    (n1 + n2)::BIGINT AS nt
        |  FROM per
        |), zz AS (
        |  SELECT *,
        |    (u1x2 - n1::HUGEINT * n2::HUGEINT)::DOUBLE AS num,
        |    n1::DOUBLE * n2::DOUBLE * ((nt::DOUBLE + 1.0)
        |      - ties::DOUBLE / (nt::DOUBLE * (nt::DOUBLE - 1.0))) / 12.0 AS varc
        |  FROM f
        |)
        |SELECT event_type, n1 AS n_early, n2 AS n_late, u1x2::DOUBLE / 2.0 AS u1,
        |  CASE WHEN varc > 0 THEN
        |    floor(num / (2.0 * sqrt(varc)) * 1e4 + 0.5)::BIGINT::DOUBLE / 1e4 END AS z_r4,
        |  CASE WHEN varc > 0 THEN
        |    abs(floor(num / (2.0 * sqrt(varc)) * 1e4 + 0.5)::BIGINT) > 19600 END AS reject
        |FROM zz""".stripMargin,
    "q251_spearman_pairs" ->
      (MarketQueries.dayRetCtes +
        """, j AS (
          |  SELECT a.event_type AS ta, b.event_type AS tb, a.day,
          |    a.r_fp AS x, b.r_fp AS y
          |  FROM r a JOIN r b ON a.day = b.day AND a.event_type < b.event_type
          |), rk AS (
          |  SELECT ta, tb,
          |    2 * rank() OVER (PARTITION BY ta, tb ORDER BY x)
          |      + count(*) OVER (PARTITION BY ta, tb, x) - 1 AS rx2,
          |    2 * rank() OVER (PARTITION BY ta, tb ORDER BY y)
          |      + count(*) OVER (PARTITION BY ta, tb, y) - 1 AS ry2
          |  FROM j
          |), gg AS (
          |  SELECT ta, tb, count(*)::BIGINT AS n,
          |    sum(rx2)::BIGINT AS sx, sum(ry2)::BIGINT AS sy,
          |    sum(rx2::HUGEINT * ry2::HUGEINT) AS sxy,
          |    sum(rx2::HUGEINT * rx2::HUGEINT) AS sxx,
          |    sum(ry2::HUGEINT * ry2::HUGEINT) AS syy
          |  FROM rk GROUP BY 1, 2
          |)
          |SELECT ta AS type_a, tb AS type_b, n AS n_days,
          |  CASE WHEN n > 1
          |    AND (n::HUGEINT * sxx - sx::HUGEINT * sx::HUGEINT)::DOUBLE > 0
          |    AND (n::HUGEINT * syy - sy::HUGEINT * sy::HUGEINT)::DOUBLE > 0
          |  THEN floor((n::HUGEINT * sxy - sx::HUGEINT * sy::HUGEINT)::DOUBLE
          |    / sqrt((n::HUGEINT * sxx - sx::HUGEINT * sx::HUGEINT)::DOUBLE
          |         * (n::HUGEINT * syy - sy::HUGEINT * sy::HUGEINT)::DOUBLE)
          |    * 1e6 + 0.5) / 1e6 END AS spearman_r6
          |FROM gg""".stripMargin),
    "q252_theil_sen" ->
      (MarketQueries.dayRetCtes +
        """, s AS (
          |  SELECT event_type, list(close_lv ORDER BY day) AS xs FROM c GROUP BY 1
          |), mm AS (
          |  SELECT event_type, xs, len(xs)::BIGINT AS m FROM s WHERE len(xs) >= 2
          |), sl AS (
          |  SELECT event_type, xs, m,
          |    list_sort(flatten(list_transform(range(1, m::INT),
          |      i -> list_transform(range(i + 1, (m + 1)::INT),
          |        j -> (xs[j] - xs[i])::DOUBLE / (j - i)::DOUBLE)))) AS slopes
          |  FROM mm
          |), ff AS (
          |  SELECT event_type, m, len(slopes)::BIGINT AS np,
          |    slopes[((len(slopes) + 1) // 2)::INT] AS ts_fp,
          |    list_sum(range(0, m::INT))::BIGINT AS st,
          |    list_sum(xs)::BIGINT AS sy,
          |    list_sum(list_transform(range(0, m::INT),
          |      i -> i::HUGEINT * xs[i + 1]::HUGEINT)) AS sty,
          |    list_sum(list_transform(range(0, m::INT),
          |      i -> i::HUGEINT * i::HUGEINT)) AS stt
          |  FROM sl
          |)
          |SELECT event_type, m AS n_days, np AS n_pairs,
          |  floor(ts_fp / 1e6 * 10000 + 0.5)/10000 AS ts_slope_r4,
          |  CASE WHEN (m::HUGEINT * stt - st::HUGEINT * st::HUGEINT)::DOUBLE > 0 THEN
          |    floor((m::HUGEINT * sty - st::HUGEINT * sy::HUGEINT)::DOUBLE
          |      / (m::HUGEINT * stt - st::HUGEINT * st::HUGEINT)::DOUBLE
          |      / 1e6 * 10000 + 0.5)/10000 END AS ols_slope_r4
          |FROM ff""".stripMargin),
    "q253_stump_split" -> {
      val hp = hSql("tg", "tb")
      val hl = hSql("gl", "bl")
      val hr = hSql("gr", "br")
      s"""WITH lab AS (
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
         |  SELECT sum(g)::BIGINT AS tg, sum(b)::BIGINT AS tb, max(band) AS maxband
         |  FROM cells
         |), cum AS (
         |  SELECT a.band AS thr, sum(c2.g)::BIGINT AS gl, sum(c2.b)::BIGINT AS bl
         |  FROM (SELECT band FROM cells) a JOIN cells c2 ON c2.band <= a.band
         |  GROUP BY 1
         |), sc AS (
         |  SELECT thr, gl, bl, tg - gl AS gr, tb - bl AS br, tg, tb
         |  FROM cum, tot WHERE thr < maxband
         |), scored AS (
         |  SELECT thr, gl, bl, gr, br,
         |    floor(($hp
         |      - ((gl::DOUBLE + bl::DOUBLE) / (tg::DOUBLE + tb::DOUBLE)) * ($hl)
         |      - ((gr::DOUBLE + br::DOUBLE) / (tg::DOUBLE + tb::DOUBLE)) * ($hr))
         |      * 1e6 + 0.5) / 1e6 AS gain_r6
         |  FROM sc
         |), bb AS (SELECT max(gain_r6) AS bg FROM scored),
         |bt AS (SELECT min(thr) AS bthr FROM scored, bb WHERE gain_r6 = bg)
         |SELECT thr AS band_thresh, gl AS n_left_good, bl AS n_left_bad,
         |  gr AS n_right_good, br AS n_right_bad, gain_r6, thr = bthr AS is_best
         |FROM scored, bt""".stripMargin
    },
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
    "q260_trimmed_means" ->
      """WITH v AS (
        |  SELECT event_type, floor(value * 100 + 0.5)::BIGINT AS vc
        |  FROM events WHERE value IS NOT NULL
        |), g AS (SELECT event_type, vc, count(*)::BIGINT AS x FROM v GROUP BY 1, 2),
        |t AS (SELECT event_type, sum(x)::BIGINT AS n FROM g GROUP BY 1),
        |c1 AS (
        |  SELECT *, (sum(x) OVER (PARTITION BY event_type ORDER BY vc
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS ct
        |  FROM g
        |), cc AS (
        |  SELECT c1.event_type, vc, x, ct, n, (n * 5) // 100 AS k, ct - x AS prev
        |  FROM c1 JOIN t USING (event_type)
        |), kept AS (
        |  SELECT event_type, n, k,
        |    sum(x::HUGEINT * vc) AS s_all,
        |    sum(greatest(0, least(ct, n - k) - greatest(prev, k))::HUGEINT * vc) AS s_trim
        |  FROM cc GROUP BY 1, 2, 3
        |), plo AS (SELECT event_type, min(vc) AS p_lo FROM cc WHERE ct >= k + 1 GROUP BY 1),
        |phi AS (SELECT event_type, min(vc) AS p_hi FROM cc WHERE ct >= n - k GROUP BY 1)
        |SELECT event_type, n, k AS n_trim_each,
        |  floor(s_all::DOUBLE / n::DOUBLE / 100 * 10000 + 0.5)/10000 AS mean_r4,
        |  CASE WHEN n - 2*k > 0 THEN
        |    floor(s_trim::DOUBLE / (n - 2*k)::DOUBLE / 100 * 10000 + 0.5)/10000
        |  END AS trimmed_r4,
        |  floor((s_trim + k::HUGEINT * p_lo + k::HUGEINT * p_hi)::DOUBLE
        |    / n::DOUBLE / 100 * 10000 + 0.5)/10000 AS winsor_r4
        |FROM kept JOIN plo USING (event_type) JOIN phi USING (event_type)""".stripMargin,
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
