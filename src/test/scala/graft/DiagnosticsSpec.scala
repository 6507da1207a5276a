package graft

import org.apache.spark.sql.functions._

import graft.queries.{GovernQueries, InsightQueries, MarketQueries}

/** Round-13 diagnostics family (q257–q262): designed feeds with
  * hand-computed answers for Jarque-Bera, the runs test,
  * Mann-Kendall, the trimmed/winsorized means, and the Lorenz decile
  * table, plus real-feed invariants.
  */
class DiagnosticsSpec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sf())
  private def day(i: Int) = java.sql.Date.valueOf(
    java.time.LocalDate.of(2024, 1, 1).plusDays(i.toLong))

  // ---- q257 Jarque-Bera --------------------------------------------
  test("q257: alternating two-point returns pin skew 0 / kurtosis -2 exactly; an outlier flips reject") {
    // ±1 alternating: mu3 = 0 (skew 0), mu4/mu2^2 = 1 (excess -2);
    // jb_fp = n(4*0 + 20000^2) = 20 * 4e8 = 8e9 < 14379516000 -> keep
    val sym = (0 until 20).map(i => ("S", day(i), if (i % 2 == 0) 1L else -1L))
      .toDF("event_type", "day", "r_fp")
    val g = MarketQueries.jarqueBera(sym).collect().head
    assert(g.getAs[Double]("skew_r4") == 0.0)
    assert(g.getAs[Double]("kurt_x_r4") == -2.0)
    assert(!g.getAs[Boolean]("reject"), "two-point symmetric stays under the chi2 boundary")
    // one 100x outlier among zeros: extreme skew + kurtosis -> reject
    val skw = ((0 until 19).map(i => ("K", day(i), 1L + (i % 2))) :+
      (("K", day(19), 1000L))).toDF("event_type", "day", "r_fp")
    val k = MarketQueries.jarqueBera(skw).collect().head
    assert(k.getAs[Boolean]("reject"), "a planted outlier must reject normality")
    assert(k.getAs[Double]("skew_r4") > 3.0)
  }

  test("q257 on testdata: jb >= 0, reject consistent with the exact integer boundary") {
    val out = q("q257_jarque_bera").collect()
    assert(out.nonEmpty)
    out.filterNot(r => r.isNullAt(r.fieldIndex("jb_r4"))).foreach { r =>
      val jb = r.getAs[Double]("jb_r4")
      assert(jb >= 0.0)
      if (math.abs(jb - 5.9915) > 1e-3)
        assert(r.getAs[Boolean]("reject") == (jb > 5.9915),
          "reject must agree with the quantized boundary away from the knife edge")
    }
  }

  // ---- q258 runs test ----------------------------------------------
  test("q258: perfectly alternating signs reject with z > 0; two blocks reject with z < 0; one-sided feed has no z") {
    val alt = (0 until 20).map(i => ("A", day(i), if (i % 2 == 0) 5L else -5L))
      .toDF("event_type", "day", "r_fp")
    val a = MarketQueries.runsTest(alt).collect().head
    assert(a.getAs[Long]("n_runs") == 20L && a.getAs[Long]("n_pos") == 10L)
    assert(a.getAs[Double]("z_r4") > 4.0 && a.getAs[Boolean]("reject"),
      "20 runs from 20 signs is maximal flip-flopping")
    val blocks = ((0 until 5).map(i => ("B", day(i), 1L)) ++
      (5 until 10).map(i => ("B", day(i), -1L))).toDF("event_type", "day", "r_fp")
    val b = MarketQueries.runsTest(blocks).collect().head
    assert(b.getAs[Long]("n_runs") == 2L)
    assert(b.getAs[Double]("z_r4") < -1.96 && b.getAs[Boolean]("reject"),
      "two runs from ten signs is maximal momentum")
    // all-positive: n_neg = 0 -> variance 0 -> no decision (and zero
    // returns drop entirely, the textbook convention)
    val oneSided = ((0 until 6).map(i => ("C", day(i), 2L)) :+ (("C", day(6), 0L)))
      .toDF("event_type", "day", "r_fp")
    val c = MarketQueries.runsTest(oneSided).collect().head
    assert(c.getAs[Long]("n_pos") == 6L && c.getAs[Long]("n_neg") == 0L)
    assert(c.isNullAt(c.fieldIndex("z_r4")) && c.isNullAt(c.fieldIndex("reject")))
  }

  // ---- q259 Mann-Kendall -------------------------------------------
  test("q259: strictly monotone closes pin S = C(n,2) and reject; constant closes have zero variance") {
    val up = (0 until 10).map(i => ("U", day(i), 1000L + i))
      .toDF("event_type", "day", "close_lv")
    val u = MarketQueries.mannKendall(up).collect().head
    assert(u.getAs[Long]("s_stat") == 45L, "strictly increasing: S = C(10,2)")
    // var = 10*9*25/18 = 125, z = 44/sqrt(125) = 3.9355 -> reject
    assert(u.getAs[Double]("z_r4") > 3.9 && u.getAs[Double]("z_r4") < 3.94)
    assert(u.getAs[Boolean]("reject"))
    val down = (0 until 10).map(i => ("D", day(i), 1000L - i))
      .toDF("event_type", "day", "close_lv")
    val d = MarketQueries.mannKendall(down).collect().head
    assert(d.getAs[Long]("s_stat") == -45L && d.getAs[Double]("z_r4") < -3.9)
    val flat = (0 until 10).map(i => ("F", day(i), 7L))
      .toDF("event_type", "day", "close_lv")
    val f = MarketQueries.mannKendall(flat).collect().head
    assert(f.getAs[Long]("s_stat") == 0L)
    assert(f.isNullAt(f.fieldIndex("z_r4")),
      "all-tie series: the tie term cancels the variance exactly")
  }

  test("q259 on testdata: S bounded by C(n,2), decision matches Theil-Sen's sign on strong trends") {
    val out = q("q259_mann_kendall").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val n = r.getAs[Long]("n_days")
      assert(math.abs(r.getAs[Long]("s_stat")) <= n * (n - 1) / 2)
    }
  }

  // ---- q261 Hurst R/S ----------------------------------------------
  test("q261: alternating returns pin R/S = 1 at every size (H = 0); a linear ramp reads H ~ 1; constant series degenerates") {
    // ±1 alternating, even blocks: block sum 0, devs = m*{1,0,...},
    // range m, variance m^2 -> R/S = 1 exactly at every size -> all
    // log2 points 0 -> slope exactly 0
    val alt = (0 until 64).map(i => ("A", day(i), if (i % 2 == 0) 1L else -1L))
      .toDF("event_type", "day", "r_fp")
    val a = MarketQueries.hurstRs(alt).collect().head
    assert(a.getAs[Long]("n_sizes") == 4L)
    Seq("rs4_r6", "rs8_r6", "rs16_r6", "rs32_r6").foreach(c =>
      assert(a.getAs[Double](c) == 1.0, s"$c must be exactly 1"))
    assert(a.getAs[Double]("hurst_r4") == 0.0)
    // a pure ramp: every block is a shifted 1..m ramp, R/S grows ~ m
    // (R = m^2/8, S = sqrt((m^2-1)/12)) -> slope ~ 1
    val ramp = (0 until 64).map(i => ("R", day(i), (i + 1).toLong))
      .toDF("event_type", "day", "r_fp")
    val r = MarketQueries.hurstRs(ramp).collect().head
    assert(math.abs(r.getAs[Double]("rs4_r6") - 1.788854) < 1e-6,
      "rs(4) = 2/sqrt(1.25) quantized")
    assert(r.getAs[Double]("hurst_r4") > 0.9 && r.getAs[Double]("hurst_r4") < 1.05)
    // constant returns: every block has zero variance -> no surviving
    // size, no H
    val flat = (0 until 64).map(i => ("F", day(i), 5L))
      .toDF("event_type", "day", "r_fp")
    val f = MarketQueries.hurstRs(flat).collect().head
    assert(f.getAs[Long]("n_sizes") == 0L)
    assert(f.isNullAt(f.fieldIndex("hurst_r4")))
  }

  test("q261 on testdata: rs positive per surviving size, H in a sane band when defined") {
    val out = q("q261_hurst_rs").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      Seq("rs4_r6", "rs8_r6", "rs16_r6", "rs32_r6").foreach { c =>
        if (!r.isNullAt(r.fieldIndex(c))) assert(r.getAs[Double](c) > 0.0)
      }
      if (!r.isNullAt(r.fieldIndex("hurst_r4"))) {
        val h = r.getAs[Double]("hurst_r4")
        assert(h > -0.5 && h < 1.5)
      }
    }
  }

  // ---- q260 trimmed/winsorized means -------------------------------
  test("q260: a planted outlier moves the raw mean but neither robust mean (hand-computed)") {
    // values 1..19 plus one 100: n = 20, k = 1 -> trim drops {1, 100}
    // (mean 189/18 = 10.5); winsorize clamps them to {2, 19}
    // (mean 210/20 = 10.5); the raw mean is dragged to 14.5
    val e = ((1 to 19).map(v => ("X", v.toDouble)) :+ (("X", 100.0)))
      .toDF("event_type", "value")
    val g = InsightQueries.trimmedFromGrid(InsightQueries.madGrid(e)).collect().head
    assert(g.getAs[Long]("n") == 20L && g.getAs[Long]("n_trim_each") == 1L)
    assert(g.getAs[Double]("mean_r4") == 14.5)
    assert(g.getAs[Double]("trimmed_r4") == 10.5)
    assert(g.getAs[Double]("winsor_r4") == 10.5)
  }

  test("q260: ties across the trim boundary keep exact rank-range mass (even k, duplicated extremes)") {
    // 40 values: 1 appears 3x, 50 appears 3x, 2..35 once each; k = 2
    // -> trim drops exactly two 1s and two 50s (partial-cell overlap)
    val e = (Seq.fill(3)(1.0) ++ (2 to 35).map(_.toDouble) ++ Seq.fill(3)(50.0))
      .map(("T", _)).toDF("event_type", "value")
    val g = InsightQueries.trimmedFromGrid(InsightQueries.madGrid(e)).collect().head
    assert(g.getAs[Long]("n") == 40L && g.getAs[Long]("n_trim_each") == 2L)
    // kept mass: one 1, all of 2..35, one 50 -> (1 + 629 + 50)/36
    val want = math.floor((1.0 + (2 to 35).sum + 50.0) / 36.0 * 1e4 + 0.5) / 1e4
    assert(g.getAs[Double]("trimmed_r4") == want)
    // winsorized: the two dropped 1s become 1 (x_(k+1) = 1 itself!),
    // the two dropped 50s become 50 -> winsor mean = raw mean here
    assert(g.getAs[Double]("winsor_r4") == g.getAs[Double]("mean_r4"))
  }

  test("q260 on testdata: trimmed between min/max, winsor between trimmed-direction bounds; one row per type") {
    val out = q("q260_trimmed_means").cache()
    assert(out.filter($"trimmed_r4".isNull).isEmpty)
    assert(out.groupBy($"event_type").count().filter($"count" > 1).isEmpty)
    assert(out.count() > 0)
    out.unpersist()
  }

  // ---- q262 Lorenz deciles -----------------------------------------
  test("q262: ten one-order customers pin every decile share; a zero-order customer lands in decile 1") {
    def cust(n: Int) = (1 to n).map(i => Tuple1(i.toLong)).toDF("c_custkey")
    val ords = (1 to 10).map(i => (i.toLong, i.toLong, BigDecimal(i)))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val ten = GovernQueries.lorenzDeciles(cust(10), ords)
      .collect().map(r => r.getAs[Long]("bucket") -> r).toMap
    assert(ten.size == 11)
    assert(ten(1L).getAs[Double]("share_r6") == 0.018182, "1/55 r6")
    assert(ten(10L).getAs[Double]("share_r6") == 0.181818, "10/55 r6")
    assert(ten(10L).getAs[Double]("cum_share_r6") == 1.0)
    assert(ten(101L).getAs[Long]("n_members") == 1L, "top 1% of 10 = ceil(0.1) = 1 whale")
    assert(ten(101L).getAs[Double]("share_r6") == 0.181818)
    assert(ten(101L).isNullAt(ten(101L).fieldIndex("cum_share_r6")))
    assert((1L to 10L).map(ten(_).getAs[Long]("n_members")).sum == 10L)
    // an 11th customer with NO orders is a zero-revenue member: it
    // occupies rank 1, so decile 1 carries zero revenue share
    val eleven = GovernQueries.lorenzDeciles(cust(11), ords)
      .collect().map(r => r.getAs[Long]("bucket") -> r).toMap
    assert((1L to 10L).map(eleven(_).getAs[Long]("n_members")).sum == 11L)
    assert(eleven(1L).getAs[Double]("share_r6") == 0.0)
    assert(eleven(1L).getAs[Double]("rev_r2") == 0.0)
  }

  test("q262 on testdata: shares sum to 1, cumulative share is monotone, members sum to customer count") {
    val rows = q("q262_lorenz_deciles").collect().sortBy(_.getAs[Long]("bucket"))
    val dec = rows.filter(_.getAs[Long]("bucket") <= 10L)
    assert(dec.length == 10 && rows.length == 11)
    assert(math.abs(dec.map(_.getAs[Double]("share_r6")).sum - 1.0) < 1e-4)
    val cums = dec.map(_.getAs[Double]("cum_share_r6"))
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b })
    assert(cums.last == 1.0)
    val nCust = graft.core.Tables.customer(spark, sf()).count()
    assert(dec.map(_.getAs[Long]("n_members")).sum == nCust)
  }

  // ---- q271 Pettitt change point ------------------------------------
  private def pett(rows: Seq[(String, java.sql.Date, Long)]) =
    MarketQueries.pettitt(rows.toDF("event_type", "day", "close_lv"))
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap

  test("pettitt: a clean level shift pins K = n1*n2 and the last pre-shift day") {
    // 5 low days then 5 high: U_t = 5t up to t=5 then 5(10-t) —
    // K = 25 at t = 5, change day = day(4); p = min(1, 2e^{-3750/1100})
    // = 0.0662 >= 0.05 -> n = 10 is too small to reject
    val shift = (0 until 5).map(i => ("S", day(i), 10L)) ++
      (5 until 10).map(i => ("S", day(i), 20L))
    val s = pett(shift)("S")
    assert(s.getAs[Long]("k_stat") == 25L)
    assert(s.getAs[java.sql.Date]("change_day") == day(4))
    val p = math.min(1.0, 2.0 * math.exp(-6.0 * 25.0 * 25.0 / (1000.0 + 100.0)))
    assert(s.getAs[Double]("p_r4") == math.floor(p * 1e4 + 0.5) / 1e4)
    assert(!s.getAs[Boolean]("reject"))
    // 20+20 days: K = 400, p ~ 8.8e-7 -> reject, same change-day rule
    val big = (0 until 20).map(i => ("B", day(i), 10L)) ++
      (20 until 40).map(i => ("B", day(i), 20L))
    val b = pett(big)("B")
    assert(b.getAs[Long]("k_stat") == 400L)
    assert(b.getAs[java.sql.Date]("change_day") == day(19))
    assert(b.getAs[Boolean]("reject"))
  }

  test("pettitt: a flat series has K = 0, p = 1, first day as the deterministic argmax") {
    val flat = (0 until 6).map(i => ("F", day(i), 7L))
    val f = pett(flat)("F")
    assert(f.getAs[Long]("k_stat") == 0L)
    assert(f.getAs[Double]("p_r4") == 1.0)
    assert(!f.getAs[Boolean]("reject"))
    assert(f.getAs[java.sql.Date]("change_day") == day(0))
  }

  test("q271 on testdata: K bounded by C(n,2), change day inside the observed range") {
    val out = q("q271_pettitt").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val n = r.getAs[Long]("n_days")
      val k = r.getAs[Long]("k_stat")
      assert(k >= 0 && k <= n * (n - 1) / 2)
      assert(!r.isNullAt(r.fieldIndex("change_day")))
      val p = r.getAs[Double]("p_r4")
      assert(p >= 0.0 && p <= 1.0)
      assert(r.getAs[Boolean]("reject") == (p < 0.05) ||
        math.abs(p - 0.05) < 1e-9)
    }
  }

  // ---- q274 von Neumann ratio ---------------------------------------
  private def vnOf(rets: Seq[Long]) = {
    val rows = rets.zipWithIndex.map { case (r, i) => ("V", day(i), r) }
    MarketQueries.vonNeumann(rows.toDF("event_type", "day", "r_fp"))
      .collect().head
  }

  test("vonNeumann: hand cases — alternating 3.6 rejects high, trend 0.1091 rejects low, balanced keeps") {
    // +-1 alternating, n = 10: num = 9*4 = 36, den = 10*10 = 100,
    // VN = 10*36/100 = 3.6; z = 1.6/sqrt(32/99) = 2.8142 -> reject
    val alt = vnOf((0 until 10).map(i => if (i % 2 == 0) 1L else -1L))
    assert(alt.getAs[Double]("vn_r4") == 3.6)
    assert(alt.getAs[Boolean]("reject"))
    assert(alt.getAs[Double]("z_r4") > 0)
    // 1..10 ramp: num = 9, den = 10*385 - 55^2 = 825, VN = 90/825
    val ramp = vnOf((1L to 10L))
    assert(ramp.getAs[Double]("vn_r4") == 0.1091)
    assert(ramp.getAs[Boolean]("reject"))
    assert(ramp.getAs[Double]("z_r4") < 0)
    // ++--++--++: num = 160/... VN = 10*16/96 = 1.6667 -> keep
    val bal = vnOf(Seq(1L, 1L, -1L, -1L, 1L, 1L, -1L, -1L, 1L, 1L))
    assert(bal.getAs[Double]("vn_r4") == 1.6667)
    assert(!bal.getAs[Boolean]("reject"))
  }

  test("vonNeumann: a constant series has zero variance -> NULL statistic") {
    val f = vnOf(Seq.fill(8)(3L))
    assert(f.isNullAt(f.fieldIndex("vn_r4")) && f.isNullAt(f.fieldIndex("reject")))
  }

  // ---- q276 KPSS level stationarity -----------------------------------
  private def kpssOf(closes: Seq[Long]) = {
    val rows = closes.zipWithIndex.map { case (c, i) => ("K", day(i), c) }
    MarketQueries.kpss(rows.toDF("event_type", "day", "close_lv"))
      .collect().head
  }

  test("kpss: hand case [1,2,3,4] gives exactly 0.34; a long trend rejects; alternation keeps") {
    // n=4, S=10, y=[-6,-2,2,6], cums [-6,-8,-6,0] -> ssq = 136;
    // l = min(3, floor(4*(0.04)^0.25)) = 1; g0 = 80, dsum = 1*20 = 20,
    // D' = 2*80 + 2*20 = 200; eta = 136*2/(4*200) = 0.34 exactly
    val h = kpssOf(Seq(1L, 2L, 3L, 4L))
    assert(h.getAs[Long]("n_days") == 4L && h.getAs[Int]("lag_l") == 1)
    assert(h.getAs[Double]("eta_r4") == 0.34)
    assert(!h.getAs[Boolean]("reject"))
    // a deterministic 100-day ramp: partial sums grow ~n^2, eta >> 0.463
    val ramp = kpssOf((1L to 100L).map(_ * 1000L))
    assert(ramp.getAs[Boolean]("reject"), "a level trend must reject level stationarity")
    // stationary alternation around a constant level: eta far under
    val alt = kpssOf((0 until 20).map(i => if (i % 2 == 0) 1000L else 2000L))
    assert(!alt.getAs[Boolean]("reject"))
    assert(alt.getAs[Double]("eta_r4") < 0.4630)
  }

  test("kpss: a constant series has zero long-run variance -> NULL statistic") {
    val f = kpssOf(Seq.fill(10)(7L))
    assert(f.isNullAt(f.fieldIndex("eta_r4")) && f.isNullAt(f.fieldIndex("reject")))
  }

  // ---- q277 Dickey-Fuller ---------------------------------------------
  private def dfOf(closes: Seq[Long]) = {
    val rows = closes.zipWithIndex.map { case (c, i) => ("D", day(i), c) }
    MarketQueries.dickeyFuller(rows.toDF("event_type", "day", "close_lv"))
      .collect().head
  }

  test("dickeyFuller: hand case [4,1,3,2] gives rho = -1.642857, tau = -13.2791, rejects the unit root") {
    // pairs (x_{t-1}, dx): (4,-3),(1,2),(3,-1): m=3, Sxx=14, Syy=38,
    // Sxy=-23; tau = -23*sqrt(1)/sqrt(532-529) = -23/sqrt(3)
    val h = dfOf(Seq(4L, 1L, 3L, 2L))
    assert(h.getAs[Long]("n_days") == 4L)
    assert(h.getAs[Double]("rho_r6") == -1.642857)
    assert(h.getAs[Double]("tau_r4") == -13.2791)
    assert(h.getAs[Boolean]("reject_unit_root"))
  }

  test("dickeyFuller: a deterministic ramp is a PERFECT fit (gap 0) -> NULL; flat series NULL") {
    // dy constant -> Syy's centered form is 0 and Cauchy-Schwarz is
    // tight: the regression has no residual, tau undefined
    val ramp = dfOf((1L to 30L).map(_ * 10L))
    assert(ramp.isNullAt(ramp.fieldIndex("tau_r4")))
    assert(ramp.isNullAt(ramp.fieldIndex("reject_unit_root")))
    // sxx = 0 on a constant series (every lag equals the mean): the
    // documented NULL contract, spec-locked (round-14 Next #8)
    val flat = dfOf(Seq.fill(10)(5L))
    assert(flat.isNullAt(flat.fieldIndex("tau_r4")))
    assert(flat.isNullAt(flat.fieldIndex("reject_unit_root")))
  }

  test("q277 on testdata: decision agrees with the quantized boundary; KPSS/DF read together") {
    val out = q("q277_dickey_fuller").collect()
    assert(out.nonEmpty)
    out.filterNot(r => r.isNullAt(r.fieldIndex("tau_r4"))).foreach { r =>
      val t = r.getAs[Double]("tau_r4")
      assert(r.getAs[Boolean]("reject_unit_root") == (t < -2.86) ||
        math.abs(t + 2.86) < 1e-9)
    }
  }

  // ---- q275 turning points ------------------------------------------
  private def tpOf(closes: Seq[Long]) = {
    val rows = closes.zipWithIndex.map { case (c, i) => ("T", day(i), c) }
    MarketQueries.turningPoints(rows.toDF("event_type", "day", "close_lv"))
      .collect().head
  }

  test("turningPoints: alternating = n-2 rejects high, monotone = 0 rejects low, ties are not turns") {
    // n = 10 alternating: every interior point is a strict extremum,
    // T = 8; E = 16/3, Var = 131/90, z = (8 - 5.3333)/1.2065 = 2.2103
    val alt = tpOf((0 until 10).map(i => if (i % 2 == 0) 10L else 20L))
    assert(alt.getAs[Long]("t_stat") == 8L)
    assert(alt.getAs[Boolean]("reject"))
    // strictly increasing: T = 0, z strongly negative
    val mono = tpOf((1L to 10L).map(_ * 10L))
    assert(mono.getAs[Long]("t_stat") == 0L)
    assert(mono.getAs[Boolean]("reject") && mono.getAs[Double]("z_r4") < 0)
    // a flat plateau inside a rise: tie products are 0, not turns
    val tie = tpOf(Seq(10L, 20L, 20L, 30L, 25L, 40L))
    assert(tie.getAs[Long]("t_stat") == 2L, "only the strict 30-peak and 25-trough count")
  }

  // ---- q284 Wilcoxon signed-rank AM/PM ---------------------------------
  private def ampmTicks(typ: String, dayIdx: Int,
                        ticks: Seq[(Int, Double)]): Seq[(String, java.sql.Timestamp, Long, Double)] = {
    val base = java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime +
      dayIdx * 86400000L
    ticks.zipWithIndex.map { case ((h, v), i) =>
      (typ, new java.sql.Timestamp(base + h * 3600000L), dayIdx * 100L + i, v)
    }
  }

  test("wilcoxonAmPm: hand-built AM/PM days give the exact doubled-rank z; zero and AM-less days drop") {
    // d(day) = close + open - 2*mid in cents: days with d = +1,-2,+3,-4,+5
    // -> 2W+ = 18, mu2 = 15, v12 = 660, z = 3/sqrt(55) = 0.4045
    val ds = Seq(1, -2, 3, -4, 5)
    val rows = ds.zipWithIndex.flatMap { case (d, i) =>
      ampmTicks("A", i, Seq(9 -> 10.00, 11 -> 10.00, 15 -> (10.00 + d / 100.0)))
    } ++
      ampmTicks("A", 5, Seq(9 -> 10.00, 11 -> 10.00, 15 -> 10.00)) ++ // d = 0 drops
      ampmTicks("A", 6, Seq(13 -> 10.00, 15 -> 12.00)) ++             // no AM tick drops
      // type B: ties in |d| = {+1, +1, -1} -> 2W+ = 8, mu2 = 6,
      // v12 = 168 - 24 = 144, z = 2/12 * ... = 2/sqrt(12) = 0.5774
      Seq(1, 1, -1).zipWithIndex.flatMap { case (d, i) =>
        ampmTicks("B", i, Seq(9 -> 10.00, 11 -> 10.00, 15 -> (10.00 + d / 100.0)))
      }
    val ev = rows.toDF("event_type", "ts", "event_id", "value")
    val got = MarketQueries.wilcoxonAmPm(ev).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val a = got("A")
    assert(a.getAs[Long]("n_eff") == 5L && a.getAs[Long]("n_pos") == 3L)
    assert(a.getAs[Double]("z_r4") == 0.4045)
    assert(!a.getAs[Boolean]("reject_sym"))
    val b = got("B")
    assert(b.getAs[Long]("n_eff") == 3L && b.getAs[Long]("n_pos") == 2L)
    assert(b.getAs[Double]("z_r4") == 0.5774)
    assert(!b.getAs[Boolean]("reject_sym"))
  }

  test("wilcoxonAmPm: a one-sided PM drift rejects symmetry") {
    // 12 days, d strictly positive and distinct -> 2W+ = n(n+1),
    // z = sqrt(3n(n+1)/(2n+1)) = sqrt(468/25) = 4.3267 > 1.96
    val rows = (0 until 12).flatMap { i =>
      ampmTicks("C", i, Seq(9 -> 10.00, 11 -> 10.00, 15 -> (10.01 + i / 100.0)))
    }
    val c = MarketQueries.wilcoxonAmPm(rows.toDF("event_type", "ts", "event_id", "value"))
      .collect().head
    assert(c.getAs[Long]("n_pos") == 12L)
    assert(c.getAs[Boolean]("reject_sym") && c.getAs[Double]("z_r4") > 1.96)
  }
}
