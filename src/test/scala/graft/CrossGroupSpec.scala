package graft

import org.apache.spark.sql.functions._

import graft.queries.{AuditQueries, InsightQueries, StatTables}

/** Cross-group / drift decision families (round 13: q263
  * Kruskal-Wallis, q264 Jensen-Shannon, q265 mutual information /
  * G-test, q266 Friedman, q267 Cochran's Q, q268 Anderson-Darling,
  * q269 residual drill-down; round 14: q270 Benford, q272
  * Cramér–von Mises, q273 Bartlett): designed feeds with
  * hand-computed textbook answers, plus the boundary/degenerate
  * regimes the closings guard.
  */
class CrossGroupSpec extends SparkSpec {
  import spark.implicits._

  // ---- q263 Kruskal-Wallis ---------------------------------------
  test("kruskalWallis: three disjoint groups give the textbook H = 12.5 and reject") {
    // groups of 5 at cents 1-5, 11-15, 21-25: ranks 1-5/6-10/11-15,
    // H = 12/(15*16) * (15^2+40^2+65^2)/5 - 3*16 = 60.5 - 48 = 12.5
    val obs = ((1L to 5L).map(("a", _)) ++ (11L to 15L).map(("b", _)) ++
      (21L to 25L).map(("c", _))).toDF("gk", "vc")
    val r = InsightQueries.kruskalWallis(obs, "t").collect()(0)
    assert(r.getAs[Long]("k_groups") == 3L && r.getAs[Long]("n") == 15L)
    assert(r.getAs[Double]("h_r4") == 12.5)
    assert(r.getAs[Boolean]("reject")) // chi2_2(0.95) = 5.9915 < 12.5
  }

  test("kruskalWallis: identical group distributions give H = 0, no reject") {
    // each group is the multiset {10, 20, 30}: every mean rank equal,
    // so every deviation term is 0 regardless of the tie correction
    val obs = Seq("a", "b", "c")
      .flatMap(g => Seq(10L, 20L, 30L).map((g, _))).toDF("gk", "vc")
    val r = InsightQueries.kruskalWallis(obs, "t").collect()(0)
    assert(r.getAs[Double]("h_r4") == 0.0)
    assert(!r.getAs[Boolean]("reject"))
  }

  test("kruskalWallis: all values tied makes the correction 0 and the statistic null") {
    val obs = Seq(("a", 7L), ("a", 7L), ("b", 7L), ("b", 7L)).toDF("gk", "vc")
    val r = InsightQueries.kruskalWallis(obs, "t").collect()(0)
    assert(r.isNullAt(r.fieldIndex("h_r4")) && r.isNullAt(r.fieldIndex("reject")))
  }

  test("kruskalWallis: df past the 40-row chi2 table yields a NULL decision, statistic intact") {
    // 42 groups -> df 41, past the StatTables bound: h_r4 still
    // reported, reject NULL (the documented normal-approximation
    // handoff) — the q265 over-bound pin, applied to this consumer
    val obs = (1 to 42).flatMap(i =>
      Seq((s"g$i", i * 10L), (s"g$i", i * 10L + 1L))).toDF("gk", "vc")
    val r = InsightQueries.kruskalWallis(obs, "t").collect()(0)
    assert(r.getAs[Long]("k_groups") == 42L)
    assert(!r.isNullAt(r.fieldIndex("h_r4")))
    assert(r.isNullAt(r.fieldIndex("reject")))
  }

  // ---- q266 Friedman ----------------------------------------------
  test("friedman: a perfectly consistent within-day ordering gives Q = n(k-1) and rejects") {
    // 3 instruments, 4 complete days, A > B > C every day:
    // Q = n(k-1) = 8 > chi2_2(0.95) = 5.9915
    val cl = (1 to 4).flatMap(d =>
      Seq(("A", s"d$d", 30L), ("B", s"d$d", 20L), ("C", s"d$d", 10L)))
      .toDF("event_type", "day", "close_lv")
    val r = InsightQueries.friedman(cl).collect()(0)
    assert(r.getAs[Long]("k_types") == 3L && r.getAs[Long]("n_days") == 4L)
    assert(r.getAs[Double]("q_r4") == 8.0)
    assert(r.getAs[Boolean]("reject"))
  }

  test("friedman: incomplete days are dropped; all-tied days zero the denominator -> null") {
    // day d5 misses C (incomplete -> dropped), so the stats match the
    // 4 complete days exactly
    val cl = ((1 to 4).flatMap(d =>
      Seq(("A", s"d$d", 30L), ("B", s"d$d", 20L), ("C", s"d$d", 10L))) ++
      Seq(("A", "d5", 99L), ("B", "d5", 98L)))
      .toDF("event_type", "day", "close_lv")
    val r = InsightQueries.friedman(cl).collect()(0)
    assert(r.getAs[Long]("n_days") == 4L && r.getAs[Double]("q_r4") == 8.0)
    // every close ties within every day: den = 0 -> Q undefined
    val flat = (1 to 3).flatMap(d =>
      Seq(("A", s"d$d", 5L), ("B", s"d$d", 5L))).toDF("event_type", "day", "close_lv")
    val fr = InsightQueries.friedman(flat).collect()(0)
    assert(fr.isNullAt(fr.fieldIndex("q_r4")) && fr.isNullAt(fr.fieldIndex("reject")))
  }

  test("friedman: df past the 40-row chi2 table yields a NULL decision, statistic intact") {
    // 42 instruments with a consistent within-day ordering over 2
    // complete days -> df 41, past the StatTables bound: q_r4 still
    // reported (= n(k-1) = 82 for the perfectly consistent ordering),
    // reject NULL
    val cl = (1 to 2).flatMap(d => (1 to 42).map(i =>
      (s"I$i", s"d$d", 100L - i))).toDF("event_type", "day", "close_lv")
    val r = InsightQueries.friedman(cl).collect()(0)
    assert(r.getAs[Long]("k_types") == 42L && r.getAs[Long]("n_days") == 2L)
    assert(r.getAs[Double]("q_r4") == 82.0)
    assert(r.isNullAt(r.fieldIndex("reject")))
  }

  // ---- q267 Cochran's Q -------------------------------------------
  test("cochranQ: hand case Q = 6.0 sits just past the chi2_2 boundary and rejects") {
    // A up all 4 days (C=4), B never (0), C up 2 (2); R = (2,2,1,1):
    // Q = (k-1)(k*SC2 - SC^2)/(k*SR - SR2) = 2*(3*20-36)/(3*6-10) = 48/8 = 6
    // q4 = 60000 > 59915 (chi2_2(0.95) = 5.9915) -> reject by 0.0085
    val rets = Seq(
      ("A", "d1", 1L), ("A", "d2", 1L), ("A", "d3", 1L), ("A", "d4", 1L),
      ("B", "d1", -1L), ("B", "d2", -1L), ("B", "d3", -1L), ("B", "d4", -1L),
      ("C", "d1", 1L), ("C", "d2", 1L), ("C", "d3", -1L), ("C", "d4", -1L))
      .toDF("event_type", "day", "r_fp")
    val r = InsightQueries.cochranQ(rets).collect()(0)
    assert(r.getAs[Long]("k_types") == 3L && r.getAs[Long]("n_days") == 4L)
    assert(r.getAs[Long]("n_up") == 6L)
    assert(r.getAs[Double]("q_r4") == 6.0)
    assert(r.getAs[Boolean]("reject"))
  }

  test("cochranQ: equal up-rates give Q = 0; unanimous days alone null the statistic") {
    val eq = (1 to 4).flatMap(d => Seq(("A", s"d$d", if (d <= 2) 1L else -1L),
      ("B", s"d$d", if (d <= 2) 1L else -1L))).toDF("event_type", "day", "r_fp")
    val r = InsightQueries.cochranQ(eq).collect()(0)
    // every day unanimous (both up or both down): den = k*SR - SR2 =
    // 2*4 - (4+4) = 0 -> NULL even though the rates are equal
    assert(r.isNullAt(r.fieldIndex("q_r4")))
    // break one day's unanimity: Q defined, equal C_j -> Q = 0
    val eq2 = eq.union(Seq(("A", "d5", 1L), ("B", "d5", -1L),
      ("A", "d6", -1L), ("B", "d6", 1L)).toDF("event_type", "day", "r_fp"))
    val r2 = InsightQueries.cochranQ(eq2).collect()(0)
    assert(r2.getAs[Double]("q_r4") == 0.0 && !r2.getAs[Boolean]("reject"))
  }

  // ---- q264 Jensen-Shannon ---------------------------------------
  private def jsOf(rows: Seq[(String, String, Double)]) =
    AuditQueries.jsDrift(rows.toDF("event_type", "d", "value")
      .select(col("event_type"), to_date(col("d")).as("day"), col("value")))
      .collect().map(r => r.getAs[String]("event_type") ->
        r.getAs[Double]("js_r6")).toMap

  test("jsDrift: identical early/late distributions score 0; disjoint supports near 1 bit") {
    val pattern = Seq(1.0, 2.0, 4.0, 8.0)
    val same = (1 to 10).flatMap(d => pattern.map(v => ("x", f"2024-01-$d%02d", v))) ++
      (11 to 20).flatMap(d => pattern.map(v => ("x", f"2024-01-$d%02d", v)))
    assert(jsOf(same)("x") == 0.0)
    // early all at band 0, late all at band 10: JS -> 1 bit (smoothing keeps it under)
    val disj = (1 to 10).flatMap(d => (1 to 20).map(_ => ("x", f"2024-01-$d%02d", 1.5))) ++
      (11 to 20).flatMap(d => (1 to 20).map(_ => ("x", f"2024-01-$d%02d", 1500.0)))
    assert(jsOf(disj)("x") > 0.9 && jsOf(disj)("x") <= 1.0)
  }

  test("jsDrift: the score is symmetric in the two halves") {
    def feed(flip: Boolean) = (1 to 10).flatMap { d =>
      val (early, late) = (Seq(1.0, 1.0, 2.0), Seq(4.0, 8.0, 8.0))
      val vs = if ((d <= 5) != flip) early else late
      vs.map(v => ("x", f"2024-01-$d%02d", v))
    }
    assert(jsOf(feed(false))("x") == jsOf(feed(true))("x"))
  }

  // ---- q268 Anderson-Darling ---------------------------------------
  private def adOf(early: Seq[Double], late: Seq[Double]): Double = {
    val rows = early.map(v => ("x", "2024-01-01", v)) ++
      late.map(v => ("x", "2024-01-04", v))
    val df = rows.toDF("event_type", "d", "value")
      .select(col("event_type"), to_date(col("d")).as("day"), col("value"))
    val r = AuditQueries.andersonDarling(df).collect()(0)
    if (r.isNullAt(r.fieldIndex("ad_r6"))) Double.NaN else r.getAs[Double]("ad_r6")
  }

  test("andersonDarling: textbook A2akN values (exact-rational reference, r6-quantized)") {
    // reference values computed from Scholz & Stephens 1987 eq. 6 in
    // exact rational arithmetic:
    //   {1..5} vs {3..7}    -> 1.8551219512...  -> 1.855122
    //   {1..5} vs {6..10}   -> 4.0145207796...  -> 4.014521
    //   {1,1,2,2} vs {1,2,2,2} (heavy ties) -> 7/15 = 0.4666... -> 0.466667
    assert(adOf(Seq(1, 2, 3, 4, 5), Seq(3, 4, 5, 6, 7)) == 1.855122)
    assert(adOf(Seq(1, 2, 3, 4, 5), Seq(6, 7, 8, 9, 10)) == 4.014521)
    assert(adOf(Seq(1, 1, 2, 2), Seq(1, 2, 2, 2)) == 0.466667)
  }

  test("andersonDarling: a perfectly mirrored split is EXACTLY 0 (integer cancellation)") {
    assert(adOf(Seq(1, 2, 3), Seq(1, 2, 3)) == 0.0)
  }

  // ---- q265 mutual information ------------------------------------
  test("mutualInfo: an exactly independent table scores 0 bits, G = 0, no reject") {
    val obs = (for { r <- Seq("a", "b"); c <- Seq("x", "y"); _ <- 1 to 25 }
      yield (r, c)).toDF("rk", "ck")
    val m = AuditQueries.mutualInfo(obs, "t").collect()(0)
    assert(m.getAs[Double]("mi_bits_r6") == 0.0)
    assert(m.getAs[Double]("g_r4") == 0.0)
    assert(m.getAs[Long]("df") == 1L)
    assert(!m.getAs[Boolean]("reject"))
  }

  test("mutualInfo: a deterministic 4-level mapping scores exactly 2 bits and rejects") {
    // rk = ck uniform over 4 levels: MI = log2(4) = 2 bits;
    // G = 2 * 4 * 10 * ln 4 = 110.90355 -> quantizes to 110.9036,
    // far past chi2_9(0.95) = 16.919
    val obs = (for { l <- Seq("a", "b", "c", "d"); _ <- 1 to 10 }
      yield (l, l)).toDF("rk", "ck")
    val m = AuditQueries.mutualInfo(obs, "t").collect()(0)
    assert(m.getAs[Double]("mi_bits_r6") == 2.0)
    assert(m.getAs[Long]("df") == 9L)
    assert(math.abs(m.getAs[Double]("g_r4") - 110.9036) < 1e-9)
    assert(m.getAs[Boolean]("reject"))
  }

  test("mutualInfo: df past the 40-row chi2 table yields a NULL decision, score intact") {
    // 41 x 2 deterministic-ish grid: df = 40*1 = 40 is the last row;
    // 42 levels -> df 41 -> null reject
    val obs42 = (for { i <- 1 to 42; _ <- 1 to 3 }
      yield (s"r$i", if (i % 2 == 0) "x" else "y")).toDF("rk", "ck")
    val m = AuditQueries.mutualInfo(obs42, "t").collect()(0)
    assert(m.getAs[Long]("df") == 41L)
    assert(m.isNullAt(m.fieldIndex("reject")))
    assert(!m.isNullAt(m.fieldIndex("mi_bits_r6")))
  }

  // ---- q269 association residuals ----------------------------------
  test("assocResiduals: symmetric 2x2 gives +-10/sqrt(5) = +-4.4721 exactly; independence gives 0") {
    // counts 30/10/10/30: every e = 20, every adjustment (1-.5)(1-.5)
    // -> r = +-10/sqrt(5) = +-4.47213..., r4-quantized to +-4.4721
    val obs = (Seq.fill(30)(("a", "x")) ++ Seq.fill(10)(("a", "y")) ++
      Seq.fill(10)(("b", "x")) ++ Seq.fill(30)(("b", "y"))).toDF("rk", "ck")
    val rows = AuditQueries.assocResiduals(obs, "t").collect()
    assert(rows.length == 4)
    val m = rows.map(r => (r.getAs[String]("rk"), r.getAs[String]("ck")) ->
      r.getAs[Double]("resid_r4")).toMap
    assert(m(("a", "x")) == 4.4721 && m(("b", "y")) == 4.4721)
    assert(m(("a", "y")) == -4.4721 && m(("b", "x")) == -4.4721)
    assert(rows.forall(r => r.getAs[Double]("expected_r2") == 20.0))
    // ties in |r4| break by (rk, ck) — the total order the top-k cut needs
    assert(rows.map(r => (r.getAs[String]("rk"), r.getAs[String]("ck"))).toSeq ==
      Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")))
    val ind = (for { r <- Seq("a", "b"); c <- Seq("x", "y"); _ <- 1 to 25 }
      yield (r, c)).toDF("rk", "ck")
    assert(AuditQueries.assocResiduals(ind, "t").collect()
      .forall(_.getAs[Double]("resid_r4") == 0.0))
  }

  // ---- the shared chi2 table ---------------------------------------
  test("chi2 table: 40 rows, strictly increasing, textbook anchors") {
    assert(StatTables.Chi2Q95x1e4.size == 40)
    assert(StatTables.Chi2Q95x1e4.sliding(2).forall(p => p(0) < p(1)))
    assert(StatTables.Chi2Q95x1e4(0) == 38415L)  // 3.8415
    assert(StatTables.Chi2Q95x1e4(1) == 59915L)  // 5.9915
    assert(StatTables.Chi2Q95x1e4(9) == 183070L) // 18.3070
  }

  // ---- q270 Benford first-digit audit -------------------------------
  private def benOf(cents: Seq[Long]) =
    AuditQueries.benford(cents.toDF("vc"), "t").collect()
      .map(r => r.getAs[Int]("digit") -> r).toMap

  test("benford: a log-uniform sample keeps H0; a uniform-digit sample rejects") {
    // vc = 10^(i/100), i = 0..299 — three exact decades of log-uniform
    // mass, the distribution Benford's law IS; chi2 stays far under
    // the df-8 boundary 15.5073
    val logu = (0 until 300).map(i => math.pow(10d, i / 100d).round)
    val lu = benOf(logu)
    assert(lu.size == 9, "all nine digits materialize")
    assert(!lu(1).getAs[Boolean]("reject"))
    assert(lu(1).getAs[Double]("chi2_r4") < 15.5073)
    // 100 values per first digit: uniform digits are maximally
    // non-Benford at this n — rejects decisively
    val unif = (1L to 9L).flatMap(d => (0 until 100).map(_ => d * 100L))
    val uf = benOf(unif)
    assert(uf(1).getAs[Boolean]("reject"))
    assert(uf.values.forall(_.getAs[Long]("n_d") == 100L))
    // the expectation column IS the shared literal: digit 1 = 0.30103
    assert(uf(1).getAs[Double]("benford_r6") == 0.30103)
    assert(uf(9).getAs[Double]("benford_r6") == 0.045757)
  }

  test("benford: absent digits materialize with n_d = 0 and still carry the chi2") {
    // only digits 1 and 2 present: rows for 3..9 must exist at 0
    val two = benOf(Seq.fill(50)(10L) ++ Seq.fill(30)(20L))
    assert(two.size == 9)
    assert((3 to 9).forall(d => two(d).getAs[Long]("n_d") == 0L))
    assert(two(1).getAs[Long]("n_d") == 50L)
    val chis = two.values.map(_.getAs[Double]("chi2_r4")).toSet
    assert(chis.size == 1, "one relation-level chi2, replicated per digit row")
    assert(two(1).getAs[Boolean]("reject"))
    // shares sum to 1 at r6 resolution
    assert(math.abs(two.values.map(_.getAs[Double]("share_r6")).sum - 1.0) < 1e-4)
  }

  // ---- q272 Cramér–von Mises ----------------------------------------
  private def cvmOf(early: Seq[Double], late: Seq[Double]): Double = {
    val rows = early.map(v => ("x", "2024-01-01", v)) ++
      late.map(v => ("x", "2024-01-04", v))
    val df = rows.toDF("event_type", "d", "value")
      .select(col("event_type"), to_date(col("d")).as("day"), col("value"))
    val r = AuditQueries.cramerVonMises(df).collect()(0)
    if (r.isNullAt(r.fieldIndex("cvm_r6"))) Double.NaN else r.getAs[Double]("cvm_r6")
  }

  test("cramerVonMises: mirrored split is EXACTLY 0; disjoint {1,2}|{3,4} gives 0.375 by hand") {
    assert(cvmOf(Seq(5.0, 7.0, 9.0), Seq(5.0, 7.0, 9.0)) == 0.0,
      "identical halves cancel cell-by-cell in exact integers")
    // grid walk: d_v = 2,4,2,0 over the four cells, T = sum l*d^2 /
    // (n1*n2*N^2) = (4+16+4+0)/(2*2*16) = 24/64 = 0.375
    assert(cvmOf(Seq(1.0, 2.0), Seq(3.0, 4.0)) == 0.375)
    // one-sided feeds carry no score
    assert(cvmOf(Seq(1.0, 2.0), Seq.empty).isNaN)
  }

  test("cramerVonMises: agrees with AD on direction over the real feed, bounded by ~N") {
    val out = SparkEntry.queries("q272_cvm_drift")(spark, sf("sf0.001")).collect()
    assert(out.nonEmpty)
    out.filterNot(r => r.isNullAt(r.fieldIndex("cvm_r6"))).foreach { r =>
      assert(r.getAs[Double]("cvm_r6") >= 0.0)
    }
  }

  // ---- q273 Bartlett variance homogeneity ---------------------------
  private def bartOf(groups: Seq[(String, Seq[Long])]) = {
    val obs = groups.flatMap { case (g, vs) => vs.map((g, _)) }.toDF("gk", "vc")
    InsightQueries.bartlett(obs, "t").collect()(0)
  }

  test("bartlett: hand case {1,2,3} vs {2,4,6} gives b = 0.7141, keeps H0") {
    // num1 = 3*14-36 = 6 (S1^2 = 1, ln = 0); num2 = 3*56-144 = 24
    // (S2^2 = 4); sw = 2+8 = 10, sp2 = 2.5; lt2 = floor(2*ln(4)*1e6+0.5)
    // = 2772589; chi2num = 4*ln(2.5) - 2.772589; C = 1.25 -> b4 = 7141
    val r = bartOf(Seq("a" -> Seq(1L, 2L, 3L), "b" -> Seq(2L, 4L, 6L)))
    assert(r.getAs[Long]("k_groups") == 2L && r.getAs[Long]("n") == 6L)
    assert(r.getAs[Double]("b_r4") == 0.7141)
    assert(!r.getAs[Boolean]("reject")) // df 1 boundary 3.8415
  }

  test("bartlett: identical variances give exactly 0; a 1e4x variance gap rejects; zero variance nulls") {
    val eq = bartOf(Seq("a" -> Seq(1L, 2L, 3L), "b" -> Seq(11L, 12L, 13L)))
    assert(eq.getAs[Double]("b_r4") == 0.0 && !eq.getAs[Boolean]("reject"))
    val gap = bartOf(Seq("a" -> (1L to 10L),
      "b" -> (1L to 10L).map(_ * 100L)))
    assert(gap.getAs[Boolean]("reject"))
    val degen = bartOf(Seq("a" -> Seq(5L, 5L), "b" -> Seq(1L, 2L)))
    assert(degen.isNullAt(degen.fieldIndex("b_r4")))
    assert(degen.isNullAt(degen.fieldIndex("reject")))
  }

  // ---- q285 Jonckheere-Terpstra ordered trend -------------------------
  private def jtOf(groups: Seq[(Int, Seq[Long])], k: Int) = {
    val obs = groups.flatMap { case (g, vs) => vs.map((g, _)) }.toDF("gi", "vc")
    InsightQueries.jonckheere(obs, "t", k).collect().head
  }

  test("jonckheere: a perfectly ordered 3-group case gives z = 6/sqrt(6.3333) = 2.3842, trend up") {
    // {1,2} < {3,4} < {5,6}: J = 12 (max), mu = 6, no ties ->
    // var = (6*5*17 - 3*2*1*9)/72 = 456/72
    val r = jtOf(Seq(1 -> Seq(1L, 2L), 2 -> Seq(3L, 4L), 3 -> Seq(5L, 6L)), 3)
    assert(r.getAs[Long]("k_groups") == 3L && r.getAs[Long]("n") == 6L)
    assert(r.getAs[Double]("z_r4") == 2.3842)
    assert(r.getAs[Boolean]("inc_trend") && !r.getAs[Boolean]("dec_trend"))
  }

  test("jonckheere: the tie-corrected variance replays the hand case z = 1 exactly") {
    // g1 = {1,1}, g2 = {1,2}: J* = 2 + 2/2 = 3 (4J* = 12), mu4 = 8,
    // A = 156-36-66 = 54, fn3 = 0, term3 = 4*6/(8*4*3) -> var = 1.0
    val r = jtOf(Seq(1 -> Seq(1L, 1L), 2 -> Seq(1L, 2L)), 2)
    assert(r.getAs[Double]("z_r4") == 1.0)
    assert(!r.getAs[Boolean]("inc_trend"))
    // and the reversed order flips the sign exactly
    val d = jtOf(Seq(1 -> Seq(1L, 2L), 2 -> Seq(1L, 1L)), 2)
    assert(d.getAs[Double]("z_r4") == -1.0)
  }

  test("jonckheere: a strong decreasing trend fires dec_trend") {
    val r = jtOf(Seq(1 -> (20L to 29L), 2 -> (10L to 19L), 3 -> (0L to 9L)), 3)
    assert(r.getAs[Boolean]("dec_trend") && r.getAs[Double]("z_r4") < -1.6449)
  }

  test("jonckheere: degenerate contracts — empty feed zero rows, one group NULL, all-tied NULL") {
    // empty feed → the literal-relation groupBy emits ZERO rows on
    // both engines (the q273/q279 degenerate-parity contract)
    val empty = Seq.empty[(Int, Long)].toDF("gi", "vc")
    assert(InsightQueries.jonckheere(empty, "t", 5).collect().isEmpty)
    // every observation in ONE group of the 5-slot domain →
    // k_groups = 1 → a present row whose verdicts are all NULL
    val one = jtOf(Seq(1 -> Seq(1L, 2L, 3L, 4L)), 5)
    assert(one.getAs[Long]("k_groups") == 1L && one.getAs[Long]("n") == 4L)
    assert(one.isNullAt(one.fieldIndex("z_r4")) &&
      one.isNullAt(one.fieldIndex("inc_trend")) &&
      one.isNullAt(one.fieldIndex("dec_trend")))
    // an all-tied two-group feed: the Hollander-Wolfe tie correction
    // cancels the variance EXACTLY at n1 = n2 = 2 (term1 = −36/72,
    // term3 = +48/96, both exact in IEEE) → varJ = 0 → NULL, and the
    // guard never divides by it
    val tied = jtOf(Seq(1 -> Seq(7L, 7L), 2 -> Seq(7L, 7L)), 2)
    assert(tied.getAs[Long]("k_groups") == 2L)
    assert(tied.isNullAt(tied.fieldIndex("z_r4")) &&
      tied.isNullAt(tied.fieldIndex("inc_trend")))
  }

  // ---- q287 Dunn post-hoc ----------------------------------------
  private def dunnOf(groups: Seq[(String, Seq[Long])]) = {
    val obs = groups.flatMap { case (g, vs) => vs.map((g, _)) }.toDF("gk", "vc")
    InsightQueries.dunn(obs, "t").collect()
      .map(r => (r.getAs[String]("type_a"), r.getAs[String]("type_b")) -> r)
      .toMap
  }

  test("dunn: the q263 textbook three-group case gives the exact pairwise z's and Bonferroni calls") {
    // groups of 5 at cents 1-5 / 11-15 / 21-25 (q263's H = 12.5
    // feed): mean ranks 3/8/13, sigma_ij = sqrt(20 * 0.4) = 2.8284;
    // adjacent pairs z = -5/2.8284 = -1.7678 < zcrit(m=3) = 2.3940
    // -> keep, outer pair z = -3.5355 -> reject
    val g = dunnOf(Seq("a" -> (1L to 5L), "b" -> (11L to 15L),
      "c" -> (21L to 25L)))
    assert(g.size == 3)
    assert(g(("a", "b")).getAs[Double]("z_r4") == -1.7678)
    assert(!g(("a", "b")).getAs[Boolean]("reject"))
    assert(g(("b", "c")).getAs[Double]("z_r4") == -1.7678)
    assert(g(("a", "c")).getAs[Double]("z_r4") == -3.5355)
    assert(g(("a", "c")).getAs[Boolean]("reject"))
  }

  test("dunn: degenerate contracts — one group or an empty feed emit zero pair rows") {
    assert(dunnOf(Seq("a" -> (1L to 9L))).isEmpty)
    val empty = Seq.empty[(String, Long)].toDF("gk", "vc")
    assert(InsightQueries.dunn(empty, "t").collect().isEmpty)
  }

  // ---- q291 Page's L ordered trend -------------------------------
  private def pageOf(rows: Seq[(String, Int, Long)], k: Int) =
    InsightQueries.pageTrend(rows.toDF("day", "gi", "rev"), k, "t").collect()

  test("pageTrend: the single-block hand case lands on L = 14, z = 1.4142 exactly (and mirrored)") {
    // k = 3, one block, identity order: ranks 1,2,3 -> L = 14,
    // E = 12, sigma = sqrt(2) -> z = 2/(2*sqrt(2)) ... = 1.4142
    val up = pageOf(Seq(("d1", 1, 10L), ("d1", 2, 20L), ("d1", 3, 30L)), 3)
    assert(up.length == 1)
    assert(up(0).getAs[Double]("l_stat") == 14.0)
    assert(up(0).getAs[Double]("z_r4") == 1.4142)
    assert(!up(0).getAs[Boolean]("inc_trend"))
    val dn = pageOf(Seq(("d1", 1, 30L), ("d1", 2, 20L), ("d1", 3, 10L)), 3)
    assert(dn(0).getAs[Double]("l_stat") == 10.0)
    assert(dn(0).getAs[Double]("z_r4") == -1.4142)
  }

  test("pageTrend: eight lockstep blocks reject upward; incomplete blocks drop; empty feed zero rows") {
    // 8 identity blocks: L = 112, E = 96, sigma = 4 -> z = 4
    val rows = (1 to 8).flatMap(d =>
      Seq((s"d$d", 1, 10L), (s"d$d", 2, 20L), (s"d$d", 3, 30L))) ++
      Seq(("dX", 1, 5L), ("dX", 2, 6L)) // incomplete -> dropped
    val r = pageOf(rows, 3)
    assert(r(0).getAs[Long]("n_days") == 8L)
    assert(r(0).getAs[Double]("l_stat") == 112.0)
    assert(r(0).getAs[Double]("z_r4") == 4.0)
    assert(r(0).getAs[Boolean]("inc_trend") && !r(0).getAs[Boolean]("dec_trend"))
    assert(pageOf(Seq.empty, 3).isEmpty)
  }

  // ---- q288 Kendall's W ------------------------------------------
  test("kendallW: lockstep rankings give W = 1 and reject; a latin square gives W = 0") {
    // 3 instruments, 5 complete days, A > B > C every day: perfect
    // concordance, W = 1, Q = n(k-1) = 10 > 5.9915
    val lock = (1 to 5).flatMap(d =>
      Seq(("A", s"d$d", 30L), ("B", s"d$d", 20L), ("C", s"d$d", 10L)))
      .toDF("event_type", "day", "close_lv")
    val r = InsightQueries.kendallW(lock).collect().head
    assert(r.getAs[Long]("k_types") == 3L && r.getAs[Long]("n_days") == 5L)
    assert(r.getAs[Double]("w_r6") == 1.0)
    assert(r.getAs[Boolean]("reject"))
    // latin-square rotation: every instrument's rank sum is equal ->
    // zero concordance, W = 0, keep
    val rot = Seq(
      ("A", "d1", 10L), ("B", "d1", 20L), ("C", "d1", 30L),
      ("A", "d2", 30L), ("B", "d2", 10L), ("C", "d2", 20L),
      ("A", "d3", 20L), ("B", "d3", 30L), ("C", "d3", 10L))
      .toDF("event_type", "day", "close_lv")
    val r0 = InsightQueries.kendallW(rot).collect().head
    assert(r0.getAs[Double]("w_r6") == 0.0)
    assert(!r0.getAs[Boolean]("reject"))
  }

  // ---- q280 Brown-Forsythe spread test -------------------------------
  private def bfOf(groups: Seq[(String, Seq[Long])]) = {
    val obs = groups.flatMap { case (g, vs) => vs.map((g, _)) }.toDF("gk", "vc")
    InsightQueries.brownForsythe(obs, "t").collect()(0)
  }

  test("brownForsythe: identical spreads give W = 0; a constant-vs-wide pair gives W = 25 exactly") {
    val eq = bfOf(Seq("a" -> Seq(1L, 2L, 3L), "b" -> Seq(11L, 12L, 13L)))
    assert(eq.getAs[Double]("w_r4") == 0.0 && !eq.getAs[Boolean]("reject"))
    // a: ten constants (zero spread); b: 0,10,..,90 (median 40,
    // S_z=250, Q_z=8500): between = 3125, within = 2250,
    // W = 18 * 3125/2250 = 25.0 EXACTLY (b6/w6 = 25/18)
    val gap = bfOf(Seq("a" -> Seq.fill(10)(5L),
      "b" -> (0 until 10).map(_ * 10L)))
    assert(gap.getAs[Double]("w_r4") == 25.0)
    assert(gap.getAs[Boolean]("reject")) // (k-1)W = 250000 > 38415
  }

  test("brownForsythe: all-constant groups have zero within-spread -> NULL statistic") {
    val d = bfOf(Seq("a" -> Seq(5L, 5L, 5L), "b" -> Seq(9L, 9L, 9L)))
    assert(d.isNullAt(d.fieldIndex("w_r4")) && d.isNullAt(d.fieldIndex("reject")))
  }

  // ---- q279 Mood's median test --------------------------------------
  private def moodOf(groups: Seq[(String, Seq[Long])]) = {
    val obs = groups.flatMap { case (g, vs) => vs.map((g, _)) }.toDF("gk", "vc")
    InsightQueries.moodMedian(obs, "t").collect()
  }

  test("mood: perfect separation gives chi2 = N = 6 exactly and rejects") {
    // {1,2,3} vs {10,11,12}: N=6, lower median 3, all of b above ->
    // the 2x2 perfect-separation identity chi2 = N
    val r = moodOf(Seq("a" -> Seq(1L, 2L, 3L), "b" -> Seq(10L, 11L, 12L))).head
    assert(r.getAs[Long]("k_groups") == 2L && r.getAs[Long]("n") == 6L)
    assert(r.getAs[Long]("n_above") == 3L)
    assert(r.getAs[Double]("chi2_r4") == 6.0)
    assert(r.getAs[Boolean]("reject")) // df 1 boundary 3.8415
  }

  test("mood: tie-heavy hand case lands on the exact quantized cell sum; zero-above nulls") {
    // a={1,1,2}, b={1,2,2}: median 1, a_above=1, b_above=2 ->
    // per-group term 1/3 each, s6 = 666666, chi2_r4 = 0.6667
    val r = moodOf(Seq("a" -> Seq(1L, 1L, 2L), "b" -> Seq(1L, 2L, 2L))).head
    assert(r.getAs[Double]("chi2_r4") == 0.6667)
    assert(!r.getAs[Boolean]("reject"))
    // all values equal: nothing sits above the median -> c1 = 0,
    // every term undefined -> NULL statistic and decision
    val d = moodOf(Seq("a" -> Seq(5L, 5L), "b" -> Seq(5L, 5L))).head
    assert(d.isNullAt(d.fieldIndex("chi2_r4")) && d.isNullAt(d.fieldIndex("reject")))
  }

  test("mood: empty input emits ZERO rows (the bartlett degenerate-parity contract)") {
    val obs = Seq.empty[(String, Long)].toDF("gk", "vc")
    assert(InsightQueries.moodMedian(obs, "t").count() == 0L)
  }

  test("bartlett: all-singleton input (no group reaches ni >= 2) emits ZERO rows") {
    // The engine groups by lit(rel), so an input where every group is
    // filtered by the ni >= 2 gate produces an empty frame — and the
    // oracle now GROUPs BY the literal relation too (round-14 advice),
    // so both engines emit zero rows in this degenerate regime.
    val obs = Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("gk", "vc")
    assert(InsightQueries.bartlett(obs, "t").count() == 0L)
  }

  test("bartlett: df past the 40-row chi2 table yields a NULL decision, statistic intact") {
    // 42 groups of {g, g+1, g+2} -> df 41: b_r4 reported, reject NULL
    val r = bartOf((1 to 42).map(i => s"g$i" -> Seq(i * 10L, i * 10L + 1L, i * 10L + 2L)))
    assert(r.getAs[Long]("k_groups") == 42L)
    assert(!r.isNullAt(r.fieldIndex("b_r4")))
    assert(r.isNullAt(r.fieldIndex("reject")))
  }
}
