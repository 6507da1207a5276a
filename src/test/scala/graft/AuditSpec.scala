package graft

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.queries.AuditQueries

/** Distribution-audit + analytics surface (q229–q244): phonetic-key
  * unit vectors (cross-checked against the identical DuckDB chain),
  * PSI/KS designed drift feeds, Cramér's V on perfectly-associated
  * vs independent tables, HLL accuracy incl. the linear-counting
  * branch, FD g3 and quantile-norm pins, from-first-principles
  * replays of the Holt-Winters and GARCH recursions, an exact
  * power-law Zipf feed, hand-counted readability, the textbook A/B
  * z-test, entropy-rate coin flips, cohort LTV accumulation,
  * reconciliation buckets, and DAU/MAU stickiness.
  */
class AuditSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------- phonKey
  test("phonetic key matches the classic Soundex vectors (shared DuckDB chain)") {
    val got = Seq("robert", "rupert", "ashcraft", "tymczak", "pfister",
      "honeyman", "s17", "a", "connect", "konnect")
      .toDF("w")
      .select(col("w"), AuditQueries.phonKey(col("w")).as("k"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // DuckDB replay of the identical translate/collapse/strip chain
    // produced exactly these (classic Soundex agrees on the alpha ones).
    assert(got("robert") == "R163" && got("rupert") == "R163")
    assert(got("ashcraft") == "A226") // h separates the two 2s in this variant
    assert(got("tymczak") == "T522")
    assert(got("pfister") == "P236")
    assert(got("honeyman") == "H555")
    assert(got("s17") == "S000") // digits are class 0: the q218 salt block
    assert(got("a") == "A000")
    // the q218 motivation: spelling variants a 2-char prefix separates
    // land in DIFFERENT phonetic blocks only via their head letter
    assert(got("connect") == "C523" && got("konnect") == "K523")
  }

  test("phonetic blocking pairs spelling variants the prefix blocker separates") {
    val docs = Seq(
      (1L, "please konnect the red cable"),
      (2L, "please connect the red cable"),
      (3L, "totally unrelated words here")
    ).toDF("doc_id", "text")
    val m = AuditQueries.phoneticMatch(docs)
      .select("phrase_a", "phrase_b").as[(String, String)].collect().toSet
    // "konnect the" vs "connect the": phon(konnect)=K523 != C523 =
    // phon(connect) — heads differ — but "please konnect"/"please
    // connect" share block P420 and pass JW >= 0.85.
    assert(m.contains(("please connect", "please konnect")))
  }

  // ------------------------------------------------------------- q229 PSI
  private def psiOf(rows: Seq[(String, Date, Double)]): Map[String, Double] =
    AuditQueries.psiDrift(rows.toDF("event_type", "day", "value"))
      .select("event_type", "psi_r6").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap

  test("PSI: identical early/late distributions score ~0; a hard shift scores large") {
    val d = (0 until 20).map(i => Date.valueOf(f"2024-01-${i + 1}%02d"))
    // 'stable': same values (two log2 bands) in both halves.
    // 'shifted': band 3 early (value 8..15), band 6 late (value 64..127).
    val stable = (0 until 20).flatMap(i => Seq(
      ("stable", d(i), 10.0), ("stable", d(i), 100.0)))
    val shifted = (0 until 20).map { i =>
      ("shifted", d(i), if (i < 10) 10.0 else 100.0)
    }
    val psi = psiOf(stable ++ shifted)
    assert(psi("stable") == 0.0)
    assert(psi("shifted") > 1.0, s"hard shift should be >> 0.25, got ${psi("shifted")}")
  }

  test("PSI: non-positive values pool in the -999 band without error") {
    val d = Date.valueOf("2024-01-01")
    val d2 = Date.valueOf("2024-01-02")
    val psi = psiOf(Seq(("t", d, -5.0), ("t", d, 4.0), ("t", d2, 0.0), ("t", d2, 4.0)))
    assert(psi.contains("t") && psi("t") >= 0.0)
  }

  // ------------------------------------------------------------- q230 Cramér's V
  test("Cramér's V: perfect association scores 1, independence scores 0") {
    val perfect = (0 until 200).map(i => (s"k${i % 3}", s"k${i % 3}"))
      .toDF("rk", "ck")
    val indep = (for { r <- 0 until 2; c <- 0 until 2; _ <- 0 until 50 }
      yield (s"r$r", s"c$c")).toDF("rk", "ck")
    val p = AuditQueries.cramers(perfect, "p").select("v_r6").as[Double].head()
    val q = AuditQueries.cramers(indep, "q").select("v_r6", "chi2_r4")
      .as[(Double, Double)].head()
    assert(p == 1.0)
    assert(q._1 == 0.0 && q._2 == 0.0)
  }

  // ------------------------------------------------------------- q232 HLL
  test("HLL estimates a 2000-word vocabulary within 15% and nails the linear-counting range") {
    // 2000 distinct words spread over 200 docs; 'the' repeats in every
    // doc (registers are duplicate-insensitive by construction).
    val big = (0 until 200).map { i =>
      (s"big", "the " + (0 until 10).map(j => s"word${(i * 10 + j) % 2000}x").mkString(" "))
    }
    // 50 distinct words: raw estimate falls below 2.5m -> linear counting.
    val small = Seq(("small", (0 until 50).map(j => s"tok$j").mkString(" ")))
    val df = (big ++ small).toDF("source", "text")
    val out = AuditQueries.hllDistinct(df)
      .select("source", "n_exact", "hll_est_r2", "rel_err_r4")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    val (nBig, estBig, errBig) = out("big")
    assert(nBig == 2001L) // 2000 wordNx + 'the'
    assert(errBig < 0.15, s"big-vocab rel err $errBig (est $estBig)")
    val (nSmall, estSmall, errSmall) = out("small")
    assert(nSmall == 50L)
    assert(errSmall < 0.10, s"linear-counting rel err $errSmall (est $estSmall)")
  }

  // ------------------------------------------------------------- q234 FD discovery
  test("FD g3: exact dependency scores 1; a 10%-violating one scores 0.9") {
    val exact = (0 until 100).map(i => (s"k$i", s"v${i % 7}")).toDF("a", "b")
    val g1 = AuditQueries.fdStrength(exact, "x").select("g3_r6").as[Double].head()
    assert(g1 == 1.0)
    // 10 lhs keys, each with 9 rows of its modal b and 1 violator
    val noisy = (0 until 10).flatMap(i =>
      (0 until 9).map(_ => (s"k$i", "modal")) :+ (s"k$i", "other")).toDF("a", "b")
    val row = AuditQueries.fdStrength(noisy, "y")
      .select("n_rows", "n_lhs", "n_pairs", "g3_r6")
      .as[(Long, Long, Long, Double)].head()
    assert(row == ((100L, 10L, 20L, 0.9)))
  }

  // ------------------------------------------------------------- q235 quantile norm
  test("quantile-norm lookup: contiguous non-overlapping deciles covering each source") {
    val rows = SparkEntry.queries("q235_quantile_norm")(spark, sf())
      .collect().map(r => (r.getAs[String]("source"), r.getAs[Long]("decile"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("min_q_fp"), r.getAs[Long]("max_q_fp")))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (src, ds) =>
      val sorted = ds.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (0L until sorted.size.toLong),
        s"$src: deciles must be contiguous from 0")
      sorted.sliding(2).foreach {
        case Array(lo, hi) =>
          assert(lo._5 <= hi._4, s"$src: decile ranges must not overlap (score-sorted)")
        case _ =>
      }
      // each decile holds floor/ceil(n/10) docs: the integer-rank rule
      val n = sorted.map(_._3).sum
      assert(sorted.forall(d => d._3 == n / 10 || d._3 == n / 10 + 1))
    }
  }

  // ------------------------------------------------------------- q233 Holt-Winters
  private def closesDf(xs: Seq[Long], tpe: String = "t") =
    xs.zipWithIndex.map { case (x, i) =>
      (tpe, Date.valueOf(f"2024-01-${i + 1}%02d"), x)
    }.toDF("event_type", "day", "close_lv")

  test("Holt-Winters: constant series forecasts perfectly; seasonal series beats the naive walk") {
    val const = AuditQueries.holtWinters(closesDf(Seq.fill(20)(5000000L)))
      .select("n_fc", "mae_hw", "skill_vs_naive").collect().head
    assert(const.getLong(0) == 13L)
    assert(const.getDouble(1) == 0.0)
    assert(const.isNullAt(2)) // naive error is 0 too -> skill undefined
    // strong weekly season, 4 weeks: the seasonal model must crush the
    // naive walk (which pays the full amplitude every step).
    val season = (0 until 28).map(i => 5000000L + Seq(0L, 400000L, -300000L,
      200000L, -100000L, 300000L, -500000L)(i % 7))
    val row = AuditQueries.holtWinters(closesDf(season))
      .select("mae_hw", "mae_naive", "skill_vs_naive").collect().head
    assert(row.getDouble(0) < row.getDouble(1),
      s"hw ${row.getDouble(0)} should beat naive ${row.getDouble(1)}")
    assert(row.getDouble(2) < 0.5)
  }

  // ------------------------------------------------------------- q242 LTV
  test("cohort LTV: two-user cohort accumulates exactly; weeks with no purchases fill with zero") {
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-05-${day + 1}%02d 10:00:00")
    // u1/u2 first seen day 0 (cohort 0): $10 each in week 0, $20 each
    // in week 2 (week 1 is silent -> dense zero row), u3 joins day 7
    // (cohort 1) and never purchases.
    val rows = Seq(
      (1L, ts(0), "purchase", 10.0), (2L, ts(0), "purchase", 10.0),
      (1L, ts(14), "purchase", 20.0), (2L, ts(15), "purchase", 20.0),
      (3L, ts(7), "view", 1.0)
    ).toDF("user_id", "ts", "event_type", "value")
    val got = AuditQueries.cohortLtv(rows).collect()
      .map(r => (r.getAs[Long]("cohort_wk"), r.getAs[Long]("age_wk")) ->
        ((r.getAs[Long]("n_users"), r.getAs[Double]("week_rev_r2"),
          r.getAs[Double]("ltv_per_user_r2")))).toMap
    assert(got((0L, 0L)) == ((2L, 20.0, 10.0)))
    assert(got((0L, 1L)) == ((2L, 0.0, 10.0)), "silent week must appear with carried LTV")
    assert(got((0L, 2L)) == ((2L, 40.0, 30.0)))
    assert(!got.keySet.exists(_._1 == 1L), "purchase-free cohort has no LTV curve")
  }

  // ------------------------------------------------------------- q243 reconciliation
  test("order reconciliation: exact, near-miss, and headless orders land in their buckets") {
    val orders = Seq(
      (1L, 100.0), // lines sum to exactly 100.00
      (2L, 101.0), // lines sum to 100.50 -> 50 cents off -> within_1
      (3L, 55.0)   // no lines
    ).toDF("o_orderkey", "o_totalprice")
    val lines = Seq(
      (1L, 100.0, 0.0, 0.0),
      (2L, 100.5, 0.0, 0.0)
    ).toDF("l_orderkey", "l_extendedprice", "l_discount", "l_tax")
    val got = AuditQueries.orderRecon(orders, lines).collect()
      .map(r => r.getAs[String]("bucket") ->
        ((r.getAs[Long]("n"), r.getAs[Double]("abs_diff_r2")))).toMap
    assert(got("exact") == ((1L, 0.0)))
    assert(got("within_1") == ((1L, 0.5)))
    assert(got("no_lines")._1 == 1L)
  }

  // ------------------------------------------------------------- q244 stickiness
  test("stickiness: daily-active user keeps DAU/MAU at 1; lapsed user dilutes the trailing window") {
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-06-${day + 1}%02d 10:00:00")
    // u1 active every day 0..9; u2 active only day 0. From day 1 on:
    // DAU = 1, MAU = 2 -> stickiness 0.5; day 0: 2/2 = 1.
    val rows = ((0 until 10).map(d => (1L, ts(d))) :+ ((2L, ts(0))))
      .toDF("user_id", "ts")
    val got = AuditQueries.stickiness(rows).collect()
      .map(r => r.getAs[java.sql.Date]("day").toString ->
        ((r.getAs[Long]("dau"), r.getAs[Long]("mau"), r.getAs[Double]("stickiness_r4"))))
      .toMap
    assert(got("2024-06-01") == ((2L, 2L, 1.0)))
    assert(got("2024-06-02") == ((1L, 2L, 0.5)))
    assert(got("2024-06-10") == ((1L, 2L, 0.5)), "u2 stays in the 30-day window")
    assert(got.size == 10, "one row per day inside the observed range")
  }

  // ------------------------------------------------------------- q241 KS
  test("KS drift: identical halves score 0; disjoint halves score exactly 1 and reject") {
    val d = (0 until 20).map(i => Date.valueOf(f"2024-02-${i + 1}%02d"))
    val same = (0 until 20).flatMap(i => Seq(
      ("same", d(i), 10.0), ("same", d(i), 20.0)))
    val shift = (0 until 20).flatMap { i =>
      Seq.fill(5)(("shift", d(i), if (i < 10) 10.0 else 90.0))
    }
    val got = AuditQueries.ksDrift((same ++ shift)
      .toDF("event_type", "day", "value"))
      .collect().map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Double]("ks_r6"), r.getAs[Boolean]("reject")))).toMap
    assert(got("same") == ((0.0, false)))
    assert(got("shift") == ((1.0, true)), s"disjoint halves: ${got("shift")}")
  }

  // ------------------------------------------------------------- q240 entropy
  test("navigation entropy: deterministic rows score 0 bits, a fair 2-way split scores exactly 1") {
    val t0 = java.sql.Timestamp.valueOf("2024-04-01 09:00:00")
    def ts(min: Int) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    // one session: c d c e c d c e ... — from c the next state is a
    // fair coin (H = 1 bit exactly); from d and e it is always c
    // (H = 0); every gap is 1 min << the 30-min session cut.
    val seq0 = (0 until 40).map { i =>
      val tpe = if (i % 2 == 0) "c" else if (i % 4 == 1) "d" else "e"
      (1L, ts(i), i.toLong, tpe)
    }
    val got = AuditQueries.navEntropy(
      seq0.toDF("user_id", "ts", "event_id", "event_type"))
      .collect().map(r => r.getAs[String]("state") ->
        ((r.getAs[Long]("out_trans"), r.getAs[Double]("h_bits_r6")))).toMap
    assert(got("c")._2 == 1.0, s"fair coin must be exactly 1 bit: ${got("c")}")
    assert(got("d")._2 == 0.0 && got("e")._2 == 0.0)
    // overall = visit-share-weighted mix of the per-state entropies
    val t = got.filter(_._1 != "__overall").values.map(_._1).sum
    val want = got.filter(_._1 != "__overall").values
      .map { case (n, h) => n.toDouble * h }.sum / t
    assert(math.abs(got("__overall")._2 - want) < 1e-5, s"overall: ${got("__overall")}")
  }

  // ------------------------------------------------------------- q239 A/B test
  test("A/B readout: planted 25% vs 75% conversion closes to the textbook z and flags significance") {
    val t0 = java.sql.Timestamp.valueOf("2024-03-01 09:00:00")
    // even user_ids = arm 0 (50/200 convert @ $10), odd = arm 1
    // (150/200 convert @ $20)
    val rows = (0 until 200).flatMap { i =>
      val conv0 = i < 50; val conv1 = i < 150
      Seq(
        (2L * i, t0, 2L * i, if (conv0) "purchase" else "view", if (conv0) 10.0 else 5.0),
        (2L * i + 1, t0, 10000L + 2 * i, if (conv1) "purchase" else "view",
          if (conv1) 20.0 else 5.0))
    }.toDF("user_id", "ts", "event_id", "event_type", "value")
    val got = AuditQueries.abTest(rows).collect().head
    def r4(x: Double) = math.floor(x * 10000 + 0.5) / 10000
    assert(got.getAs[Long]("n0") == 200L && got.getAs[Long]("n1") == 200L)
    assert(got.getAs[Double]("p0_r4") == 0.25 && got.getAs[Double]("p1_r4") == 0.75)
    val pp = (50.0 + 150.0) / 400.0
    val z = (0.75 - 0.25) / math.sqrt(pp * (1.0 - pp) * (1.0 / 200 + 1.0 / 200))
    assert(got.getAs[Double]("z_conv_r4") == math.floor(z * 1e4 + 0.5) / 1e4)
    assert(got.getAs[Boolean]("significant"))
    assert(got.getAs[Double]("rev0_r4") == r4(50.0 * 1000 / 200 / 100.0))
    assert(got.getAs[Double]("t_rev_r4") > 0)
  }

  // ------------------------------------------------------------- q236 GARCH
  test("GARCH: constant series yields no forecast; vol clustering beats the constant baseline") {
    val const = AuditQueries.garchBacktest(closesDf(Seq.fill(15)(5000000L)))
      .select("n_fc", "qlike_garch_r4").collect().head
    assert(const.getLong(0) == 0L && const.isNullAt(1))
    // a single-close instrument has an EMPTY return array — the
    // unguarded slice form crashed here (negative slice length)
    val single = AuditQueries.garchBacktest(closesDf(Seq(5000000L)))
      .select("n_fc").collect().head
    assert(single.getLong(0) == 0L)
    // volatility clustering: huge alternating returns for two weeks,
    // tiny ones after — conditional variance tracks the regimes, the
    // constant baseline cannot.
    var lv = 5000000L
    val xs = Seq(lv) ++ (0 until 30).map { i =>
      val r = if (i < 15) 800000L else 10000L
      lv += (if (i % 2 == 0) r else -r); lv
    }
    val row = AuditQueries.garchBacktest(closesDf(xs))
      .select("n_fc", "qlike_garch_r4", "qlike_const_r4", "vol_skill_r4").collect().head
    assert(row.getLong(0) == 29L)
    assert(row.getDouble(1) < row.getDouble(2),
      s"garch ${row.getDouble(1)} should beat const ${row.getDouble(2)}")
    assert(row.getDouble(3) < 1.0)
  }

  test("GARCH recursion replays the textbook equations exactly") {
    val xs = Seq(5000000L, 5400000L, 4700000L, 5200000L, 4900000L, 5300000L,
      4500000L, 5010000L, 5410000L, 4710000L)
    val got = AuditQueries.garchBacktest(closesDf(xs))
      .select("n_fc", "qlike_garch_r4", "qlike_const_r4").collect().head
    val rs = xs.sliding(2).map(p => (p(1) - p(0)).toDouble).toSeq
    val s2 = rs.map(r => r * r).sum / rs.size // exact: integers below 2^53
    var v = s2; var p = rs.head; var ql = 0.0
    for (r <- rs.tail) {
      val nv = 0.05 * s2 + 0.1 * p * p + 0.85 * v
      ql += (r * r) / nv + math.log(nv)
      v = nv; p = r
    }
    val n = (rs.size - 1).toDouble
    val qlc = (rs.tail.map(r => r * r).sum / s2 + n * math.log(s2)) / n
    def r4(x: Double) = math.floor(x * 10000 + 0.5) / 10000
    assert(got.getLong(0) == rs.size - 1L)
    assert(got.getDouble(1) == r4(ql / n))
    assert(got.getDouble(2) == r4(qlc))
  }

  // ------------------------------------------------------------- q237 Zipf
  test("Zipf fit: an exact power-law vocabulary scores slope -1 with perfect fit") {
    // term r appears 2520/r times (r = 1..10): freq = C/rank exactly,
    // so ln freq = ln C - ln rank — slope -1, R^2 = 1 by construction.
    val counts = (1 to 10).map(r => 2520 / r)
    val text = counts.zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(c)(s"w${('a' + i).toChar}")
    }.mkString(" ")
    val out = AuditQueries.zipfFit(Seq(("z", text)).toDF("source", "text"))
      .collect().head
    assert(out.getAs[Long]("n_terms") == 10L)
    assert(out.getAs[Double]("zipf_slope_r4") == -1.0)
    assert(out.getAs[Double]("r2_r4") == 1.0)
  }

  // ------------------------------------------------------------- q278 Heaps fit
  test("heapsFit: exact square-root vocabulary growth pins beta = 0.5, r2 = 1; flat vocab pins beta = 0") {
    // (m, v) = (4,2), (16,4), (64,8): ln-colinear with slope exactly
    // 1/2 — the quantized regression recovers it at r4
    val sqrtDocs = Seq(
      ("p", "a b a b"),
      ("p", Seq.fill(4)("a b c d").mkString(" ")),
      ("p", Seq.fill(8)("a b c d e f g h").mkString(" ")))
    val p = AuditQueries.heapsFit(sqrtDocs.toDF("source", "text")).collect().head
    assert(p.getAs[Long]("n_docs") == 3L)
    assert(p.getAs[Double]("herdan_beta_r4") == 0.5)
    assert(p.getAs[Double]("r2_r4") == 1.0)
    // constant vocabulary at any length: beta = 0, ln K = ln 3
    val flatDocs = Seq(
      ("f", "x y z x"),
      ("f", Seq.fill(4)("x y z x").mkString(" ")),
      ("f", Seq.fill(16)("x y z x").mkString(" ")))
    val f = AuditQueries.heapsFit(flatDocs.toDF("source", "text")).collect().head
    assert(f.getAs[Double]("herdan_beta_r4") == 0.0)
    assert(f.getAs[Double]("ln_k_r4") == math.floor(math.log(3.0) * 1e4 + 0.5) / 1e4)
    // a single-doc source cannot support a fit -> NULLs
    val one = AuditQueries.heapsFit(Seq(("o", "a b c")).toDF("source", "text"))
      .collect().head
    assert(one.isNullAt(one.fieldIndex("herdan_beta_r4")))
    // all docs the same length: zero x-variance -> NULLs
    val same = AuditQueries.heapsFit(Seq(("s", "a b c d"), ("s", "a a b b"))
      .toDF("source", "text")).collect().head
    assert(same.isNullAt(same.fieldIndex("herdan_beta_r4")))
  }

  // ------------------------------------------------------------- q238 readability
  test("readability: hand-counted sentences/words/syllables close to the exact Flesch score") {
    val doc = "the cat sat. the dog ran." // 6 words, 2 sentences, 6 syllables
    val out = AuditQueries.readability(Seq(("s", doc)).toDF("source", "text"))
      .collect().head
    def r2c(x: Double) = math.floor(x * 100 + 0.5) / 100
    val wps = 3.0; val spw = 1.0
    assert(out.getAs[Long]("n_docs") == 1L)
    assert(out.getAs[Double]("mean_flesch_r2") == r2c(206.835 - 1.015 * wps - 84.6 * spw))
    assert(out.getAs[Double]("mean_grade_r2") == r2c(0.39 * wps + 11.8 * spw - 15.59))
    assert(out.getAs[Long]("n_hard") == 0L)
  }

  test("Holt-Winters recursion replays the textbook equations exactly") {
    val xs = Seq(5000000L, 5400000L, 4700000L, 5200000L, 4900000L, 5300000L,
      4500000L, 5010000L, 5410000L, 4710000L, 5210000L, 4910000L, 5310000L,
      4510000L, 5020000L, 5420000L)
    val got = AuditQueries.holtWinters(closesDf(xs))
      .select("n_fc", "mae_hw", "rmse_hw").collect().head
    // independent replay of the same recursion (same IEEE order)
    val x = xs.map(_.toDouble)
    val m7 = ((((((x(0) + x(1)) + x(2)) + x(3)) + x(4)) + x(5)) + x(6)) / 7.0
    var l = m7; var b = 0.0
    val s = Array.tabulate(7)(i => x(i) - m7)
    var sae = 0.0; var sse = 0.0
    for (t <- 7 until x.length) {
      val slot = t % 7
      val f = (l + b) + s(slot)
      val e = x(t) - f
      val l2 = 0.2 * (x(t) - s(slot)) + 0.8 * (l + b)
      val b2 = 0.1 * (l2 - l) + 0.9 * b
      s(slot) = 0.3 * (x(t) - l2) + 0.7 * s(slot)
      sae += math.abs(e); sse += e * e
      l = l2; b = b2
    }
    val n = (x.length - 7).toDouble
    def r4(v: Double) = math.floor(v * 10000 + 0.5) / 10000
    assert(got.getLong(0) == x.length - 7L)
    assert(got.getDouble(1) == r4(sae / n / 1e6))
    assert(got.getDouble(2) == r4(math.sqrt(sse / n) / 1e6))
  }
}
