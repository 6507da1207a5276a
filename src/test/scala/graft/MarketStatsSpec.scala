package graft

import org.apache.spark.sql.functions._

/** Invariants for the round-9 market estimators (q157–q159) beyond
  * the DuckDB hash oracle: estimator bounds, grid completeness, and
  * the cross-sectional beta identity (the average beta against the
  * equal-weight market must be ~1 by construction — a property the
  * oracle replay cannot distinguish from a consistently-wrong
  * formula on both engines).
  */
class MarketStatsSpec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sf())

  test("q157: range volatility is non-negative, hi >= lo, one row per (instrument, day)") {
    val out = q("q157_parkinson_vol").cache()
    assert(out.filter($"park_vol" < 0 || $"hi" < $"lo").isEmpty)
    val grid = graft.core.Tables.events(spark, sf())
      .filter($"value" > 0)
      .select($"event_type", to_date($"ts").as("day")).distinct().count()
    assert(out.count() == grid, "one row per observed (instrument, day)")
    out.unpersist()
  }

  test("q158: illiquidity is non-negative and day counts stay within the feed span") {
    val out = q("q158_amihud_illiq").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Double]("mean_illiq") >= 0)
      assert(r.getAs[Double]("max_illiq") >= r.getAs[Double]("mean_illiq") - 1e-9,
        "max below mean")
      assert(r.getAs[Long]("n_days") >= 1 && r.getAs[Long]("n_days") <= 31)
    }
  }

  test("q165: GK volatility non-negative on the same grid as q157; degenerate one-tick day is 0") {
    val out = q("q165_garman_klass").cache()
    assert(out.filter($"gk_vol" < 0).isEmpty)
    assert(out.count() == q("q157_parkinson_vol").count(), "same (instrument, day) grid")
    // a day with one tick has H=L=O=C: both terms vanish exactly
    assert(out.filter($"n_ticks" === 1 && $"gk_vol" =!= 0d).isEmpty)
    out.unpersist()
  }

  test("q167: tick-rule signing pinned on a designed feed; OFI bounded") {
    val out = q("q167_order_flow")
    assert(out.filter(abs($"ofi") > 1.0001).isEmpty)
    assert(out.filter($"buy_vol" < 0 || $"sell_vol" < 0).isEmpty)
    // designed feed: prices 10, 11, 11, 9 with sizes 5, 7, 3, 2 —
    // tick signs: none (first), +1 (up), +1 (inherited zero-tick),
    // -1 (down) => buy = 10, sell = 2, OFI = 8/12
    val dir = java.nio.file.Files.createTempDirectory("graft_q167").toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def ts(m: Int) = new java.sql.Timestamp(t0.getTime + m * 60000L)
    Seq(
      (1L, ts(0), 1L, "X", 10.0, """{"k": 5}"""),
      (2L, ts(1), 1L, "X", 11.0, """{"k": 7}"""),
      (3L, ts(2), 1L, "X", 11.0, """{"k": 3}"""),
      (4L, ts(3), 1L, "X", 9.0, """{"k": 2}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val r = SparkEntry.queries("q167_order_flow")(spark, dir).collect().head
    assert(r.getAs[Long]("buy_vol") == 10L && r.getAs[Long]("sell_vol") == 2L,
      s"signing broke: $r")
    assert(math.abs(r.getAs[Double]("ofi") - math.floor(8d / 12d * 10000 + 0.5) / 10000) < 1e-12)
  }

  test("q172 panel columns agree with every standalone member query") {
    val panel = q("q172_daily_panel").cache()
    def member(name: String) = q(name)
    // q153 realized vol
    val rvDiff = panel.select($"event_type", $"day", $"rv")
      .join(member("q153_realized_vol").select($"event_type", $"day", $"vol"), Seq("event_type", "day"))
      .filter(!($"rv" <=> $"vol")).count()
    assert(rvDiff == 0, "rv diverges from q153")
    // q157 Parkinson + q165 GK (same grid)
    val pkDiff = panel.select($"event_type", $"day", $"park_vol".as("p2"))
      .join(member("q157_parkinson_vol").select($"event_type", $"day", $"park_vol"), Seq("event_type", "day"))
      .filter(!($"p2" <=> $"park_vol")).count()
    assert(pkDiff == 0, "park_vol diverges from q157")
    val gkDiff = panel.select($"event_type", $"day", $"gk_vol".as("g2"))
      .join(member("q165_garman_klass").select($"event_type", $"day", $"gk_vol"), Seq("event_type", "day"))
      .filter(!($"g2" <=> $"gk_vol")).count()
    assert(gkDiff == 0, "gk_vol diverges from q165")
    // q167 OFI (this feed has no zero prices, so the panel's value>0
    // filter is a no-op and the members must agree exactly)
    val ofiDiff = panel.select($"event_type", $"day", $"ofi".as("o2"))
      .join(member("q167_order_flow").select($"event_type", $"day", $"ofi"), Seq("event_type", "day"))
      .filter(!($"o2" <=> $"ofi")).count()
    assert(ofiDiff == 0, "ofi diverges from q167")
    // q126 VWAP
    val vwDiff = panel.select($"event_type", $"day", $"vwap".as("v2"))
      .join(member("q126_vwap").select($"event_type", $"day", $"vwap"), Seq("event_type", "day"))
      .filter(!($"v2" <=> $"vwap")).count()
    assert(vwDiff == 0, "vwap diverges from q126")
    panel.unpersist()
  }

  test("q169: Roll spread pinned on a pure bid-ask bounce; undefined region is null") {
    val out = q("q169_roll_spread")
    assert(out.filter($"roll_spread".isNotNull && $"roll_spread" < 0).isEmpty)
    assert(out.filter($"roll_spread".isNotNull && $"cov_px2" >= 0).isEmpty,
      "spread must be null when serial covariance is non-negative")
    // pure alternation 10, 11, 10, 11: diffs +1, -1, +1 -> pairs
    // cov = -1e8 (fp) -> cov_px2 = -1, spread = 2*sqrt(1e8)/1e4 = 2.0
    val dir = java.nio.file.Files.createTempDirectory("graft_q169").toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def ts(m: Int) = new java.sql.Timestamp(t0.getTime + m * 60000L)
    (1 to 4).map(i => (i.toLong, ts(i), 1L, "X", if (i % 2 == 1) 10.0 else 11.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val r = SparkEntry.queries("q169_roll_spread")(spark, dir).collect().head
    assert(r.getAs[Long]("n_pairs") == 2L)
    assert(r.getAs[Double]("cov_px2") == -1.0, s"cov: $r")
    assert(r.getAs[Double]("roll_spread") == 2.0, s"spread: $r")
  }

  test("q170: variance ratio — overlapping-window counts consistent, variances non-negative") {
    val out = q("q170_variance_ratio").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n5") == r.getAs[Long]("n1") - 4,
        "every daily return past the 4th closes a full 5-day window")
      assert(r.getAs[Double]("var_1") >= 0 && r.getAs[Double]("var_5") >= 0)
      assert(r.getAs[Double]("vr5") > 0)
    }
  }

  test("q159: cross-sectional mean beta ~ 1 per day; corr bounded in [-1, 1]") {
    val out = q("q159_rolling_beta").cache()
    assert(out.filter(abs($"corr_r") > 1.0001).isEmpty, "corr out of range")
    // beta_i = cov(r_i, m)/var(m); averaging over i gives
    // cov(mean_i r_i, m)/var(m) = 1 up to the 1-integer-unit market
    // quantization (returns are ~1e5 micro-units, so the error is
    // ~1e-5 relative). A formula that is wrong the same way on both
    // engines would still hash-match the oracle — this identity is
    // the independent check.
    val off = out.groupBy($"day").agg(avg($"beta").as("ab"))
      .filter(abs($"ab" - 1d) > 0.01)
    assert(off.isEmpty, s"mean beta drifts from 1: ${off.collect().mkString(",")}")
    out.unpersist()
  }

  /** One tick per day at alternating prices 1, 2, 1, 2, … — daily
    * micro-log2 returns alternate exactly ±1e6, giving closed-form
    * moments and autocorrelations. */
  private def alternatingFeed(days: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_alt").toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    (0 until days).map { d =>
      (d.toLong, new java.sql.Timestamp(t0.getTime + d * 86400000L), 1L, "X",
        if (d % 2 == 0) 1.0 else 2.0, """{"k": 5}""")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    dir
  }

  test("q175: alternating-return feed pins vol=1, skew=0, excess kurtosis=-2; real-feed moment bound holds") {
    // 9 days -> 8 returns of +-1e6: mean 0, mu2 = 1e12, mu3 = 0,
    // mu4 = 1e24 -> vol_d 1.0, skew 0.0, kurt_x exactly -2.0
    val r = SparkEntry.queries("q175_higher_moments")(spark, alternatingFeed(9)).collect().head
    assert(r.getAs[Long]("n_days") == 8L)
    assert(r.getAs[Double]("vol_d") == 1.0, s"vol: $r")
    assert(r.getAs[Double]("skew_d") == 0.0, s"skew: $r")
    assert(r.getAs[Double]("kurt_x") == -2.0, s"kurt: $r")
    // any real distribution satisfies kurtosis >= 1 + skew^2, i.e.
    // excess >= skew^2 - 2 — a formula-level sanity check the oracle
    // replay cannot provide (both engines would be wrong identically)
    q("q175_higher_moments").collect().foreach { row =>
      val sk = row.getAs[Double]("skew_d"); val kx = row.getAs[Double]("kurt_x")
      assert(kx >= sk * sk - 2 - 1e-3, s"moment inequality violated: $row")
    }
  }

  test("q176: alternating feed pins acf(1,2,3) = -1, +1, -1; real-feed pair counts and bounds") {
    val alt = SparkEntry.queries("q176_return_acf")(spark, alternatingFeed(9))
      .collect().map(r => r.getAs[Int]("lag_k") -> r.getAs[Double]("acf")).toMap
    assert(alt(1) == -1.0 && alt(2) == 1.0 && alt(3) == -1.0, s"acf: $alt")
    val out = q("q176_return_acf").cache()
    assert(out.filter(abs($"acf") > 1.0001).isEmpty, "acf out of range")
    // each lag k loses exactly k pairs off the per-type return count
    val n1 = out.filter($"lag_k" === 1).select($"event_type", ($"n_pairs" + 1).as("n"))
    val n3 = out.filter($"lag_k" === 3).select($"event_type", ($"n_pairs" + 3).as("n"))
    assert(n1.exceptAll(n3).isEmpty, "lag-k pair counts inconsistent")
    out.unpersist()
  }

  test("q177: designed linear-impact feed recovers lambda exactly with r2 = 1") {
    // dp_fp = 2 * sgn * k by construction: prices 100, 100.0010 (+1,
    // k=5), 100.0004 (-1, k=3), 100.0008 (+1, k=2) -> slope exactly 2
    // fp-units/share -> lambda_px = 0.0002, r2_fit = 1.0
    val dir = java.nio.file.Files.createTempDirectory("graft_q177").toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def ts(m: Int) = new java.sql.Timestamp(t0.getTime + m * 60000L)
    Seq(
      (1L, ts(0), 1L, "X", 100.0000, """{"k": 9}"""),
      (2L, ts(1), 1L, "X", 100.0010, """{"k": 5}"""),
      (3L, ts(2), 1L, "X", 100.0004, """{"k": 3}"""),
      (4L, ts(3), 1L, "X", 100.0008, """{"k": 2}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val r = SparkEntry.queries("q177_kyle_lambda")(spark, dir).collect().head
    assert(r.getAs[Long]("n_ticks") == 3L)
    assert(r.getAs[Double]("lambda_px") == 0.0002, s"lambda: $r")
    assert(r.getAs[Double]("r2_fit") == 1.0, s"r2: $r")
  }

  test("q178: VPIN bounded in [0,1]; total volume matches the feed; single-bucket designed feed") {
    val out = q("q178_vpin").cache()
    assert(out.filter($"vpin" < 0 || $"vpin" > 1.0001).isEmpty)
    val want = graft.core.Tables.events(spark, sf())
      .groupBy($"event_type")
      .agg(sum(graft.functions.JsonField.longField($"props", "k")).as("tv"))
    val mism = out.join(want, Seq("event_type")).filter($"total_vol" =!= $"tv")
    assert(mism.isEmpty, "volume clock lost volume")
    out.unpersist()
    // q167's designed feed fits one 2000-share bucket: vpin = |10-2|/17
    val dir = java.nio.file.Files.createTempDirectory("graft_q178").toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def ts(m: Int) = new java.sql.Timestamp(t0.getTime + m * 60000L)
    Seq(
      (1L, ts(0), 1L, "X", 10.0, """{"k": 5}"""),
      (2L, ts(1), 1L, "X", 11.0, """{"k": 7}"""),
      (3L, ts(2), 1L, "X", 11.0, """{"k": 3}"""),
      (4L, ts(3), 1L, "X", 9.0, """{"k": 2}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val r = SparkEntry.queries("q178_vpin")(spark, dir).collect().head
    assert(r.getAs[Long]("n_buckets") == 1L && r.getAs[Long]("total_vol") == 17L)
    assert(r.getAs[Double]("vpin") == math.floor(8d / 17d * 10000 + 0.5) / 10000, s"vpin: $r")
  }

  test("q192: a perfect one-day follower pins xcorr(A->B) = 1; asymmetry is real") {
    // B's daily return replays A's PREVIOUS day's return (a
    // non-periodic +-1 doubling pattern), so the (A leads, B lags)
    // pairs are identical series -> xcorr exactly 1.0; the reverse
    // direction correlates A with its own lag-2 — not 1.
    val s = Seq(1, 1, -1, 1, -1, -1, 1, 1)
    val dir = java.nio.file.Files.createTempDirectory("graft_q192").toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    val rows = (0 to 9).flatMap { d =>
      val ts = new java.sql.Timestamp(t0.getTime + d * 86400000L)
      val eA = s.take(d).sum
      // B return at day d = s(d-2): exponent = sum of s(0..d-2)
      val eB2 = (2 to d).map(k => s(k - 2)).sum
      Seq((d * 2L, ts, 1L, "A", math.pow(2d, eA), """{"k": 5}"""),
        (d * 2L + 1, ts, 1L, "B", math.pow(2d, eB2), """{"k": 5}"""))
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q192_lead_lag")(spark, dir).collect()
      .map(r => (r.getAs[String]("lead_type"), r.getAs[String]("lag_type")) ->
        r.getAs[Double]("xcorr")).toMap
    assert(out(("A", "B")) == 1.0, s"A->B: $out")
    assert(out(("B", "A")) != 1.0, s"B->A must differ: $out")
    // real feed: matrix covers all ordered pairs, values bounded
    val real = q("q192_lead_lag").collect()
    assert(real.length == 20, "5 types -> 20 ordered pairs")
    real.foreach(r => assert(math.abs(r.getAs[Double]("xcorr")) <= 1.0001))
  }

  test("q179: steady winner/loser feed pins the spread; real-feed rows are consistent") {
    // A doubles daily, B halves: returns +-1e6 every day; return
    // rows exist for days 2-9 and a signal day needs 5 PRIOR return
    // rows -> days 7, 8, 9 emit, winner always A, spread exactly 2.0
    val dir = java.nio.file.Files.createTempDirectory("graft_q179").toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    val rows = (0 until 9).flatMap { d =>
      val ts = new java.sql.Timestamp(t0.getTime + d * 86400000L)
      Seq((d * 2L, ts, 1L, "A", math.pow(2d, d), """{"k": 5}"""),
        (d * 2L + 1, ts, 1L, "B", math.pow(2d, -d), """{"k": 5}"""))
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q179_momentum")(spark, dir).collect()
    assert(out.length == 3, s"signal days: ${out.mkString(",")}")
    out.foreach { r =>
      assert(r.getAs[String]("win_type") == "A" && r.getAs[String]("lose_type") == "B")
      assert(r.getAs[Double]("spread") == 2.0, s"spread: $r")
    }
    q("q179_momentum").collect().foreach { r =>
      assert(r.getAs[String]("win_type") != r.getAs[String]("lose_type"))
      assert(math.abs(r.getAs[Double]("spread") -
        (r.getAs[Double]("win_ret") - r.getAs[Double]("lose_ret"))) < 2e-4,
        s"spread inconsistent with member returns: $r")
    }
  }

  test("q203: trend/oscillation/constant designed feeds pin the skill readout; exact Scala replay") {
    val dir = java.nio.file.Files.createTempDirectory("graft_q203").toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def ts(d: Int) = new java.sql.Timestamp(t0.getTime + d * 86400000L)
    // XXX: exact linear trend in log2 (2^1..2^8): the naive random
    // walk errs exactly 1.0/day; an EWMA lags a trend, so it must
    // LOSE (skill > 1) — the honest-readout pin. YYY: oscillation
    // 2^4 <-> 2^5: the EWMA sits between the two levels, so it must
    // WIN (skill < 1). ZZZ: constant — zero errors, skill NULL.
    val rows =
      (1 to 8).map(d => (d * 10L, ts(d), 1L, "XXX", math.pow(2d, d.toDouble), """{"k": 5}""")) ++
      (1 to 8).map(d => (d * 10L + 1, ts(d), 1L, "YYY",
        math.pow(2d, if (d % 2 == 1) 4d else 5d), """{"k": 5}""")) ++
      (1 to 5).map(d => (d * 10L + 2, ts(d), 1L, "ZZZ", 8.0, """{"k": 5}"""))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q203_ewma_backtest")(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val x = out("XXX")
    assert(x.getAs[Long]("n_fc") == 7L)
    assert(x.getAs[Double]("mae_naive") == 1.0, s"trend naive err is exactly 1/day: $x")
    assert(x.getAs[Double]("skill") > 1.0, s"EWMA must lag a trend: $x")
    val yy = out("YYY")
    assert(yy.getAs[Double]("skill") < 1.0, s"EWMA must beat naive on oscillation: $yy")
    val z = out("ZZZ")
    assert(z.getAs[Double]("mae_ewma") == 0.0 && z.getAs[Double]("mae_naive") == 0.0)
    assert(z.isNullAt(z.fieldIndex("skill")), "constant series has no naive error to beat")
    // exact replay of XXX in plain Scala (the same IEEE fold)
    val xs = (1 to 8).map(d => d * 1e6)
    val ys = xs.scanLeft(Double.NaN)((y, v) => if (y.isNaN) v else 0.2 * v + 0.8 * y).drop(1)
    val es = (1 until 8).map(k => xs(k) - ys(k - 1))
    val sae = es.foldLeft(0.0)((a, e) => a + math.abs(e))
    val sse = es.foldLeft(0.0)((a, e) => a + e * e)
    def r4d(v: Double) = math.floor(v * 10000 + 0.5) / 10000
    assert(x.getAs[Double]("mae_ewma") == r4d(sae / 7d / 1e6), s"mae replay: $x")
    assert(x.getAs[Double]("rmse_ewma") == r4d(math.sqrt(sse / 7d) / 1e6), s"rmse replay: $x")
    // real feed: 5 instruments, consistent counts, positive errors
    val real = q("q203_ewma_backtest").collect()
    assert(real.length == 5)
    real.foreach { r =>
      assert(r.getAs[Long]("n_fc") >= 1)
      assert(r.getAs[Double]("rmse_ewma") >= r.getAs[Double]("mae_ewma") - 1e-4,
        s"RMSE must dominate MAE: $r")
    }
  }

  test("q198: perfectly cointegrated designed pair is exact; real-feed pair grid + bounds") {
    // AAA's log-price is exactly 2x BBB's (prices are powers of two,
    // so the micro-log2 quantization is exact): the OLS hedge ratio
    // is 2.0 by algebra, levels correlate perfectly, the residual
    // spread is identically zero, and a zero-dispersion spread has
    // no z-score (the sd > 0 guard).
    val dir = java.nio.file.Files.createTempDirectory("graft_q198").toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    val rows = (1 to 4).flatMap { d =>
      val ts = new java.sql.Timestamp(t0.getTime + d * 86400000L)
      Seq((d * 10L, ts, 1L, "AAA", math.pow(2d, 2d * d), """{"k": 5}"""),
        (d * 10L + 1, ts, 1L, "BBB", math.pow(2d, d.toDouble), """{"k": 5}"""))
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q198_pairs_spread")(spark, dir).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("type_a") == "AAA" && r.getAs[String]("type_b") == "BBB")
    assert(r.getAs[Long]("n_days") == 4L)
    assert(r.getAs[Double]("beta") == 2.0, s"hedge ratio: $r")
    assert(r.getAs[Double]("corr_px") == 1.0, s"level corr: $r")
    assert(r.getAs[Double]("spread_sd") == 0.0, s"residual spread: $r")
    assert(r.isNullAt(r.fieldIndex("z_last")), "zero-dispersion spread has no z-score")
    // real feed: the full C(5,2) pair grid, canonical pair order, bounds
    val real = q("q198_pairs_spread").collect()
    assert(real.length == 10, "C(5,2) unordered pairs")
    real.foreach { rr =>
      assert(rr.getAs[String]("type_a") < rr.getAs[String]("type_b"))
      assert(math.abs(rr.getAs[Double]("corr_px")) <= 1.0001)
      assert(rr.getAs[Double]("spread_sd") >= 0)
      assert(rr.getAs[Long]("n_days") >= 1 && rr.getAs[Long]("n_days") <= 31)
    }
  }

  test("q199: alternating and monotone designed feeds pin every ratio + guard; real-feed bounds") {
    val dir = java.nio.file.Files.createTempDirectory("graft_q199").toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    // XXX alternates 2^10 <-> 2^11 (returns ±1e6, mean 0): Sharpe,
    // Sortino, annualized return and Calmar are all exactly 0; the
    // running peak (2^11 from day 2) puts max drawdown at exactly
    // 1.0 in log2; ann vol = 1e6·sqrt(252)/1e6 = sqrt(252).
    // YYY rises 2^1..2^5 (constant +1e6 returns): zero variance,
    // zero downside, zero drawdown -> Sharpe/Sortino/Calmar are all
    // NULL by guard and the annualized log2 return is exactly 252.
    val xs = Seq(10, 11, 10, 11, 10).zipWithIndex.map { case (e, d) =>
      (d * 10L, new java.sql.Timestamp(t0.getTime + d * 86400000L), 1L, "XXX",
        math.pow(2d, e.toDouble), """{"k": 5}""")
    }
    val ys = (1 to 5).map { d =>
      (d * 10L + 1, new java.sql.Timestamp(t0.getTime + d * 86400000L), 1L, "YYY",
        math.pow(2d, d.toDouble), """{"k": 5}""")
    }
    (xs ++ ys).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q199_risk_adjusted")(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val x = out("XXX")
    assert(x.getAs[Long]("n_days") == 4L)
    assert(x.getAs[Double]("ann_ret_log2") == 0.0 && x.getAs[Double]("sharpe") == 0.0 &&
      x.getAs[Double]("sortino") == 0.0 && x.getAs[Double]("calmar") == 0.0, s"XXX: $x")
    assert(x.getAs[Double]("max_dd_log2") == 1.0, s"XXX drawdown: $x")
    assert(x.getAs[Double]("ann_vol_log2") ==
      math.floor(math.sqrt(252d) * 10000 + 0.5) / 10000, s"XXX vol: $x")
    val y = out("YYY")
    assert(y.getAs[Double]("ann_ret_log2") == 252.0, s"YYY ret: $y")
    assert(y.getAs[Double]("ann_vol_log2") == 0.0 && y.getAs[Double]("max_dd_log2") == 0.0)
    assert(y.isNullAt(y.fieldIndex("sharpe")) && y.isNullAt(y.fieldIndex("sortino")) &&
      y.isNullAt(y.fieldIndex("calmar")), "zero-dispersion guards must yield NULL")
    // real feed: one row per instrument, non-negative dispersion metrics
    val real = q("q199_risk_adjusted").collect()
    assert(real.length == 5)
    real.foreach { r =>
      assert(r.getAs[Double]("ann_vol_log2") >= 0)
      assert(r.getAs[Double]("max_dd_log2") >= 0)
      assert(r.getAs[Long]("n_days") >= 1)
    }
  }

  test("q208: monotone feeds pin the crossover exactly; V-feed matches an independent Scala replay") {
    val dir = java.nio.file.Files.createTempDirectory("graft_q208").toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def tick(d: Int, sym: String, exp: Double, idBase: Long) =
      (idBase + d, new java.sql.Timestamp(t0.getTime + d * 86400000L), 1L, sym,
        math.pow(2d, exp), """{"k": 5}""")
    // UPP rises 2^0..2^29: fast mean > slow mean on every signal day
    // -> long throughout, strategy IS buy-and-hold; every day a hit;
    // constant +1e6 return -> zero dispersion -> Sharpe NULL by guard.
    // DWN falls 2^40..2^11: short throughout, strategy = -buy&hold.
    val up = (0 until 30).map(d => tick(d, "UPP", d.toDouble, 1000L))
    val dn = (0 until 30).map(d => tick(d, "DWN", (40 - d).toDouble, 2000L))
    // VEE: triangle up 30 then down 30 — the signal must flip exactly
    // once (plus possibly a flat tie day); pin the WHOLE summary row
    // against an independent pure-Scala replay of the rule.
    val veeExp = (0 until 60).map(d => if (d <= 30) d else 60 - d)
    val vee = veeExp.zipWithIndex.map { case (e, d) => tick(d, "VEE", e.toDouble, 3000L) }
    (up ++ dn ++ vee).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q208_sma_crossover")(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val u = out("UPP")
    assert(u.getAs[Long]("n_days") == 10L && u.getAs[Long]("n_active") == 10L &&
      u.getAs[Long]("n_flips") == 0L, s"UPP: $u")
    assert(u.getAs[Double]("strat_ret_log2") == 10.0 &&
      u.getAs[Double]("bh_ret_log2") == 10.0 &&
      u.getAs[Double]("hit_rate") == 1.0, s"UPP: $u")
    assert(u.isNullAt(u.fieldIndex("sharpe")), "constant return -> zero sd -> NULL guard")
    val w = out("DWN")
    assert(w.getAs[Double]("strat_ret_log2") == 10.0 &&
      w.getAs[Double]("bh_ret_log2") == -10.0 &&
      w.getAs[Double]("hit_rate") == 1.0 && w.getAs[Long]("n_flips") == 0L, s"DWN: $w")
    // independent replay: same rule in pure Scala over the known
    // integer levels (2^k -> k*1e6 exactly).
    val lv = veeExp.map(_ * 1000000L)
    val rows = (20 until 60).map { d =>
      val s5  = (d - 5 until d).map(lv).sum
      val s20 = (d - 20 until d).map(lv).sum
      val pos = java.lang.Long.signum(4L * s5 - s20)
      (pos, lv(d) - lv(d - 1))
    }
    val flips = rows.sliding(2).count(p => p(1)._1 != p(0)._1)
    val strat = rows.map { case (p, r) => p * r }
    val nD = rows.size
    val exp = (nD.toLong, rows.count(_._1 != 0).toLong, flips.toLong,
      strat.sum.toDouble / 1e6, rows.map(_._2).sum.toDouble / 1e6,
      math.floor(strat.count(_ > 0).toDouble / rows.count(_._1 != 0) * 10000 + 0.5) / 10000)
    val v = out("VEE")
    assert((v.getAs[Long]("n_days"), v.getAs[Long]("n_active"), v.getAs[Long]("n_flips"),
      v.getAs[Double]("strat_ret_log2"), v.getAs[Double]("bh_ret_log2"),
      v.getAs[Double]("hit_rate")) == exp, s"VEE: got $v want $exp")
    assert(flips >= 1, "the triangle must actually flip the signal")
    // real feed: bounded counters per instrument
    q("q208_sma_crossover").collect().foreach { r =>
      assert(r.getAs[Long]("n_active") <= r.getAs[Long]("n_days"))
      assert(r.getAs[Long]("n_flips") <= math.max(0L, r.getAs[Long]("n_days") - 1))
      if (!r.isNullAt(r.fieldIndex("hit_rate"))) {
        val h = r.getAs[Double]("hit_rate"); assert(h >= 0 && h <= 1)
      }
    }
  }

  test("q210: Holt beats EWMA on a trend, both beat naive on oscillation; exact Scala replay of the fold") {
    val dir = java.nio.file.Files.createTempDirectory("graft_q210").toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def ts(d: Int) = new java.sql.Timestamp(t0.getTime + d * 86400000L)
    // TTT: 30-day exact linear trend — the trend state converges, so
    // Holt must beat the trend-lagging EWMA. OOO: oscillation — no
    // trend to learn, but at beta = 0.1 the damped trend term barely
    // moves, so the structural pin is that BOTH smoothers beat the
    // naive walk (not their mutual order, which is a coin flip at
    // this beta — measured: Holt edges EWMA 0.5769 vs 0.5799). CCC:
    // constant — every error 0, both skill guards NULL.
    val rows =
      (1 to 30).map(d => (d * 10L, ts(d), 1L, "TTT", math.pow(2d, d.toDouble), """{"k": 5}""")) ++
      (1 to 12).map(d => (d * 10L + 1, ts(d), 1L, "OOO",
        math.pow(2d, if (d % 2 == 1) 4d else 5d), """{"k": 5}""")) ++
      (1 to 5).map(d => (d * 10L + 2, ts(d), 1L, "CCC", 8.0, """{"k": 5}"""))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q210_holt_backtest")(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val t = out("TTT")
    assert(t.getAs[Long]("n_fc") == 29L)
    assert(t.getAs[Double]("mae_naive") == 1.0, s"trend naive err is exactly 1/day: $t")
    assert(t.getAs[Double]("mae_holt") < t.getAs[Double]("mae_ewma"),
      s"the trend term must pay off on a trend: $t")
    assert(t.getAs[Double]("skill_vs_ewma") < 1.0, s"TTT: $t")
    val o = out("OOO")
    assert(o.getAs[Double]("skill_vs_naive") < 1.0,
      s"a smoother must beat the naive walk on oscillation: $o")
    val c = out("CCC")
    assert(c.getAs[Double]("mae_holt") == 0.0 && c.getAs[Double]("mae_naive") == 0.0)
    assert(c.isNullAt(c.fieldIndex("skill_vs_naive")) &&
      c.isNullAt(c.fieldIndex("skill_vs_ewma")), "zero-error guards must be NULL")
    // exact replay of TTT's Holt fold in plain Scala (same IEEE ops)
    val xs = (1 to 30).map(d => d * 1e6)
    val (_, _, sae, sse) = xs.tail.foldLeft((xs.head, 0.0, 0.0, 0.0)) {
      case ((l, b, sa, ss), x) =>
        val l2 = 0.2 * x + 0.8 * (l + b)
        val b2 = 0.1 * ((0.2 * x + 0.8 * (l + b)) - l) + 0.9 * b
        (l2, b2, sa + math.abs(x - (l + b)), ss + (x - (l + b)) * (x - (l + b)))
    }
    def r4d(v: Double) = math.floor(v * 10000 + 0.5) / 10000
    assert(t.getAs[Double]("mae_holt") == r4d(sae / 29d / 1e6), s"mae replay: $t")
    assert(t.getAs[Double]("rmse_holt") == r4d(math.sqrt(sse / 29d) / 1e6), s"rmse replay: $t")
    // real feed: counts consistent, RMSE dominates MAE
    q("q210_holt_backtest").collect().foreach { r =>
      assert(r.getAs[Long]("n_fc") >= 1)
      assert(r.getAs[Double]("rmse_holt") >= r.getAs[Double]("mae_holt") - 1e-4, s"$r")
    }
  }

  test("q209: designed feed pins clusters incl. the anti-correlated member and both singleton kinds") {
    val dir = java.nio.file.Files.createTempDirectory("graft_q209").toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def tick(d: Int, sym: String, exp: Int, idBase: Long) =
      (idBase + d, new java.sql.Timestamp(t0.getTime + d * 86400000L), 1L, sym,
        math.pow(2d, exp.toDouble), """{"k": 5}""")
    // AAA/BBB alternate 2^10/2^11 (returns +-1e6): rho(AAA,BBB)=+1.
    // CCC is the MIRROR (starts at 2^11): rho(AAA,CCC)=-1 — the
    // hedged pair must land in the SAME risk cluster (|rho|).
    // DDD has period-4 returns (+,+,-,-): exactly orthogonal to the
    // alternating pattern over full periods — rho 0, a singleton.
    // EEE is constant: zero-variance, no defined rho — the den > 0
    // guard makes it a singleton, not an edge to everything.
    val rows = (0 until 13).flatMap { d =>
      Seq(tick(d, "AAA", 10 + (d % 2), 1000L), tick(d, "BBB", 10 + (d % 2), 2000L),
        tick(d, "CCC", 10 + ((d + 1) % 2), 3000L),
        tick(d, "DDD", Seq(10, 11, 12, 11)(d % 4), 4000L), tick(d, "EEE", 10, 5000L))
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q209_corr_clusters")(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[String]("cluster_id"), r.getAs[Long]("cluster_size"))).toMap
    assert(out("AAA") == ("AAA", 3L) && out("BBB") == ("AAA", 3L) &&
      out("CCC") == ("AAA", 3L), s"co-movement cluster: $out")
    assert(out("DDD") == ("DDD", 1L), s"orthogonal singleton: $out")
    assert(out("EEE") == ("EEE", 1L), s"zero-variance singleton: $out")
    // real feed: the output is a PARTITION of the instrument set with
    // min-member representatives.
    val real = q("q209_corr_clusters").collect()
    assert(real.map(_.getAs[String]("event_type")).distinct.length == real.length)
    val byCluster = real.groupBy(_.getAs[String]("cluster_id"))
    byCluster.foreach { case (cid, m) =>
      assert(m.exists(_.getAs[String]("event_type") == cid), "representative is a member")
      assert(m.forall(_.getAs[Long]("cluster_size") == m.length.toLong))
      assert(m.forall(_.getAs[String]("event_type") >= cid), "representative is the min member")
    }
    assert(byCluster.values.map(_.length).sum == real.length)
  }

  test("q128: designed feed pins %K/%D exactly — flat window NULL, warm-up gate, 3-defined-%K guard, last-tick close") {
    val t0 = java.sql.Timestamp.valueOf("2024-03-01 12:00:00")
    def ts(day: Int, sec: Int = 0) =
      new java.sql.Timestamp(t0.getTime + day * 86400000L + sec * 1000L)
    // days 0..13 flat at 10.00 (full 14-frame, h14 = l14 -> %K NULL);
    // day 14 spikes to 12.00 (%K = 100), day 15 at 11.00 (%K = 50),
    // day 16 prints 11.80 then CLOSES 10.50 (%K = 25 off the close,
    // not the high); %D defined only at day 16 (first 3 defined %K)
    val rows = (0 to 13).map(d => ("X", ts(d), d.toLong, 10.00)) ++ Seq(
      ("X", ts(14), 14L, 12.00), ("X", ts(15), 15L, 11.00),
      ("X", ts(16, 10), 16L, 11.80), ("X", ts(16, 20), 17L, 10.50))
    val out = graft.queries.MarketQueries.stochastic(
      rows.toDF("event_type", "ts", "event_id", "value"))
      .collect().map(r => r.getAs[java.sql.Date]("day").toString -> r).toMap
    assert(out.size == 4, "rows emit only from the first full 14-day frame")
    val d13 = out("2024-03-14")
    assert(d13.isNullAt(d13.fieldIndex("pct_k_r4")), "flat 14-day window has no %K")
    assert(out("2024-03-15").getAs[Double]("pct_k_r4") == 100.0)
    assert(out("2024-03-16").getAs[Double]("pct_k_r4") == 50.0)
    val d16 = out("2024-03-17")
    assert(d16.getAs[Long]("close_c") == 1050L, "close is the LAST tick of the day")
    assert(d16.getAs[Long]("h14_c") == 1200L && d16.getAs[Long]("l14_c") == 1000L)
    assert(d16.getAs[Double]("pct_k_r4") == 25.0)
    assert(d16.getAs[Double]("pct_d_r4") == 58.3333,
      "%D = round((100 + 50 + 25)/3 scaled) = 58.3333")
    assert(out("2024-03-15").isNullAt(out("2024-03-15").fieldIndex("pct_d_r4")) &&
      out("2024-03-16").isNullAt(out("2024-03-16").fieldIndex("pct_d_r4")),
      "%D needs three CONSECUTIVE defined %K rows (the NULL %K breaks the run)")
  }

  test("q128 on testdata: %K/%D in [0, 100], close inside [l14, h14], one row per emitted (instrument, day)") {
    val out = q("q128_stochastic_osc").cache()
    assert(out.filter($"pct_k_r4" < 0 || $"pct_k_r4" > 100 ||
      $"pct_d_r4" < 0 || $"pct_d_r4" > 100).isEmpty)
    assert(out.filter($"close_c" < $"l14_c" || $"close_c" > $"h14_c").isEmpty)
    assert(out.groupBy($"event_type", $"day").count().filter($"count" > 1).isEmpty)
    assert(out.count() > 0)
    out.unpersist()
  }
}
