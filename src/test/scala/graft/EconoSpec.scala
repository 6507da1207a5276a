package graft

import java.sql.{Date, Timestamp}

import graft.queries.{BehaviorQueries, MarketQueries}

/** Round-11 econometrics + survival queries (q221–q225): designed
  * feeds with hand-computed answers pin VaR/CVaR order statistics,
  * the Kalman recursion, CUSUM alarms and the Kaplan-Meier curve
  * exactly; real-feed cross-pins tie q223's stage-1 β to q198's. */
class EconoSpec extends SparkSpec {
  import spark.implicits._

  private def day(k: Int) = Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(k))

  private def closes(tp: String, lvs: Seq[Long]) =
    lvs.zipWithIndex.map { case (lv, i) => (tp, day(i), lv) }
      .toDF("event_type", "day", "close_lv")

  test("q221 VaR/CVaR: designed 21-return series lands the order statistics exactly") {
    // exponent walk: 21 exact micro-log2 returns containing one -3e6
    // and one -2e6; k = ceil(21 * 0.05) = 2, so VaR is the 2nd-worst
    // (-2e6) and CVaR the mean of the two worst (-2.5e6).
    val diffs = Seq(-3, -2, 1, 1, 1, 1, -1, 1, -1, 1, 0, 0, 1, -1, 1, 0, 0, 1, -1, 1, 1)
    val ks = diffs.scanLeft(20)(_ + _)
    assert(ks.length == 22 && ks.min > 0)
    val r = MarketQueries.varCvarFromCloses(closes("A", ks.map(_ * 1000000L)))
      .collect().head
    assert(r.getAs[Long]("n_days") == 21L)
    assert(r.getAs[Long]("k_tail") == 2L)
    assert(r.getAs[Double]("var95_r4") == 2.0)
    assert(r.getAs[Double]("cvar95_r4") == 2.5)
  }

  test("q221 VaR <= CVaR on the real feed (the tail mean dominates its best member)") {
    MarketQueries.queries("q221_var_cvar")(spark, sf()).collect().foreach { r =>
      assert(r.getAs[Double]("cvar95_r4") >= r.getAs[Double]("var95_r4"))
      assert(r.getAs[Long]("k_tail") >= 1L)
    }
  }

  test("q222 Kalman: two-point series replays the first gain step exactly") {
    val (c1, c2) = (20000000L, 21000000L)
    val r = MarketQueries.kalmanFromCloses(closes("A", Seq(c1, c2))).collect().head
    assert(r.getAs[Long]("n_fc") == 1L)
    val e = (c2 - c1).toDouble
    assert(r.getAs[Double]("mae_kalman") == math.floor(e / 1e6 * 10000 + 0.5) / 10000)
    assert(r.getAs[Double]("skill_vs_naive") == 1.0) // same single error as naive
    // gain after one update: P' = (1 - K1)(P0 + Q); report (P'+Q)/((P'+Q)+R)
    val k1 = (1e10 + 1e9) / ((1e10 + 1e9) + 1e10)
    val p1 = (1.0 - k1) * (1e10 + 1e9)
    val want = math.floor((p1 + 1e9) / ((p1 + 1e9) + 1e10) * 10000 + 0.5) / 10000
    assert(r.getAs[Double]("gain_final") == want)
  }

  test("q222 Kalman: constant series has zero error and a null skill ratio") {
    val r = MarketQueries.kalmanFromCloses(closes("A", Seq.fill(10)(5000000L)))
      .collect().head
    assert(r.getAs[Double]("mae_kalman") == 0.0)
    assert(r.getAs[Double]("rmse_kalman") == 0.0)
    assert(r.getAs[Double]("mae_naive") == 0.0)
    assert(r.isNullAt(r.fieldIndex("skill_vs_naive"))) // 0/0 guarded, not NaN
  }

  test("q223 coint: identical and shifted series pin beta/alpha; zero residuals guard rho") {
    // B = A exactly; C = A + 1e6 (price doubled in log2 space)
    val lvs = Seq(2000000L, 3000000L, 2500000L, 2800000L, 2200000L)
    val cl = closes("A", lvs)
      .unionByName(closes("B", lvs))
      .unionByName(closes("C", lvs.map(_ + 1000000L)))
    val got = MarketQueries.cointFromCloses(cl).collect()
      .map(r => (r.getAs[String]("type_a"), r.getAs[String]("type_b")) -> r).toMap
    val ab = got(("A", "B"))
    assert(ab.getAs[Double]("beta_r4") == 1.0)
    assert(ab.getAs[Double]("alpha_r4") == 0.0)
    assert(ab.isNullAt(ab.fieldIndex("rho_r4")))        // zero residual variance
    assert(ab.isNullAt(ab.fieldIndex("cointegrated")))
    val ac = got(("A", "C"))
    // q223 regresses y=type_a's level on x=type_b's: A = C - 1e6
    assert(ac.getAs[Double]("beta_r4") == 1.0)
    assert(ac.getAs[Double]("alpha_r4") == -1.0)
  }

  test("q223 stage-1 beta agrees with q198's hedge ratio on the real feed") {
    val coint = MarketQueries.queries("q223_coint_screen")(spark, sf()).collect()
      .map(r => (r.getAs[String]("type_a"), r.getAs[String]("type_b")) ->
        r.getAs[Double]("beta_r4")).toMap
    val pairs = MarketQueries.queries("q198_pairs_spread")(spark, sf()).collect()
      .map(r => (r.getAs[String]("type_a"), r.getAs[String]("type_b")) ->
        r.getAs[Double]("beta")).toMap
    assert(coint.keySet == pairs.keySet)
    coint.foreach { case (k, b) => assert(b == pairs(k), s"beta mismatch on $k") }
  }

  test("q224 CUSUM: a planted level shift alarms on the hand-computed day") {
    // 10 days of 100 events then 10 days of 200: dev = 20x - 3000 =
    // -/+1000, sigma_dev = 1000, h = 5000. CUSUM- crosses h on day 6
    // (6000), stays >h through day 14; CUSUM+ alarms days 16-20:
    // 14 alarm days total, both maxima 10000 (= 500/day).
    val rows = (0 until 20).flatMap { d =>
      val n = if (d < 10) 100 else 200
      (0 until n).map(i => (Timestamp.valueOf(
        java.time.LocalDate.of(2024, 2, 1).plusDays(d).atTime(i / 60, i % 60)), "t"))
    }
    val r = BehaviorQueries.cusumDaily(rows.toDF("ts", "event_type")).collect().head
    assert(r.getAs[Long]("n_days") == 20L)
    assert(r.getAs[Long]("n_events") == 3000L)
    assert(r.getAs[Double]("mu_r4") == 150.0)
    assert(r.getAs[Double]("h_daily_r4") == 250.0)
    assert(r.getAs[Double]("max_cusum_pos_r4") == 500.0)
    assert(r.getAs[Double]("max_cusum_neg_r4") == 500.0)
    assert(r.getAs[Date]("first_alarm_day") ==
      Date.valueOf(java.time.LocalDate.of(2024, 2, 1).plusDays(5))) // 6th day
    assert(r.getAs[Long]("n_alarm_days") == 14L)
  }

  test("q224 on a steady feed: no alarm, cusum bounded") {
    val rows = (0 until 10).flatMap { d =>
      (0 until 50).map(i => (Timestamp.valueOf(
        java.time.LocalDate.of(2024, 2, 1).plusDays(d).atTime(i / 60, i % 60)), "t"))
    }
    val r = BehaviorQueries.cusumDaily(rows.toDF("ts", "event_type")).collect().head
    assert(r.getAs[Long]("n_alarm_days") == 0L)
    assert(r.isNullAt(r.fieldIndex("first_alarm_day")))
    assert(r.getAs[Double]("max_cusum_pos_r4") == 0.0)
  }

  test("q225 Kaplan-Meier: designed censored cohort replays the textbook curve") {
    def ts(d: Int) = Timestamp.valueOf(java.time.LocalDate.of(2024, 4, 1)
      .plusDays(d).atStartOfDay)
    // u1 converts at 1d; u2,u3 at 2d; u4 censored (signup d1, feed
    // ends d4 -> 3d); u5 converts at 4d (also the feed's last event);
    // u6's only purchase PRECEDES its signup -> censored at 2d.
    val ev = Seq(
      (1L, ts(0), 1L, "signup"), (1L, ts(1), 2L, "purchase"),
      (2L, ts(0), 3L, "signup"), (2L, ts(2), 4L, "purchase"),
      (3L, ts(0), 5L, "signup"), (3L, ts(2), 6L, "purchase"),
      (4L, ts(1), 7L, "signup"),
      (5L, ts(0), 8L, "signup"), (5L, ts(4), 9L, "purchase"),
      (6L, ts(0), 10L, "purchase"), (6L, ts(2), 11L, "signup"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = BehaviorQueries.kaplanMeier(ev).collect()
      .map(r => r.getAs[Long]("t_days") ->
        (r.getAs[Long]("n_risk"), r.getAs[Long]("n_conv"),
          r.getAs[Long]("n_cens"), r.getAs[Double]("surv_r4"))).toMap
    assert(got.size == 3)
    assert(got(1L) == ((6L, 1L, 0L, 0.8333))) // 1 - 1/6
    assert(got(2L) == ((5L, 2L, 1L, 0.5)))    // 5/6 * 3/5
    assert(got(4L) == ((1L, 1L, 0L, 0.0)))
  }

  test("q227 seasonal anomaly: the planted 3-sigma outlier is the only flag in its cell") {
    // 20 quiet values (100.00) + one outlier (200.00) in ONE
    // (type, hour) cell; a second cell stays uniform (never flags)
    val rows =
      (1 to 20).map(i => (i.toLong, Timestamp.valueOf(s"2024-05-01 09:${10 + i}:00"), "t", 100.0)) ++
        Seq((99L, Timestamp.valueOf("2024-05-01 09:59:00"), "t", 200.0)) ++
        (1 to 10).map(i => (200L + i, Timestamp.valueOf(s"2024-05-01 11:${10 + i}:00"), "t", 50.0))
    val got = BehaviorQueries.seasonalAnomalies(
      rows.toDF("event_id", "ts", "event_type", "value")).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[Long]("event_id") == 99L)
    assert(r.getAs[Int]("hh") == 9)
    assert(r.getAs[Double]("value_r4") == 200.0)
    // replay the exact integer-sum z formula
    val vc = (1 to 20).map(_ => 10000L) :+ 20000L
    val (n, s1) = (vc.length.toLong, vc.sum)
    val s2 = vc.map(v => BigInt(v) * BigInt(v)).sum
    val den = math.sqrt(n.toDouble * s2.toDouble - s1.toDouble * s1.toDouble)
    val want = math.floor((n * 20000L - s1).toDouble / den * 10000 + 0.5) / 10000
    assert(r.getAs[Double]("z_r4") == want)
  }

  test("q227 flags agree with a direct per-cell z-score on the real feed") {
    val rows = BehaviorQueries.queries("q227_seasonal_anomaly")(spark, sf()).collect()
    rows.foreach(r => assert(math.abs(r.getAs[Double]("z_r4")) > 2.999,
      s"flagged row must sit beyond 3 sigma: ${r}"))
  }

  test("q225 survival is monotone non-increasing and risk sets shrink on the real feed") {
    val rows = BehaviorQueries.queries("q225_kaplan_meier")(spark, sf()).collect()
      .sortBy(_.getAs[Long]("t_days"))
    assert(rows.nonEmpty)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Double]("surv_r4") <= a.getAs[Double]("surv_r4"))
        assert(b.getAs[Long]("n_risk") < a.getAs[Long]("n_risk"))
      case _ =>
    }
    rows.foreach(r => assert(r.getAs[Long]("n_risk") >= r.getAs[Long]("n_conv")))
  }
}
