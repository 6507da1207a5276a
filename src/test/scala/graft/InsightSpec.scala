package graft

import graft.queries.{InsightQueries, MarketQueries}

/** Round-12 decision-analytics surface (q246/q248/q249 + q247):
  * designed feeds with hand-computed answers for the basket rules,
  * the median/MAD screen, the WoE/IV screen, and the ACF/Ljung-Box
  * diagnostic, plus real-feed invariants. */
class InsightSpec extends SparkSpec {
  import spark.implicits._

  // ---- q246 basket rules -----------------------------------------
  test("basketRules: a planted always-together pair scores lift n/c and confidence 1") {
    // parts 1 and 2 co-occur in all 5 of their orders; part 3 rides
    // in every order (lift 1 against anything)
    val li = (1L to 5L).flatMap(o => Seq((o, 1L), (o, 2L), (o, 3L))) ++
      (6L to 10L).map(o => (o, 3L))
    val df = li.toDF("l_orderkey", "l_partkey")
    val got = InsightQueries.basketRules(df, minItem = 5L, minPair = 2L)
      .collect().map(r => (r.getAs[Long]("part_a"), r.getAs[Long]("part_b")) -> r).toMap
    // pair (1,2): c_a=5, c_b=5, c_ab=5, n=10 -> support .5, conf 1/1, lift 10*5/25=2
    val p12 = got((1L, 2L))
    assert(p12.getAs[Long]("c_ab") == 5L)
    assert(p12.getAs[Double]("support_r6") == 0.5)
    assert(p12.getAs[Double]("conf_a_to_b_r6") == 1.0)
    assert(p12.getAs[Double]("conf_b_to_a_r6") == 1.0)
    assert(p12.getAs[Double]("lift_r6") == 2.0)
    // pair (1,3): c_ab=5, c_a=5, c_b=10 -> lift 10*5/50 = 1 (independent)
    assert(got((1L, 3L)).getAs[Double]("lift_r6") == 1.0)
    assert(got((1L, 3L)).getAs[Double]("conf_b_to_a_r6") == 0.5)
  }

  test("basketRules: the apriori item cut removes sub-support items before pairing") {
    // part 9 appears twice (< minItem 5) always with part 1 — without
    // the prune it would be the top-lift pair
    val li = (1L to 5L).flatMap(o => Seq((o, 1L), (o, 2L))) ++
      Seq((1L, 9L), (2L, 9L))
    val got = InsightQueries.basketRules(li.toDF("l_orderkey", "l_partkey"),
      minItem = 5L, minPair = 2L).collect()
    assert(!got.exists(r => r.getAs[Long]("part_a") == 9L || r.getAs[Long]("part_b") == 9L))
    assert(got.length == 1) // only (1,2) survives
  }

  test("basketRules: heavy singleton-laden baskets — pre-pair prune cuts the fan-out, result identical to the unpruned cell path") {
    import org.apache.spark.sql.functions._
    // the retail shape TPC-H never exercises: 300 orders of 40 lines
    // each — 5 lines from an 8-part frequent vocabulary, 35 lines of
    // order-unique singleton parts (support 1 < minItem). Without the
    // pre-pair semi-join the self-join fans out sum |basket|^2 =
    // 300*40^2 = 480k rows; with it, sum |frequent-basket|^2 =
    // 300*5^2 = 7.5k — a 64x cut that grows with basket size.
    val li = (1L to 300L).flatMap { o =>
      val freq = (0 until 5).map(i => (o, (o + i) % 8 + 1))
      val singles = (0 until 35).map(i => (o, 1000L + o * 35L + i))
      freq ++ singles
    }
    val df = li.toDF("l_orderkey", "l_partkey")
    val pruned = InsightQueries.basketRules(df, minItem = 5L, minPair = 2L)
      .collect().map(_.toSeq)
    // the cell path is DELIBERATELY unpruned (additive merge): same
    // closing thresholds must give the identical rules
    val viaCells = InsightQueries.rulesFromCells(
      InsightQueries.basketCells(df), minItem = 5L, minPair = 2L)
      .collect().map(_.toSeq)
    assert(pruned.toSeq == viaCells.toSeq,
      "pruned batch path and unpruned cell path must agree bitwise (order included)")
    // measure the fan-out cut the prune buys: per-order basket sizes
    // squared, before vs after the frequent-item semi-join
    val sp = df.select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val items = sp.groupBy("p").agg(count(lit(1)).as("c")).filter(col("c") >= 5L)
    val spF = sp.join(items.select("p"), Seq("p"), "left_semi")
    def fanOut(g: org.apache.spark.sql.DataFrame): Long =
      g.groupBy("o").agg(count(lit(1)).as("sz"))
        .agg(sum(col("sz") * col("sz"))).head().getLong(0)
    val (fanAll, fanPruned) = (fanOut(sp), fanOut(spF))
    assert(fanAll >= 480000L && fanPruned <= 7500L,
      s"fan-out must collapse: all=$fanAll pruned=$fanPruned")
  }

  test("q246 on testdata: deterministic top-k, lift-ordered, counts consistent") {
    val rows = InsightQueries.queries("q246_basket_rules")(spark, sf("sf0.01")).collect()
    assert(rows.nonEmpty && rows.length <= 100)
    val lifts = rows.map(_.getAs[Double]("lift_r6"))
    assert(lifts.zip(lifts.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      assert(r.getAs[Long]("c_ab") <= math.min(r.getAs[Long]("c_a"), r.getAs[Long]("c_b")))
      assert(r.getAs[Long]("part_a") < r.getAs[Long]("part_b"))
    }
  }

  // ---- q248 median/MAD -------------------------------------------
  test("madOutliers: hand-computed median, MAD and the exact 3*1.4826 cut") {
    // values (cents): 100,200,300,400,10000 -> lower median 300 (n=5,
    // (n+1) DIV 2 = 3); deviations 200,100,0,100,9700 -> sorted
    // 0,100,100,200,9700 -> MAD 100; cut: |vc-300|*10000 > 44478*100
    // = 4447800 -> |vc-300| > 444.78 -> only 10000 qualifies
    val e = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0), ("a", 100.0))
      .toDF("event_type", "value")
    val r = InsightQueries.madOutliers(e).collect().head
    assert(r.getAs[Long]("n") == 5L)
    assert(r.getAs[Double]("median_r2") == 3.0)
    assert(r.getAs[Double]("mad_r2") == 1.0)
    assert(r.getAs[Long]("n_out") == 1L)
    assert(r.getAs[Double]("out_share_r6") == 0.2)
  }

  test("madOutliers: robust to the contamination that drags the mean (even n, ties)") {
    // 6 values, half ties: 10,10,10,20,20,1000 -> (6+1) DIV 2 = 3 ->
    // median 10 (cum at vc=1000 reaches 3); deviations 0,0,0,10,10,990
    // -> MAD 0 -> cut 44478*0 = 0 -> every vc != med is an outlier
    val e = Seq(("a", 0.1), ("a", 0.1), ("a", 0.1), ("a", 0.2), ("a", 0.2), ("a", 10.0))
      .toDF("event_type", "value")
    val r = InsightQueries.madOutliers(e).collect().head
    assert(r.getAs[Double]("median_r2") == 0.1)
    assert(r.getAs[Double]("mad_r2") == 0.0)
    assert(r.getAs[Long]("n_out") == 3L)
  }

  // ---- q249 WoE/IV -----------------------------------------------
  test("infoValue: a perfectly separating band gets the dominant IV share; totals add up") {
    // good users (14 purchases) emit value 8.0 (band 3); bad users
    // (0 purchases) emit value 1.0 (band 0)
    val ev =
      (1L to 2L).flatMap { u =>
        (1 to 14).map(i => (u, "purchase", 8.0)) ++ Seq((u, "view", 8.0))
      } ++ (3L to 4L).flatMap { u => (1 to 15).map(_ => (u, "view", 1.0)) }
    val got = InsightQueries.infoValue(
      ev.toDF("user_id", "event_type", "value")).collect()
    val bands = got.filter(_.getAs[Long]("band") != -1000000L)
    val overall = got.find(_.getAs[Long]("band") == -1000000L).get
    assert(bands.map(_.getAs[Long]("n_good")).sum == overall.getAs[Long]("n_good"))
    assert(bands.map(_.getAs[Long]("n_bad")).sum == overall.getAs[Long]("n_bad"))
    val b3 = bands.find(_.getAs[Long]("band") == 3L).get
    val b0 = bands.find(_.getAs[Long]("band") == 0L).get
    assert(b3.getAs[Long]("n_good") == 30L && b3.getAs[Long]("n_bad") == 0L)
    assert(b0.getAs[Long]("n_good") == 0L && b0.getAs[Long]("n_bad") == 30L)
    assert(b3.getAs[Double]("woe_r6") > 0 && b0.getAs[Double]("woe_r6") < 0)
    // perfect separation -> strong feature by the standard rubric
    assert(overall.getAs[Double]("iv_term") > 0.3)
  }

  test("infoValue: identical distributions score IV ~ 0") {
    val ev = (1L to 2L).flatMap { u =>
      (1 to 14).map(_ => (u, "purchase", 4.0)) ++ (1 to 10).map(_ => (u, "view", 1.0))
    } ++ (3L to 4L).flatMap { u =>
      (1 to 14).map(_ => (u, "view", 4.0)) ++ (1 to 10).map(_ => (u, "view", 1.0))
    }
    val overall = InsightQueries.infoValue(ev.toDF("user_id", "event_type", "value"))
      .collect().find(_.getAs[Long]("band") == -1000000L).get
    assert(math.abs(overall.getAs[Double]("iv_term")) < 0.001)
  }

  // ---- q250 Mann-Whitney -----------------------------------------
  private def dayVals(rows: Seq[(String, Int, Double)]) = {
    val d0 = java.sql.Date.valueOf("2024-01-01")
    rows.map { case (t, d, v) =>
      (t, new java.sql.Date(d0.getTime + d * 86400000L), v)
    }.toDF("event_type", "day", "value")
  }

  test("mannWhitney: complete separation lands exactly on the textbook z and the 1.96 boundary") {
    // early {1,2,3} vs late {4,5,6}: U1 = 0, z = -9 / (2*sqrt(5.25))
    // = -1.96396 -> z4 = -19640, |z4| > 19600 -> reject
    val e = dayVals(Seq(("a", 0, 0.01), ("a", 1, 0.02), ("a", 2, 0.03),
      ("a", 3, 0.04), ("a", 4, 0.05), ("a", 5, 0.06)))
    val r = InsightQueries.mannWhitney(e).collect().head
    assert(r.getAs[Long]("n_early") == 3L && r.getAs[Long]("n_late") == 3L)
    assert(r.getAs[Double]("u1") == 0.0)
    assert(r.getAs[Double]("z_r4") == -1.964)
    assert(r.getAs[Boolean]("reject"))
  }

  test("mannWhitney: midranks and the tie correction are exact on a designed tie") {
    // early {1,2} late {2,3} (cents 100,200 | 200,300): R1 = 1 + 2.5
    // -> u1 = 0.5; T = 6 -> var = 1.5 -> z = -3/(2*sqrt(1.5)) = -1.2247
    val e = dayVals(Seq(("a", 0, 1.0), ("a", 1, 2.0), ("a", 2, 2.0), ("a", 3, 3.0)))
    val r = InsightQueries.mannWhitney(e).collect().head
    assert(r.getAs[Double]("u1") == 0.5)
    assert(math.abs(r.getAs[Double]("z_r4") - (-1.2247)) < 1e-9)
    assert(!r.getAs[Boolean]("reject"))
  }

  // ---- q286 Ansari-Bradley ----------------------------------------
  test("ansariBradley: symmetric interleave gives z = 0; the textbook tie case z = 1 exactly") {
    // early {1,3} late {2,4} (cents): scores 1,2,2,1 from both ends,
    // AB = 1 + 2 = 3 = E -> z = 0
    val e = dayVals(Seq(("a", 0, 0.01), ("a", 1, 0.03),
      ("a", 2, 0.02), ("a", 3, 0.04)))
    val r = InsightQueries.ansariBradley(e).collect().head
    assert(r.getAs[Long]("n_early") == 2L && r.getAs[Long]("n_late") == 2L)
    assert(r.getAs[Double]("ab_r4") == 3.0)
    assert(r.getAs[Double]("z_r4") == 0.0)
    assert(!r.getAs[Boolean]("reject"))
    // early {1,1} late {1,2}: the rank-1..3 tie at cents 1 averages
    // scores (1+2+2)/3 = 5/3, AB = 2*(5/3) = 3.3333; E = 3,
    // Var = 1/9 (through the 1e-6 per-row quantizer) -> z = 1.0
    val t = dayVals(Seq(("a", 0, 0.01), ("a", 1, 0.01),
      ("a", 2, 0.01), ("a", 3, 0.02)))
    val rt = InsightQueries.ansariBradley(t).collect().head
    assert(rt.getAs[Double]("ab_r4") == 3.3333)
    assert(rt.getAs[Double]("z_r4") == 1.0)
  }

  test("ansariBradley: late tails vs early core rejects with z > 0; a one-cell grid answers NULL") {
    // early: 9 obs at the median value; late: 8 obs at the extremes
    // (4 low, 4 high) -> early holds ALL the large both-end scores,
    // AB = 61 vs E = 42.88, z = 4.0 -> scale drift, reject
    val rows = (0 until 9).map(i => ("a", i % 2, 0.50)) ++
      (0 until 4).map(i => ("a", 2 + i % 2, 0.01)) ++
      (0 until 4).map(i => ("a", 2 + i % 2, 1.00))
    val r = InsightQueries.ansariBradley(dayVals(rows)).collect().head
    assert(r.getAs[Double]("z_r4") > 1.96, s"got ${r.getAs[Double]("z_r4")}")
    assert(r.getAs[Boolean]("reject"))
    // every observation identical -> one grid cell, zero score
    // spread -> NULL verdicts (never a 0/0 z)
    val c = dayVals(Seq(("a", 0, 0.05), ("a", 1, 0.05),
      ("a", 2, 0.05), ("a", 3, 0.05)))
    val rc = InsightQueries.ansariBradley(c).collect().head
    assert(rc.isNullAt(rc.fieldIndex("z_r4")) &&
      rc.isNullAt(rc.fieldIndex("reject")))
  }

  // ---- q290 Cliff's delta -----------------------------------------
  test("cliffsDelta: separation, overlap, and tie cases land on the exact textbook values") {
    // complete separation: delta 1, A 1, large
    val sep = dayVals(Seq(("a", 0, 0.01), ("a", 1, 0.02),
      ("a", 2, 0.03), ("a", 3, 0.04)))
    val r1 = InsightQueries.cliffsDelta(sep).collect().head
    assert(r1.getAs[Double]("delta_r6") == 1.0 &&
      r1.getAs[Double]("vda_r6") == 1.0 &&
      r1.getAs[String]("magnitude") == "large")
    // interleaved early {1,3} late {2,4}: gt = 3, lt = 1 ->
    // delta 0.5 (> 0.474 -> large), A = 0.75
    val mix = dayVals(Seq(("a", 0, 0.01), ("a", 1, 0.03),
      ("a", 2, 0.02), ("a", 3, 0.04)))
    val r2 = InsightQueries.cliffsDelta(mix).collect().head
    assert(r2.getAs[Double]("delta_r6") == 0.5 &&
      r2.getAs[Double]("vda_r6") == 0.75 &&
      r2.getAs[String]("magnitude") == "large")
    // identical distributions (ties count half into A): delta 0,
    // A 0.5, negligible
    val eq = dayVals(Seq(("a", 0, 0.01), ("a", 1, 0.02),
      ("a", 2, 0.01), ("a", 3, 0.02)))
    val r3 = InsightQueries.cliffsDelta(eq).collect().head
    assert(r3.getAs[Double]("delta_r6") == 0.0 &&
      r3.getAs[Double]("vda_r6") == 0.5 &&
      r3.getAs[String]("magnitude") == "negligible")
  }

  // ---- q289 D'Agostino K² ------------------------------------------
  test("dagostinoK2: symmetric spread scores z_skew = 0 and keeps; gross right skew rejects") {
    // +-1..12 micro-units: g1 = 0 exactly -> z_skew 0; the flat
    // spread is platykurtic (z_kurt -2.2354) but K2 = 4.997 < 5.9915
    val sym = retRows((1 to 12).flatMap(i =>
      Seq(("a", 2 * i, i.toLong), ("a", 2 * i + 1, -i.toLong))))
    val r = MarketQueries.dagostinoK2(sym).collect().head
    assert(r.getAs[Long]("n_days") == 24L)
    assert(r.getAs[Double]("z_skew_r4") == 0.0)
    assert(r.getAs[Double]("z_kurt_r4") == -2.2354)
    assert(r.getAs[Double]("k2_r4") == 4.997)
    assert(!r.getAs[Boolean]("reject"))
    // 20x1, 3x2, 1x100: the transforms push both z's past 5 -> reject
    val sk = retRows(((0 until 20).map(i => ("a", i, 1L)) ++
      (0 until 3).map(i => ("a", 20 + i, 2L)) :+ ("a", 23, 100L)))
    val rs = MarketQueries.dagostinoK2(sk).collect().head
    assert(rs.getAs[Double]("z_skew_r4") == 5.9148)
    assert(rs.getAs[Double]("z_kurt_r4") == 5.0005)
    assert(rs.getAs[Double]("k2_r4") == 59.9899)
    assert(rs.getAs[Boolean]("reject"))
  }

  test("dagostinoK2: n < 20 and zero-variance series answer NULL (the transform's own floor)") {
    val few = retRows((0 until 19).map(i => ("a", i, (i % 5).toLong)))
    val r = MarketQueries.dagostinoK2(few).collect().head
    assert(r.isNullAt(r.fieldIndex("z_skew_r4")) &&
      r.isNullAt(r.fieldIndex("k2_r4")) && r.isNullAt(r.fieldIndex("reject")))
    val flat = retRows((0 until 25).map(i => ("a", i, 7L)))
    val rf = MarketQueries.dagostinoK2(flat).collect().head
    assert(rf.isNullAt(rf.fieldIndex("z_skew_r4")) &&
      rf.isNullAt(rf.fieldIndex("reject")))
  }

  // ---- q292 tabular CUSUM -----------------------------------------
  test("cusumFromReturns: a level shift walks the textbook S-path — alarms, first index, max excursions") {
    // 10 days at r = 0, then 10 at r = 10: mu = 5, sigma = 5 ->
    // k = 2.5, h = 20. S- climbs 2.5/day over the low half (alarms
    // at i = 9, 10, peak 25 = 5sigma), decays over the high half
    // while S+ climbs symmetrically (alarms at i = 19, 20)
    val rets = retRows((0 until 10).map(i => ("a", i, 0L)) ++
      (10 until 20).map(i => ("a", i, 10L)))
    val r = MarketQueries.cusumFromReturns(rets).collect().head
    assert(r.getAs[Long]("n_days") == 20L)
    assert(r.getAs[Double]("max_pos_r4") == 5.0)
    assert(r.getAs[Double]("max_neg_r4") == 5.0)
    assert(r.getAs[Long]("n_alarms") == 4L)
    assert(r.getAs[Long]("first_alarm") == 9L)
  }

  test("cusumFromReturns: steady series never alarms; flat and single-day series answer NULL") {
    // alternating +-1 around mu = 0, sigma = 1: |x - mu| - k = 0.5
    // but each step flips sign, S never accumulates past 0.5 < h = 4
    val steady = retRows((0 until 30).map(i =>
      ("a", i, if (i % 2 == 0) 1L else -1L)))
    val r = MarketQueries.cusumFromReturns(steady).collect().head
    assert(r.getAs[Long]("n_alarms") == 0L)
    assert(r.isNullAt(r.fieldIndex("first_alarm")))
    assert(r.getAs[Double]("max_pos_r4") <= 0.5)
    val flat = retRows((0 until 10).map(i => ("a", i, 3L)))
    val rf = MarketQueries.cusumFromReturns(flat).collect().head
    assert(rf.isNullAt(rf.fieldIndex("max_pos_r4")) &&
      rf.isNullAt(rf.fieldIndex("n_alarms")))
  }

  // ---- q251 Spearman ----------------------------------------------
  private def retRows(rows: Seq[(String, Int, Long)]) = {
    val d0 = java.sql.Date.valueOf("2024-01-01")
    rows.map { case (t, d, r) =>
      (t, new java.sql.Date(d0.getTime + d * 86400000L), r)
    }.toDF("event_type", "day", "r_fp")
  }

  test("spearmanPairs: monotone nonlinear relation scores exactly +1, inverted -1") {
    val rets = retRows(
      (0 until 4).map(i => ("a", i, (i + 1).toLong)) ++
        (0 until 4).map(i => ("b", i, math.pow(i + 1, 3).toLong)) ++
        (0 until 4).map(i => ("c", i, -(i + 1).toLong)))
    val got = InsightQueries.spearmanPairs(rets).collect()
      .map(r => (r.getAs[String]("type_a"), r.getAs[String]("type_b")) -> r).toMap
    assert(got(("a", "b")).getAs[Double]("spearman_r6") == 1.0)
    assert(got(("a", "c")).getAs[Double]("spearman_r6") == -1.0)
    assert(got(("b", "c")).getAs[Double]("spearman_r6") == -1.0)
  }

  test("spearmanPairs: outlier that wrecks Pearson leaves Spearman at 1 (rank invariance)") {
    val rets = retRows(
      Seq(("a", 0, 1L), ("a", 1, 2L), ("a", 2, 3L), ("a", 3, 4L),
        ("b", 0, 10L), ("b", 1, 20L), ("b", 2, 30L), ("b", 3, 4000000L)))
    val got = InsightQueries.spearmanPairs(rets).collect().head
    assert(got.getAs[Double]("spearman_r6") == 1.0)
  }

  // ---- q252 Theil-Sen ----------------------------------------------
  test("theilSen: the median slope ignores the flash-crash day OLS is dragged by") {
    val d0 = java.sql.Date.valueOf("2024-01-01")
    def day(i: Int) = new java.sql.Date(d0.getTime + i * 86400000L)
    // perfect 1.0-log2/day line with one wild last day
    val cl = Seq(0L, 1000000L, 2000000L, 3000000L, 100000000L).zipWithIndex
      .map { case (lv, i) => ("a", day(i), lv) }
      .toDF("event_type", "day", "close_lv")
    val r = InsightQueries.theilSen(cl).collect().head
    assert(r.getAs[Long]("n_days") == 5L && r.getAs[Long]("n_pairs") == 10L)
    assert(r.getAs[Double]("ts_slope_r4") == 1.0)
    assert(r.getAs[Double]("ols_slope_r4") > 10.0) // dragged by the outlier
  }

  test("theilSen: exact line recovers the slope exactly on both estimators") {
    val d0 = java.sql.Date.valueOf("2024-01-01")
    def day(i: Int) = new java.sql.Date(d0.getTime + i * 86400000L)
    val cl = (0 until 6).map(i => ("a", day(i), i * 500000L))
      .toDF("event_type", "day", "close_lv")
    val r = InsightQueries.theilSen(cl).collect().head
    assert(r.getAs[Double]("ts_slope_r4") == 0.5)
    assert(r.getAs[Double]("ols_slope_r4") == 0.5)
  }

  // ---- q253 decision stump ----------------------------------------
  test("stumpSplit: a perfectly separating band cut recovers the full parent entropy ln 2") {
    // good users (14 purchases) emit band 3; bad users band 0 — the
    // only candidate threshold (band 0) splits perfectly, so gain =
    // H(parent) = ln 2
    val ev =
      (1L to 2L).flatMap { u =>
        (1 to 14).map(_ => (u, "purchase", 8.0)) ++ Seq((u, "view", 8.0))
      } ++ (3L to 4L).flatMap { u => (1 to 15).map(_ => (u, "view", 1.0)) }
    val got = InsightQueries.stumpSplit(
      ev.toDF("user_id", "event_type", "value")).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[Long]("band_thresh") == 0L)
    assert(r.getAs[Long]("n_left_good") == 0L && r.getAs[Long]("n_left_bad") == 30L)
    assert(r.getAs[Long]("n_right_good") == 30L && r.getAs[Long]("n_right_bad") == 0L)
    assert(r.getAs[Double]("gain_r6") == 0.693147)
    assert(r.getAs[Boolean]("is_best"))
  }

  test("stumpSplit on testdata: exactly one best row, gains bounded by parent entropy") {
    val rows = InsightQueries.queries("q253_stump_split")(spark, sf("sf0.01")).collect()
    assert(rows.nonEmpty)
    assert(rows.count(_.getAs[Boolean]("is_best")) == 1)
    rows.foreach { r =>
      assert(r.getAs[Double]("gain_r6") >= -1e-6 && r.getAs[Double]("gain_r6") < 0.6932)
    }
  }

  // ---- q254 Kendall tau-b ----------------------------------------
  test("kendallPairs: monotone = +1, inverted = -1, and the tie-corrected textbook value") {
    val rets = retRows(
      (0 until 4).map(i => ("a", i, (i + 1).toLong)) ++
        (0 until 4).map(i => ("b", i, ((i + 1) * (i + 1)).toLong)) ++
        (0 until 4).map(i => ("c", i, -(i + 1).toLong)))
    val got = InsightQueries.kendallPairs(rets).collect()
      .map(r => (r.getAs[String]("type_a"), r.getAs[String]("type_b")) -> r).toMap
    assert(got(("a", "b")).getAs[Double]("tau_b_r6") == 1.0)
    assert(got(("a", "c")).getAs[Double]("tau_b_r6") == -1.0)
    // designed tie: x = (1,1,2), y = (5,6,7) -> C=2, D=0, nx=1, ny=0,
    // tau_b = 2/sqrt(2*3) = 0.8164965... -> r6 0.816497
    val tied = retRows(Seq(("x", 0, 1L), ("x", 1, 1L), ("x", 2, 2L),
      ("y", 0, 5L), ("y", 1, 6L), ("y", 2, 7L)))
    val t = InsightQueries.kendallPairs(tied).collect().head
    assert(t.getAs[Long]("n_pairs") == 3L)
    assert(t.getAs[Long]("n_concordant") == 2L && t.getAs[Long]("n_discordant") == 0L)
    assert(t.getAs[Double]("tau_b_r6") == 0.816497)
  }

  test("kendallPairs: a constant series has no defined tau (zero denominator)") {
    val rets = retRows(Seq(("a", 0, 7L), ("a", 1, 7L), ("a", 2, 7L),
      ("b", 0, 1L), ("b", 1, 2L), ("b", 2, 3L)))
    val t = InsightQueries.kendallPairs(rets).collect().head
    assert(t.isNullAt(t.fieldIndex("tau_b_r6")))
  }

  // ---- q255 HHI ----------------------------------------------------
  test("hhi: duopoly scores 0.5 and the 0.25 boundary is an exact integer decision") {
    val cust = Seq((1L, 100L), (1L, 100L),
      (2L, 25L), (2L, 25L), (2L, 25L), (2L, 25L)).toDF("c_nationkey", "cents")
    val got = InsightQueries.hhi(cust).collect()
      .map(r => r.getAs[Long]("c_nationkey") -> r).toMap
    assert(got(1L).getAs[Double]("hhi_r6") == 0.5)
    assert(got(1L).getAs[Boolean]("concentrated"))
    // four equal shares: HHI exactly 0.25 -> 4*s2 == s1^2, NOT >
    assert(got(2L).getAs[Double]("hhi_r6") == 0.25)
    assert(!got(2L).getAs[Boolean]("concentrated"))
    assert(got(2L).getAs[Double]("top_share_r6") == 0.25)
  }

  // ---- q247 ACF/Ljung-Box ----------------------------------------
  test("acfLjungBox: a period-2 alternating series scores acf1 = -1, acf2 = +1 exactly") {
    val d0 = java.sql.Date.valueOf("2024-01-01")
    def day(i: Int) = new java.sql.Date(d0.getTime + i * 86400000L)
    // returns +1,-1,+1,-1,... (exactly demeaned already: mean 0 over even n)
    val rets = (0 until 12).map(i => ("a", day(i), if (i % 2 == 0) 1L else -1L))
      .toDF("event_type", "day", "r_fp")
    val r = MarketQueries.acfLjungBox(rets).collect().head
    assert(r.getAs[Long]("n_days") == 12L)
    assert(math.abs(r.getAs[Double]("acf1_r6") - (-11.0 / 12.0)) < 1e-5)
    assert(r.getAs[Double]("acf2_r6") > 0.8)
    // strongly autocorrelated -> Ljung-Box rejects loudly
    assert(r.getAs[Double]("lb_q_r4") > 15.0)
  }

  // ---- q283 Gini coefficient ----------------------------------------
  test("giniMd: equality gives 0, one-holder gives (n-1)/n, the 1..4 textbook case gives 0.25") {
    def g(vs: Seq[Long]) = InsightQueries
      .giniMd(vs.toDF("vc"), "t").collect().head
    assert(g(Seq(5L, 5L, 5L, 5L)).getAs[Double]("gini_r6") == 0.0)
    // {0,0,0,10}: all value in one hand -> G = (n-1)/n = 0.75
    assert(g(Seq(0L, 0L, 0L, 10L)).getAs[Double]("gini_r6") == 0.75)
    // {1,2,3,4}: sum |xi-xj| over pairs = 10, n*S = 40 -> 0.25
    assert(g(Seq(1L, 2L, 3L, 4L)).getAs[Double]("gini_r6") == 0.25)
    // ties contribute zero to the pair sum: {1,1,3,3} -> 8/32 = 0.25
    assert(g(Seq(1L, 1L, 3L, 3L)).getAs[Double]("gini_r6") == 0.25)
    // degenerate: all zeros -> S = 0 -> NULL
    val z = g(Seq(0L, 0L, 0L))
    assert(z.isNullAt(z.fieldIndex("gini_r6")))
  }

  // ---- q281 ARCH effect (McLeod-Li) --------------------------------
  test("archLm: constant-magnitude returns have NO arch effect (null), block volatility rejects") {
    val d0 = java.sql.Date.valueOf("2024-01-01")
    def day(i: Int) = new java.sql.Date(d0.getTime + i * 86400000L)
    // q247's alternating anchor: returns +1,-1,... — STRONGLY serially
    // correlated (q247 rejects on it) but |r| is constant, so the
    // SQUARES have zero variance: a_den = 0, ACFs of r² null, no ARCH
    // verdict — the two tests answer different questions by design
    val alt = (0 until 12).map(i => ("a", day(i), if (i % 2 == 0) 1L else -1L))
      .toDF("event_type", "day", "r_fp")
    val r0 = MarketQueries.archLm(alt).collect().head
    assert(r0.isNullAt(r0.fieldIndex("acf1_r6")))
    assert(r0.isNullAt(r0.fieldIndex("reject_arch")))
    // volatility CLUSTERS: blocks of |r|=5 then |r|=1 (signs alternate
    // so the return level is noise) — squares 25,25,25,25,1,1,1,1,...
    // are block-autocorrelated, the ARCH signature
    val blocks = (0 until 40).map { i =>
      val mag = if ((i / 4) % 2 == 0) 5L else 1L
      ("a", day(i), if (i % 2 == 0) mag else -mag)
    }.toDF("event_type", "day", "r_fp")
    val r1 = MarketQueries.archLm(blocks).collect().head
    assert(r1.getAs[Double]("acf1_r6") > 0.3,
      s"block volatility must autocorrelate squares, got ${r1.getAs[Double]("acf1_r6")}")
    assert(r1.getAs[Boolean]("reject_arch"))
    // the fixed df=5 boundary: lb must exceed 11.0705 for the reject
    assert(r1.getAs[Double]("lb_q_r4") > 11.0705)
  }

  test("archLm: a CONSTANT price series (every return zero) answers NULL, not reject") {
    // the round-15 documented-but-unpinned degenerate: a flat closes
    // feed gives r = 0 every day, so r² is identically zero — zero
    // variance in the squares, a_den = 0, and the McLeod-Li verdict
    // must be NULL on the whole row (never a spurious keep/reject)
    val d0 = java.sql.Date.valueOf("2024-01-01")
    def day(i: Int) = new java.sql.Date(d0.getTime + i * 86400000L)
    val flat = (0 until 20).map(i => ("a", day(i), 0L))
      .toDF("event_type", "day", "r_fp")
    val r = MarketQueries.archLm(flat).collect().head
    assert(r.isNullAt(r.fieldIndex("acf1_r6")))
    assert(r.isNullAt(r.fieldIndex("lb_q_r4")))
    assert(r.isNullAt(r.fieldIndex("reject_arch")))
  }

  // ---- q282 weekday effect ----------------------------------------
  test("weekday effect: a planted Friday jump rejects; a weekday-free ramp keeps H0") {
    val d0 = java.time.LocalDate.of(2024, 1, 1) // a Monday
    def day(i: Int) = java.sql.Date.valueOf(d0.plusDays(i.toLong))
    def wk(i: Int) = (java.time.temporal.ChronoUnit.DAYS.between(
      java.time.LocalDate.of(1970, 1, 1), d0.plusDays(i.toLong)) % 7).toString
    // 10 full weeks; Fridays return +1000+i (distinct), others i
    // (distinct, small) — the Friday group's ranks are the top decile
    val jump = (0 until 70).map(i =>
      (wk(i), if (d0.plusDays(i.toLong).getDayOfWeek.getValue == 5) 1000L + i
       else i.toLong)).toDF("gk", "vc")
    val r1 = InsightQueries.kruskalWallis(jump, "t").collect().head
    assert(r1.getAs[Long]("k_groups") == 7L)
    assert(r1.getAs[Boolean]("reject"))
    // a monotone ramp spreads ranks evenly across weekdays: no effect
    val ramp = (0 until 70).map(i => (wk(i), i.toLong)).toDF("gk", "vc")
    val r2 = InsightQueries.kruskalWallis(ramp, "t").collect().head
    assert(!r2.getAs[Boolean]("reject"))
  }

  test("pacf: lag-1 PACF equals lag-1 ACF, and the Durbin-Levinson recursion replays exactly") {
    def q4(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val acf = MarketQueries.acfLjungBox(
      MarketQueries.dailyReturns(spark, sf("sf0.01"))).collect()
      .map(r => r.getAs[String]("event_type") ->
        (1 to 5).map(k => r.getAs[Double](s"acf${k}_r6"))).toMap
    val got = MarketQueries.pacf(
      MarketQueries.dailyReturns(spark, sf("sf0.01"))).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val t = r.getAs[String]("event_type")
      val Seq(r1, r2, r3, r4, r5) = acf(t)
      // the same unrolled recursion, same operation order
      val p11 = r1
      val den2 = 1.0 - p11 * r1
      val p22 = (r2 - p11 * r1) / den2
      val p21 = p11 - p22 * p11
      val den3 = 1.0 - (p21 * r1 + p22 * r2)
      val p33 = (r3 - (p21 * r2 + p22 * r1)) / den3
      val p31 = p21 - p33 * p22; val p32 = p22 - p33 * p21
      val den4 = 1.0 - (p31 * r1 + p32 * r2 + p33 * r3)
      val p44 = (r4 - (p31 * r3 + p32 * r2 + p33 * r1)) / den4
      val p41 = p31 - p44 * p33; val p42 = p32 - p44 * p32; val p43 = p33 - p44 * p31
      val den5 = 1.0 - (p41 * r1 + p42 * r2 + p43 * r3 + p44 * r4)
      val p55 = (r5 - (p41 * r4 + p42 * r3 + p43 * r2 + p44 * r1)) / den5
      assert(r.getAs[Double]("pacf1_r6") == q4(p11), s"$t pacf1")
      assert(r.getAs[Double]("pacf2_r6") == q4(p22), s"$t pacf2")
      assert(r.getAs[Double]("pacf3_r6") == q4(p33), s"$t pacf3")
      assert(r.getAs[Double]("pacf4_r6") == q4(p44), s"$t pacf4")
      assert(r.getAs[Double]("pacf5_r6") == q4(p55), s"$t pacf5")
    }
  }

  test("pacf: constant series (undefined ACF) yields null PACFs") {
    val d0 = java.sql.Date.valueOf("2024-01-01")
    def day(i: Int) = new java.sql.Date(d0.getTime + i * 86400000L)
    val rets = (0 until 10).map(i => ("a", day(i), 7L))
      .toDF("event_type", "day", "r_fp")
    val r = MarketQueries.pacf(rets).collect().head
    (1 to 5).foreach(k => assert(r.isNullAt(r.fieldIndex(s"pacf${k}_r6"))))
  }

  test("acfLjungBox: constant series has zero variance and null ACFs") {
    val d0 = java.sql.Date.valueOf("2024-01-01")
    def day(i: Int) = new java.sql.Date(d0.getTime + i * 86400000L)
    val rets = (0 until 10).map(i => ("a", day(i), 7L))
      .toDF("event_type", "day", "r_fp")
    val r = MarketQueries.acfLjungBox(rets).collect().head
    assert(r.isNullAt(r.fieldIndex("acf1_r6")))
    assert(r.isNullAt(r.fieldIndex("lb_q_r4")))
  }

  test("acfLjungBox replays the textbook formula on a hand-fed series") {
    val d0 = java.sql.Date.valueOf("2024-01-01")
    def day(i: Int) = new java.sql.Date(d0.getTime + i * 86400000L)
    val xs = Seq(3L, 1L, 4L, 1L, 5L, 9L, 2L, 6L)
    val rets = xs.zipWithIndex.map { case (x, i) => ("a", day(i), x) }
      .toDF("event_type", "day", "r_fp")
    val r = MarketQueries.acfLjungBox(rets).collect().head
    val n = xs.length
    val mean = xs.sum.toDouble / n
    def acf(k: Int): Double = {
      val num = (k until n).map(t => (xs(t) - mean) * (xs(t - k) - mean)).sum
      val den = xs.map(x => (x - mean) * (x - mean)).sum
      num / den
    }
    for (k <- 1 to 5)
      assert(math.abs(r.getAs[Double](s"acf${k}_r6") - acf(k)) < 2e-6,
        s"lag $k: got ${r.getAs[Double](s"acf${k}_r6")} want ${acf(k)}")
  }
}
