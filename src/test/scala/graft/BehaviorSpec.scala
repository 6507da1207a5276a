package graft

import org.apache.spark.sql.functions._

/** Invariants and designed-feed pins for the events-analytics family
  * (q181 profile, q182 sessions, q183 funnel, q184 retention) beyond
  * the DuckDB hash oracle — closed-form session boundaries, strict
  * funnel ordering, and accounting identities the oracle replay
  * cannot distinguish from a consistently-wrong construction.
  */
class BehaviorSpec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sf())

  private def writeEvents(rows: Seq[(Long, java.sql.Timestamp, Long, String, Double, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_behavior").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    dir
  }
  private val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
  private def ts(min: Int) = new java.sql.Timestamp(t0.getTime + min * 60000L)

  test("q212: single-digit corpus pins the degenerate distribution; all 9 digits always present; real-feed identities") {
    // every amount starts with digit 7 -> share(7) = 1.0, every other
    // digit 0 with its expected-count chi-square part intact; the
    // statistic must scream (chi2 >> the 15.5 alpha=0.05 critical
    // value for 8 df).
    val dir = java.nio.file.Files.createTempDirectory("graft_q212").toString
    (0 until 200).map(i => 700.00 + i / 100.0).toDF("l_extendedprice")
      .write.parquet(s"$dir/lineitem.parquet")
    val out = SparkEntry.queries("q212_benford_audit")(spark, dir).collect()
      .map(r => r.getAs[Int]("digit") -> r).toMap
    assert(out.keySet == (1 to 9).toSet, "all 9 digit rows, observed or not")
    assert(out(7).getAs[Long]("n_obs") == 200L && out(7).getAs[Double]("share_r") == 1.0)
    assert((1 to 9).filter(_ != 7).forall(d => out(d).getAs[Long]("n_obs") == 0L))
    assert(out(1).getAs[Double]("chi2_r") > 15.5, s"degenerate corpus must fail the test: ${out(1)}")
    // real feed: shares sum to 1 (up to 9 r4 roundings), chi2 constant
    // across rows and non-negative, Benford curve monotone decreasing
    val real = q("q212_benford_audit").collect()
    assert(real.length == 9)
    assert(math.abs(real.map(_.getAs[Double]("share_r")).sum - 1.0) < 1e-3)
    assert(real.map(_.getAs[Double]("chi2_r")).distinct.length == 1)
    assert(real.forall(_.getAs[Double]("chi2_r") >= 0))
    val curve = real.sortBy(_.getAs[Int]("digit")).map(_.getAs[Double]("benford_r"))
    assert(curve.zip(curve.tail).forall { case (a, b) => a > b }, "Benford curve decreasing")
  }

  test("q181: one row per lineitem column; counts agree with direct aggregates") {
    val out = q("q181_table_profile").collect().map(r =>
      r.getAs[String]("col_name") -> r).toMap
    val li = graft.core.Tables.lineitem(spark, sf())
    assert(out.keySet == li.schema.fieldNames.toSet, "one row per column")
    val n = li.count()
    out.values.foreach { r =>
      assert(r.getAs[Long]("n_rows") == n)
      assert(r.getAs[Long]("n_distinct") + r.getAs[Long]("n_null") <= n)
    }
    // spot-check one low-cardinality and one high-cardinality column
    // against direct countDistinct on the TYPED values
    assert(out("l_returnflag").getAs[Long]("n_distinct") ==
      li.select(countDistinct($"l_returnflag")).as[Long].head)
    assert(out("l_extendedprice").getAs[Long]("n_distinct") ==
      li.select(countDistinct($"l_extendedprice")).as[Long].head)
  }

  test("q182: designed gaps pin session boundaries; event accounting identity on the real feed") {
    // one user, events at +0, +10, +50, +55 min: the 40-min gap
    // splits exactly two sessions (10 min and 5 min long)
    val dir = writeEvents(Seq(
      (1L, ts(0), 7L, "view", 1.0, "{}"),
      (2L, ts(10), 7L, "view", 1.0, "{}"),
      (3L, ts(50), 7L, "view", 1.0, "{}"),
      (4L, ts(55), 7L, "view", 1.0, "{}")))
    val r = SparkEntry.queries("q182_sessions")(spark, dir).collect().head
    assert(r.getAs[Long]("n_sessions") == 2L, s"sessions: $r")
    assert(r.getAs[Long]("total_events") == 4L)
    assert(r.getAs[Long]("max_session_events") == 2L)
    assert(r.getAs[Double]("avg_session_secs") == 450.0, s"durations: $r")
    // exactly-30-min gap does NOT split (strictly-greater semantics)
    val dir2 = writeEvents(Seq(
      (1L, ts(0), 7L, "view", 1.0, "{}"),
      (2L, ts(30), 7L, "view", 1.0, "{}")))
    assert(SparkEntry.queries("q182_sessions")(spark, dir2)
      .collect().head.getAs[Long]("n_sessions") == 1L)
    // real feed: sessionized events account for every event
    val out = q("q182_sessions")
    val total = out.agg(sum($"total_events")).as[Long].head
    assert(total == graft.core.Tables.events(spark, sf()).count())
  }

  test("q204: designed journeys pin the trigrams; session cuts break paths; supports sum to 1") {
    // user 7, one session: view->click->purchase->view yields exactly
    // the two overlapping trigrams, once each. user 8's 40-min gap
    // before purchase cuts the session, so NO trigram may span it.
    val dir = writeEvents(Seq(
      (1L, ts(0), 7L, "view", 1.0, "{}"),
      (2L, ts(1), 7L, "click", 1.0, "{}"),
      (3L, ts(2), 7L, "purchase", 1.0, "{}"),
      (4L, ts(3), 7L, "view", 1.0, "{}"),
      (5L, ts(0), 8L, "view", 1.0, "{}"),
      (6L, ts(1), 8L, "click", 1.0, "{}"),
      (7L, ts(45), 8L, "purchase", 1.0, "{}")))
    val got = SparkEntry.queries("q204_session_paths")(spark, dir).collect()
      .map(r => (r.getAs[String]("step1"), r.getAs[String]("step2"),
        r.getAs[String]("step3")) -> r.getAs[Long]("n_paths")).toMap
    assert(got == Map(
      ("view", "click", "purchase") -> 1L,
      ("click", "purchase", "view") -> 1L), s"paths: $got")
    // real feed: supports sum to 1 and every path count is positive
    val real = q("q204_session_paths").collect()
    assert(real.nonEmpty && real.forall(_.getAs[Long]("n_paths") > 0))
    val supSum = real.map(_.getAs[Double]("support")).sum
    assert(math.abs(supSum - 1.0) < real.length * 1e-4 + 1e-6, s"support mass: $supSum")
  }

  test("q205: a designed metronome is flagged; varied cadence is not; peak rate pins") {
    def atSec(sec: Int) = new java.sql.Timestamp(
      java.sql.Timestamp.valueOf("2024-03-01 09:00:00").getTime + sec * 1000L)
    // user 7: 25 events exactly 5 s apart -> 24 zero-variance gaps,
    // metronomic. user 8: alternating 5 s / 65 s gaps -> mean 35 s,
    // sd 30 s, NOT metronomic. user 9: 10 events inside one minute ->
    // peak rate 10, but only 9 gaps (< 20) so never flagged.
    val rows =
      (0 until 25).map(i => ((100 + i).toLong, atSec(i * 5), 7L, "view", 1.0, "{}")) ++
      (0 until 25).map { i =>
        val sec = (i / 2) * 70 + (i % 2) * 5
        ((200 + i).toLong, atSec(sec), 8L, "view", 1.0, "{}")
      } ++
      (0 until 10).map(i => ((300 + i).toLong, atSec(i * 6), 9L, "view", 1.0, "{}"))
    val dir = writeEvents(rows)
    val got = SparkEntry.queries("q205_bot_profile")(spark, dir).collect()
      .map(r => r.getAs[Long]("user_id") -> r).toMap
    val u7 = got(7L)
    assert(u7.getAs[Long]("n_gaps") == 24L && u7.getAs[Boolean]("is_metronomic"),
      s"metronome missed: $u7")
    assert(u7.getAs[Double]("sd_gap_s") == 0.0 && u7.getAs[Double]("mean_gap_s") == 5.0)
    val u8 = got(8L)
    assert(!u8.getAs[Boolean]("is_metronomic"), s"varied cadence misflagged: $u8")
    assert(u8.getAs[Double]("mean_gap_s") == 35.0 && u8.getAs[Double]("sd_gap_s") == 30.0,
      s"gap stats: $u8")
    val u9 = got(9L)
    assert(u9.getAs[Long]("epm_max") == 10L, s"peak rate: $u9")
    assert(!u9.getAs[Boolean]("is_metronomic"), "n_gaps < 20 must never flag")
    // real feed: one row per user, flags never fire on < 20 gaps
    val real = q("q205_bot_profile").collect()
    assert(real.length == graft.core.Tables.events(spark, sf())
      .select($"user_id").distinct().count())
    assert(real.forall(r => !r.getAs[Boolean]("is_metronomic") || r.getAs[Long]("n_gaps") >= 20))
  }

  test("q183: strict ordering pinned on a designed feed; stage counts monotone on the real feed") {
    // u1 completes the funnel in order; u2's click PRECEDES its first
    // view (must not count as click_after_view); u3 views then
    // purchases WITHOUT a qualifying click (must not count at stage 4)
    val dir = writeEvents(Seq(
      (1L, ts(0), 1L, "view", 1.0, "{}"),
      (2L, ts(1), 1L, "click", 1.0, "{}"),
      (3L, ts(2), 1L, "purchase", 1.0, "{}"),
      (4L, ts(0), 2L, "click", 1.0, "{}"),
      (5L, ts(1), 2L, "view", 1.0, "{}"),
      (6L, ts(0), 3L, "view", 1.0, "{}"),
      (7L, ts(1), 3L, "purchase", 1.0, "{}")))
    val stages = SparkEntry.queries("q183_funnel")(spark, dir).collect()
      .map(r => r.getAs[Int]("stage_no") -> r.getAs[Long]("n_users")).toMap
    assert(stages(1) == 3L && stages(2) == 3L && stages(3) == 1L && stages(4) == 1L,
      s"funnel: $stages")
    val real = q("q183_funnel").orderBy($"stage_no").collect()
      .map(_.getAs[Long]("n_users"))
    assert(real.sliding(2).forall(p => p(1) <= p(0)), s"not monotone: ${real.mkString(",")}")
  }

  test("q185: session boundary cuts transitions on a designed feed; row-probabilities sum to 1") {
    // view -> click -> view inside one session; the 43-min gap opens
    // a new session, so purchase contributes NO transition
    val dir = writeEvents(Seq(
      (1L, ts(0), 7L, "view", 1.0, "{}"),
      (2L, ts(1), 7L, "click", 1.0, "{}"),
      (3L, ts(2), 7L, "view", 1.0, "{}"),
      (4L, ts(45), 7L, "purchase", 1.0, "{}")))
    val t = SparkEntry.queries("q185_transitions")(spark, dir).collect()
      .map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type")) ->
        r.getAs[Long]("n_trans")).toMap
    assert(t == Map(("view", "click") -> 1L, ("click", "view") -> 1L), s"transitions: $t")
    val out = q("q185_transitions").cache()
    val sums = out.groupBy($"from_type").agg(sum($"p_trans").as("p"))
      .filter(abs($"p" - 1d) > 25e-4) // 5 r4-rounded terms per row
    assert(sums.isEmpty, "each from-row must be a probability distribution")
    // transition volume identity: total transitions = events - sessions
    val nTrans = out.agg(sum($"n_trans")).as[Long].head
    val sess = q("q182_sessions").agg(sum($"n_sessions"), sum($"total_events"))
      .as[(Long, Long)].head
    assert(nTrans == sess._2 - sess._1, "transitions = events - session starts")
    out.unpersist()
  }

  test("q189: four designed users land one per quartile; scores bounded and balanced on the real feed") {
    // u1 most recent + most frequent + highest spend -> 444;
    // u4 oldest, least, lowest -> 111 (frequencies 4, 3, 2, 1 via
    // event counts; recency via day offsets; monetary via values)
    val rows = (1 to 4).flatMap { u =>
      (0 until (5 - u)).map { i =>
        (u * 10L + i, new java.sql.Timestamp(
          java.sql.Timestamp.valueOf("2024-01-10 10:00:00").getTime
            - (u - 1) * 86400000L + i * 60000L),
          u.toLong, "view", (5 - u) * 10.0, "{}")
      }
    }
    val dir = writeEvents(rows)
    val out = SparkEntry.queries("q189_rfm")(spark, dir).collect()
      .map(r => r.getAs[Long]("user_id") -> r).toMap
    assert(out(1L).getAs[Long]("segment") == 444L, s"u1: ${out(1L)}")
    assert(out(4L).getAs[Long]("segment") == 111L, s"u4: ${out(4L)}")
    assert(out(2L).getAs[Long]("r_score") == 3L && out(3L).getAs[Long]("r_score") == 2L)
    val real = q("q189_rfm").cache()
    assert(real.filter($"r_score" < 1 || $"r_score" > 4 ||
      $"f_score" < 1 || $"f_score" > 4 || $"m_score" < 1 || $"m_score" > 4).isEmpty)
    assert(real.filter($"segment" =!=
      $"r_score" * 100 + $"f_score" * 10 + $"m_score").isEmpty)
    // exact rank arithmetic balances quartiles to within one user
    val byQ = real.groupBy($"f_score").count().collect()
      .map(r => r.getAs[Long]("count"))
    assert(byQ.max - byQ.min <= 1, s"quartiles unbalanced: ${byQ.mkString(",")}")
    real.unpersist()
  }

  test("q190: designed sessions pin counts and lift; identities on the real feed") {
    // u1 session {view, click}; u2 session {view}; u3 session
    // {click}: n_sessions = 3, n_view = 2, n_click = 2, n_both = 1
    // -> support 1/3, lift 1*3/(2*2) = 0.75
    val dir = writeEvents(Seq(
      (1L, ts(0), 1L, "view", 1.0, "{}"),
      (2L, ts(1), 1L, "click", 1.0, "{}"),
      (3L, ts(0), 2L, "view", 1.0, "{}"),
      (4L, ts(0), 3L, "click", 1.0, "{}")))
    val r = SparkEntry.queries("q190_session_lift")(spark, dir).collect().head
    assert(r.getAs[String]("type_a") == "click" && r.getAs[String]("type_b") == "view")
    assert(r.getAs[Long]("n_both") == 1L && r.getAs[Long]("n_a") == 2L && r.getAs[Long]("n_b") == 2L)
    assert(r.getAs[Double]("support") == math.floor(1d / 3d * 10000 + 0.5) / 10000)
    assert(r.getAs[Double]("lift") == 0.75, s"lift: $r")
    // real feed: co-occurrence cannot exceed either single presence,
    // and support <= min-presence share
    val out = q("q190_session_lift").collect()
    out.foreach { row =>
      assert(row.getAs[Long]("n_both") <= math.min(row.getAs[Long]("n_a"), row.getAs[Long]("n_b")))
      assert(row.getAs[Double]("support") >= 0 && row.getAs[Double]("lift") >= 0)
    }
  }

  test("q191: designed converters pin count/median/p90; consistency with the funnel stage count") {
    // three converting users with view->purchase latencies 10, 20,
    // 40 min (plus a non-converter): n = 3, lower median = rank 2
    // (20 min = 1200 s), p90 rank = ceil(2.7) = 3 (40 min), mean
    // = 70/3 min
    val dir = writeEvents(Seq(
      (1L, ts(0), 1L, "view", 1.0, "{}"), (2L, ts(1), 1L, "click", 1.0, "{}"),
      (3L, ts(10), 1L, "purchase", 1.0, "{}"),
      (4L, ts(0), 2L, "view", 1.0, "{}"), (5L, ts(1), 2L, "click", 1.0, "{}"),
      (6L, ts(20), 2L, "purchase", 1.0, "{}"),
      (7L, ts(0), 3L, "view", 1.0, "{}"), (8L, ts(1), 3L, "click", 1.0, "{}"),
      (9L, ts(40), 3L, "purchase", 1.0, "{}"),
      (10L, ts(0), 4L, "view", 1.0, "{}")))
    val r = SparkEntry.queries("q191_time_to_convert")(spark, dir).collect().head
    assert(r.getAs[Long]("n_conv") == 3L)
    assert(r.getAs[Double]("median_secs") == 1200.0, s"median: $r")
    assert(r.getAs[Double]("p90_secs") == 2400.0, s"p90: $r")
    assert(r.getAs[Double]("mean_secs") == math.floor(70d / 3d * 60 * 10000 + 0.5) / 10000)
    // real feed: converter count equals the declared funnel stage 4
    val rr = q("q191_time_to_convert").collect().head
    val stage4 = q("q183_funnel").filter($"stage_no" === 4).collect().head.getAs[Long]("n_users")
    assert(rr.getAs[Long]("n_conv") == stage4, "q191 must count exactly q183's converters")
    assert(rr.getAs[Double]("median_secs") <= rr.getAs[Double]("p90_secs"))
  }

  test("q184: offset-0 retention is 1.0 per cohort; cohort sizes partition the user base") {
    val out = q("q184_retention").cache()
    assert(out.filter($"offset_d" === 0 && $"retention" =!= 1.0).isEmpty,
      "every cohort member is active on its first day")
    assert(out.filter($"offset_d" === 0 && $"n_active" =!= $"cohort_users").isEmpty)
    assert(out.filter($"n_active" > $"cohort_users" || $"offset_d" < 0).isEmpty)
    val users = out.filter($"offset_d" === 0).agg(sum($"cohort_users")).as[Long].head
    val want = graft.core.Tables.events(spark, sf())
      .select(countDistinct($"user_id")).as[Long].head
    assert(users == want, "cohorts must partition the distinct-user base")
    out.unpersist()
  }
}
