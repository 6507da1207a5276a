package graft

import graft.queries.BehaviorQueries

/** q196 Markov removal-effect attribution: a designed 3-journey feed
  * with hand-computable absorption probabilities pins the model
  * exactly; the real feed pins the invariants (shares sum to 1,
  * effects non-negative, conversion rate in (0,1)). */
class AttributionSpec extends SparkSpec {
  import spark.implicits._

  test("designed feed: removal effects and shares match the hand-solved chain") {
    val t0 = java.sql.Timestamp.valueOf("2024-05-01 09:00:00")
    def ts(min: Int) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    // A: view->click->purchase (converts); B: view->error (no);
    // C: view->click (no). Chain: p(click)=1/2, p(view)=1/3,
    // p(START)=1/3. Removing click or view kills all conversion
    // (re=1); error/signup carry nothing (re=0) -> shares 1/2, 1/2.
    val ev = Seq(
      (1L, ts(0), 1L, "view"), (1L, ts(1), 2L, "click"), (1L, ts(2), 3L, "purchase"),
      (2L, ts(0), 4L, "view"), (2L, ts(1), 5L, "error"),
      (3L, ts(0), 6L, "view"), (3L, ts(1), 7L, "click"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = BehaviorQueries.markovAttribution(spark, ev).collect()
      .map(r => r.getAs[String]("state") ->
        (r.getAs[Double]("p_conv"), r.getAs[Double]("removal_effect"),
          r.getAs[Double]("attribution"))).toMap
    assert(got("click") == ((0.3333, 1.0, 0.5)), s"click: ${got("click")}")
    assert(got("view") == ((0.3333, 1.0, 0.5)), s"view: ${got("view")}")
    assert(got("error") == ((0.3333, 0.0, 0.0)))
    assert(got("signup") == ((0.3333, 0.0, 0.0)))
  }

  test("post-purchase events are truncated out of the journey") {
    val t0 = java.sql.Timestamp.valueOf("2024-05-01 09:00:00")
    def ts(min: Int) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    // the error AFTER the purchase must not enter the chain: with
    // truncation the error state is untouched (re=0); without it the
    // purchase->error edge would change the matrix.
    val ev = Seq(
      (1L, ts(0), 1L, "view"), (1L, ts(1), 2L, "purchase"), (1L, ts(2), 3L, "error"),
      (2L, ts(0), 4L, "view"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = BehaviorQueries.markovAttribution(spark, ev).collect()
      .map(r => r.getAs[String]("state") -> r.getAs[Double]("removal_effect")).toMap
    assert(got("error") == 0.0, "post-purchase error must carry no attribution")
    assert(got("view") == 1.0, "all conversion flows through view")
  }

  test("q197 designed feed: exact hand-computed Shapley values") {
    val t0 = java.sql.Timestamp.valueOf("2024-05-02 09:00:00")
    def ts(min: Int) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    // converted journeys: {view} ×2 and {view, click} ×1 (plus one
    // non-converting {error} journey that contributes nothing).
    // v(S) = 2·[view ∈ S] + 1·[view, click ⊆ S].
    // φ(view) = 2 + 1/2 = 2.5, φ(click) = 1/2, φ(error) = φ(signup) = 0
    // (click's marginal is 1 only when view already present: 4 of 8
    // orderings → within the subset formula, (2+6)·1/24? — direct:
    // num(click) = Σ w|S| (v(S+c)−v(S)) over S ⊆ {e,s,v}: only S
    // containing view contribute 1: S={v}: w1=2; {v,e},{v,s}: w2=2
    // each; {v,e,s}: w3=6 ⇒ num = 2+2+2+6 = 12 ⇒ φ = 0.5.
    val ev = Seq(
      (1L, ts(0), 1L, "view"), (1L, ts(1), 2L, "purchase"),
      (2L, ts(0), 3L, "view"), (2L, ts(1), 4L, "purchase"),
      (3L, ts(0), 5L, "view"), (3L, ts(1), 6L, "click"), (3L, ts(2), 7L, "purchase"),
      (4L, ts(0), 8L, "error"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = BehaviorQueries.shapleyAttribution(spark, ev).collect()
      .map(r => r.getAs[String]("state") ->
        (r.getAs[Double]("shapley"), r.getAs[Double]("share"))).toMap
    assert(got("view") == ((2.5, 0.8333)), s"view: ${got("view")}")
    assert(got("click") == ((0.5, 0.1667)), s"click: ${got("click")}")
    assert(got("error") == ((0.0, 0.0)))
    assert(got("signup") == ((0.0, 0.0)))
  }

  test("q197 efficiency identity on the real feed: Σφ = v(N) − v(∅), shares sum to 1") {
    val rows = SparkEntry.queries("q197_shapley_attribution")(spark, "/root/testdata/sf0.01")
      .collect()
    assert(rows.length == 4)
    val shares = rows.map(_.getAs[Double]("share"))
    assert(math.abs(shares.sum - 1.0) < 0.001, s"shares ${shares.toSeq}")
    rows.foreach(r => assert(r.getAs[Double]("shapley") >= 0.0))
  }

  test("q200 Eulerian-circuit designed feed: perfect symmetry forces uniform PageRank") {
    val t0 = java.sql.Timestamp.valueOf("2024-05-03 09:00:00")
    def ts(min: Int) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    // an Eulerian circuit of the complete 5-state digraph: every
    // ordered pair appears as a transition EXACTLY once, so every
    // row of the normalized matrix is 1/4 off-diagonal — the graph
    // is vertex-transitive and the stationary vector must be exactly
    // uniform (0.2 each, surviving the 1e-9 snap and the final r4).
    val walk = Seq("a", "b", "a", "c", "a", "d", "a", "e", "b", "c", "b",
      "d", "b", "e", "c", "d", "c", "e", "d", "e", "a")
    val names = Map("a" -> "click", "b" -> "error", "c" -> "purchase",
      "d" -> "signup", "e" -> "view")
    val ev = walk.zipWithIndex.map { case (s0, i) => (1L, ts(i), (i + 1).toLong, names(s0)) }
      .toDF("user_id", "ts", "event_id", "event_type")
    val cnts = graft.operators.Transitions.counts(ev).collect()
    assert(cnts.length == 20 && cnts.forall(_.getAs[Long]("n_trans") == 1L),
      "walk must cover every ordered pair exactly once")
    val out = BehaviorQueries.pagerankNav(spark, ev).collect()
    assert(out.length == 5)
    out.foreach { r =>
      assert(r.getAs[Long]("out_trans") == 4L)
      assert(r.getAs[Double]("pagerank") == 0.2, s"symmetry broken: $r")
    }
  }

  test("q200 dangling states take the uniform patch; teleport mass conserves") {
    val t0 = java.sql.Timestamp.valueOf("2024-05-03 09:00:00")
    def ts(min: Int) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    // only click <-> view transitions exist; purchase/error/signup are
    // dangling (out_trans 0) and must still receive teleport mass,
    // while the connected pair strictly out-ranks them.
    val ev = Seq((1L, ts(0), 1L, "click"), (1L, ts(1), 2L, "view"),
      (1L, ts(2), 3L, "click"), (1L, ts(3), 4L, "view"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = BehaviorQueries.pagerankNav(spark, ev).collect()
      .map(r => r.getAs[String]("state") -> r).toMap
    assert(out("purchase").getAs[Long]("out_trans") == 0L)
    assert(out("click").getAs[Long]("out_trans") == 2L)
    val pr = out.map { case (k, r) => k -> r.getAs[Double]("pagerank") }
    assert(math.abs(pr.values.sum - 1.0) < 5e-4, s"mass: $pr")
    assert(pr.values.forall(_ > 0), "every state keeps teleport mass")
    assert(pr("click") > pr("purchase") && pr("view") > pr("signup"),
      s"connected pair must out-rank dangling states: $pr")
  }

  test("q200 real feed: 5 states, positive ranks, mass conserves") {
    val rows = SparkEntry.queries("q200_pagerank_nav")(spark, "/root/testdata/sf0.01")
      .collect()
    assert(rows.length == 5)
    assert(math.abs(rows.map(_.getAs[Double]("pagerank")).sum - 1.0) < 5e-4)
    rows.foreach { r =>
      assert(r.getAs[Double]("pagerank") > 0)
      assert(r.getAs[Long]("out_trans") > 0)
    }
  }

  test("real feed invariants: shares sum to 1, effects in [0,1], p_conv in (0,1)") {
    val rows = SparkEntry.queries("q196_markov_attribution")(spark, "/root/testdata/sf0.01")
      .collect()
    assert(rows.length == 4)
    val shares = rows.map(_.getAs[Double]("attribution"))
    assert(math.abs(shares.sum - 1.0) < 0.001, s"shares ${shares.toSeq}")
    rows.foreach { r =>
      val re = r.getAs[Double]("removal_effect")
      assert(re >= 0.0 && re <= 1.0, s"re $re")
      val p = r.getAs[Double]("p_conv")
      assert(p > 0.0 && p < 1.0, s"p_conv $p")
    }
  }
}
