package graft

import org.apache.spark.sql.functions._

/** Sketch aggregates — the 100 TB path for distinct counts and
  * quantiles (single-pass, bounded memory, mergeable partials) —
  * pinned against exact computation at test scale. Both are
  * deterministic (hash-based, no RNG), so the bounds are stable. */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct within rsd bound of exact, partition-invariant") {
    val li = graft.core.Tables.lineitem(spark, sf("sf0.01"))
    val exact = li.select(countDistinct($"l_orderkey")).as[Long].head()
    val approx = li.select(approx_count_distinct($"l_orderkey", 0.02)).as[Long].head()
    assert(math.abs(approx - exact).toDouble / exact < 0.06, s"approx $approx vs exact $exact")
    // sketch merges are order-independent: same estimate on any layout
    val approx2 = li.repartition(17).select(approx_count_distinct($"l_orderkey", 0.02)).as[Long].head()
    assert(approx == approx2, "HLL estimate must be partition-invariant")
  }

  test("approx_percentile brackets the exact percentile") {
    val li = graft.core.Tables.lineitem(spark, sf("sf0.01"))
    val exact = li.select(expr("percentile(l_quantity, 0.5)")).as[Double].head()
    val approx = li.select(expr("approx_percentile(l_quantity, 0.5, 1000)")).as[Double].head()
    // l_quantity is small-integer-valued; with accuracy 1000 the
    // approximate median lands within one unit of the exact one
    assert(math.abs(approx - exact) <= 1.0, s"approx $approx vs exact $exact")
  }

  test("q79 count-min: estimates dominate truth and top keys survive") {
    val out = SparkEntry.queries("q79_countmin_hh")(spark, sf("sf0.01")).collect()
    assert(out.length == 10)
    out.foreach { r =>
      assert(r.getAs[Long]("est_n") >= r.getAs[Long]("true_n"),
        s"CMS estimate below truth for key ${r.getAs[Long]("l_partkey")}")
    }
  }

  test("q80 bloom: zero false negatives; false positives are the collision tail") {
    val out = SparkEntry.queries("q80_bloom_member")(spark, sf("sf0.01"))
    assert(out.filter(col("actual") && !col("bloom_hit")).count() == 0,
      "bloom filter produced a false negative")
    // the filter must actually discriminate: misses exist
    assert(out.filter(!col("bloom_hit")).count() > 0)
  }

  test("q81 lm scoring: every multi-token doc scored, bits positive") {
    val out = SparkEntry.queries("q81_lm_score")(spark, sf("sf0.01"))
    assert(out.count() > 0)
    assert(out.filter(col("bits_per_bigram") <= 0).count() == 0,
      "log2 probabilities must be negative => bits positive")
  }

  test("direct CMS build (no per-key pre-agg) produces identical cells") {
    val li = graft.core.Tables.lineitem(spark, sf("sf0.01"))
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Number](0).longValue(), r.getAs[Number](1).longValue())
        -> r.getAs[Number](2).longValue()).toMap
    assert(m(graft.functions.Sketches.countMinCellsDirect(li, $"l_partkey"))
      == m(graft.functions.Sketches.countMinCells(li, $"l_partkey")))
  }

  test("sig-digit quantile sketch: merge-invariant, within 1% below exact") {
    val s = graft.functions.Sketches
    val li = graft.core.Tables.lineitem(spark, sf("sf0.01"))
    val cents = floor($"l_extendedprice" * 100 + 0.5).cast("long")
    val whole = s.sigBuckets(li, cents)
    // partial builds over arbitrary slices merge to the whole-input sketch
    val slices = Seq($"l_orderkey" % 3 === 0, $"l_orderkey" % 3 === 1, $"l_orderkey" % 3 === 2)
      .map(p => s.sigBuckets(li.filter(p), cents))
    val merged = s.mergeSigBuckets(slices: _*)
    def bm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bm(merged) == bm(whole), "bucket-wise sum of partials must equal the whole sketch")
    // sketch quantile is the exact quantile rounded DOWN to 3
    // significant digits: q_lo <= true < q_lo * 1.01
    val qs = Seq(0.1, 0.5, 0.9, 0.99)
    val sk = s.sigQuantiles(whole, qs).collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    val ex = s.sigQuantiles(s.sigBuckets(li, cents, sig = 15), qs)
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    qs.foreach { q =>
      assert(sk(q) <= ex(q) && ex(q) < sk(q) * 1.01 + 1,
        s"q=$q sketch ${sk(q)} vs exact ${ex(q)} outside the 1% bound")
    }
  }

  test("heavy hitters behind the CMS gate equal the plain GROUP BY/HAVING") {
    val li = graft.core.Tables.lineitem(spark, sf("sf0.01"))
    val gated = graft.functions.Sketches.heavyHitters(li, $"l_partkey", minCount = 40L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = li.groupBy($"l_partkey").agg(count(lit(1)).as("n"))
      .filter($"n" >= 40).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gated == exact)
    assert(exact.nonEmpty, "threshold too high — test would be vacuous")
  }

  test("KMV distinct sketch: within order-statistic error; slice merges equal the whole") {
    val s = graft.functions.Sketches
    val li = graft.core.Tables.lineitem(spark, sf("sf0.01"))
    val whole = s.kmvSketch(li, $"l_orderkey")
    val est = s.kmvEstimate(whole).as[Double].head()
    val truth = li.select(countDistinct($"l_orderkey")).as[Long].head().toDouble
    // 3 standard errors at k=64 (stderr ~ truth/sqrt(k-2))
    assert(math.abs(est - truth) < 3 * truth / math.sqrt(62.0), s"est $est vs true $truth")
    // k-min of sliced partial sketches == k-min of the whole input
    val slices = Seq($"l_orderkey" % 3 === 0, $"l_orderkey" % 3 === 1, $"l_orderkey" % 3 === 2)
      .map(p => s.kmvSketch(li.filter(p), $"l_orderkey"))
    val merged = s.mergeKmv(64, slices: _*)
    assert(merged.as[Long].collect().sorted.toSeq == whole.as[Long].collect().sorted.toSeq)
    // exact-below-k regime: tiny input reports its true distinct count
    val tiny = s.kmvEstimate(s.kmvSketch(li.filter($"l_orderkey" < 50), $"l_orderkey")).as[Double].head()
    val tinyTruth = li.filter($"l_orderkey" < 50).select(countDistinct($"l_orderkey")).as[Long].head()
    assert(tinyTruth < 64, "test needs the below-k regime")
    assert(tiny == tinyTruth.toDouble)
    // the nonlinear-hash regression case: a small SEQUENTIAL key range
    // past k (the affine family preserved order here and estimated 20x)
    val seqEst = s.kmvEstimate(s.kmvSketch(li.filter($"l_orderkey" < 400), $"l_orderkey")).as[Double].head()
    val seqTruth = li.filter($"l_orderkey" < 400).select(countDistinct($"l_orderkey")).as[Long].head().toDouble
    assert(seqTruth > 64 && math.abs(seqEst - seqTruth) < seqTruth, s"seq est $seqEst vs $seqTruth")
  }

  test("grouped KMV: per-group sketch equals the single-group build; map-side group limit") {
    val s = graft.functions.Sketches
    val ev = graft.core.Tables.events(spark, sf("sf0.01"))
    val by = s.kmvSketchBy(ev, col("event_type"), col("user_id"))
    val one = s.kmvSketch(ev.filter($"event_type" === "click"), $"user_id")
    assert(by.filter($"grp" === "click").select("h").as[Long].collect().sorted.toSeq
      == one.as[Long].collect().sorted.toSeq)
    // the per-group k-min must pre-reduce map-side (<=k rows/group/task)
    val p = by.queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit") && p.contains("Partial"),
      s"no partial group limit in grouped KMV plan:\n$p")
  }

  test("kmvMinsSketchBy ≡ kmvSketchBy bit for bit; plan is one ObjectHashAggregate") {
    val s = graft.functions.Sketches
    val ev = graft.core.Tables.events(spark, sf("sf0.01"))
    val a = s.kmvSketchBy(ev, col("event_type"), col("user_id"))
      .as[(String, Long)].collect().sorted.toSeq
    val mins = s.kmvMinsSketchBy(ev, col("event_type"), col("user_id"))
    val b = mins.as[(String, Long)].collect().sorted.toSeq
    assert(a == b, "the dedup-ing bounded-heap build must produce the identical k-min set")
    // duplicates inside a full heap must not evict (the dedupe guard):
    // a constant column has ONE distinct hash however many rows arrive
    val const = s.kmvMinsSketchBy(ev, col("event_type"), lit(7L))
    assert(const.groupBy($"grp").count().select(max($"count")).as[Long].head() == 1L)
    // no distinct exchange, no window: one hash-aggregate pair
    val p = mins.queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate") && !p.contains("Window"),
      s"kmv_mins must plan as a partial-agg, not distinct+window:\n$p")
  }

  test("KMV set operations: planted overlap estimated within order-statistic error") {
    import graft.functions.Sketches
    // A = [0, 10000), B = [5000, 15000): union 15000, overlap 5000,
    // jaccard 1/3 — planted so every estimator has a known target
    val rows = spark.range(0, 10000).select(lit("a").as("g"), $"id".as("k"))
      .union(spark.range(5000, 15000).select(lit("b").as("g"), $"id".as("k")))
    val ops = Sketches.kmvSetOps(Sketches.kmvSketchBy(rows, col("g"), col("k"), 64), 64)
      .collect().head
    def rel(est: Double, truth: Double) = math.abs(est - truth) / truth
    // k=64 order-statistic SE is ~1/sqrt(k-2) = 12.7%; 3-sigma bounds
    assert(rel(ops.getAs[Double]("est_union"), 15000) < 0.38,
      s"union estimate off: ${ops.getAs[Double]("est_union")}")
    assert(rel(ops.getAs[Double]("est_common_theta"), 5000) < 0.6,
      s"theta intersection off: ${ops.getAs[Double]("est_common_theta")}")
    val j = ops.getAs[Double]("est_jaccard")
    assert(j > 0.15 && j < 0.55, s"jaccard estimate off: $j")
  }

  test("KMV set operations degenerate to EXACT counts below k distinct") {
    import graft.functions.Sketches
    // 30 + 30 elements, overlap 10 — both sketches ARE the full hash
    // sets, so every estimate must equal the truth exactly
    val rows = spark.range(0, 30).select(lit("a").as("g"), $"id".as("k"))
      .union(spark.range(20, 50).select(lit("b").as("g"), $"id".as("k")))
    val ops = Sketches.kmvSetOps(Sketches.kmvSketchBy(rows, col("g"), col("k"), 64), 64)
      .collect().head
    assert(ops.getAs[Double]("est_union") == 50d)
    assert(ops.getAs[Double]("est_common_theta") == 10d)
    assert(ops.getAs[Double]("est_common_ie") == 10d)
    assert(ops.getAs[Double]("est_jaccard") == 0.2d)
  }

  test("q84 join-cardinality estimate dominates the true join size") {
    val r = SparkEntry.queries("q84_join_card")(spark, sf("sf0.01")).head()
    val (truth, est) = (r.getAs[Long]("true_pairs"), r.getAs[Long]("est_pairs"))
    assert(truth > 0)
    assert(est >= truth, s"CMS inner product $est below true join size $truth")
    // sanity: with 1024-wide rows the collision mass should not blow
    // the estimate out by orders of magnitude
    assert(est < truth * 2, s"estimate uselessly loose: $est vs $truth")
  }
}
