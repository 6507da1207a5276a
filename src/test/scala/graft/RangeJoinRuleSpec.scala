package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The binned range-join optimizer rule: same rows as the nested-loop
  * plan, but the physical join becomes an EQUI join on the bin key —
  * the difference between O(|fact|*|dim|) comparisons and a hash
  * lookup per row at 100 TB. */
class RangeJoinRuleSpec extends SparkSpec {
  import spark.implicits._

  private def points: DataFrame =
    spark.range(0, 2000).select(($"id" % 500 * 0.1 + 0.05).as("v"), $"id")

  private def intervals: DataFrame =
    spark.range(0, 100).select(
      ($"id" * 0.5).as("lo"), (($"id" + 1) * 0.5).as("hi"), $"id".as("band"))

  private def joined: DataFrame =
    points.join(intervals, $"v" >= $"lo" && $"v" < $"hi")
      .groupBy($"band").agg(count(lit(1)).as("n"))

  private def withRule[A](binSize: Double)(f: => A): A = {
    Graft.enableRangeJoinRewrite(spark, binSize)
    try f finally spark.conf.set(graft.plans.BinnedRangeJoin.BinSizeKey, "0")
  }

  test("rewritten range join returns exactly the nested-loop rows") {
    val expected = joined.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val got = withRule(0.5) {
      joined.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    }
    assert(got == expected)
    assert(expected.values.sum == 2000L, "every point falls in exactly one band")
  }

  test("rule turns the nested-loop into an equi join on the bin key") {
    def plan(df: DataFrame) = df.queryExecution.executedPlan.toString
    // q90 (QueriesSmokeSpec) leaves the rule enabled on the shared
    // session — pin the baseline's conf explicitly
    spark.conf.set(graft.plans.BinnedRangeJoin.BinSizeKey, "0")
    val naive = plan(joined)
    assert(naive.contains("BroadcastNestedLoopJoin") || naive.contains("CartesianProduct"),
      s"baseline should be a nested-loop/cartesian plan:\n$naive")
    // cap disabled -> single-branch rewrite, the pure equi-join plan
    spark.conf.set(graft.plans.BinnedRangeJoin.MaxBinsKey, "0")
    try withRule(0.5) {
      val p = plan(joined)
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"rewrite left a nested-loop join in the plan:\n$p")
      assert(p.contains("__graft_bin"), s"bin key missing from plan:\n$p")
    } finally spark.conf.unset(graft.plans.BinnedRangeJoin.MaxBinsKey)
  }

  test("catch-all bands beyond maxBins fail soft to the nested loop, exactly") {
    // one 1e9-wide band (q19's catch-all shape) + the normal grid: the
    // wide row would explode 2e9 bins without the cap — with it, the
    // wide row rides a filtered nested-loop branch and results stay
    // identical to the naive plan
    val wide = intervals.union(Seq((0.0, 1e9, 9999L)).toDF("lo", "hi", "band"))
    def q = points.join(wide, $"v" >= $"lo" && $"v" < $"hi")
      .groupBy($"band").agg(count(lit(1)).as("n"))
    val expected = q.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    withRule(0.5) {
      val p = q.queryExecution.executedPlan.toString
      assert(p.contains("__graft_bin"), s"binned branch missing:\n$p")
      assert(p.contains("Union"), s"wide-fallback union missing:\n$p")
      val got = q.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got == expected, "split plan changed results")
      assert(got(9999L) == 2000L, "catch-all band must cover every point")
    }
  }

  test("rule leaves equi joins and outer range joins alone") {
    withRule(0.5) {
      // equi conjunct present -> untouched (and no double-rewrite loops)
      val equi = points.join(intervals, $"v" === $"lo" && $"id" >= $"band")
      assert(!equi.queryExecution.executedPlan.toString.contains("__graft_bin"))
      // outer join -> untouched (rewrite is inner-only)
      val outer = points.join(intervals, $"v" >= $"lo" && $"v" < $"hi", "left")
      assert(!outer.queryExecution.executedPlan.toString.contains("__graft_bin"))
    }
  }

  test("unaligned bins and point-on-right orientation still match exactly") {
    // binSize deliberately NOT a divisor of the interval width, and the
    // interval side given first (point expression on the join's right)
    val expected = intervals.join(points, $"v" >= $"lo" && $"v" < $"hi").count()
    withRule(0.37) {
      assert(intervals.join(points, $"v" >= $"lo" && $"v" < $"hi").count() == expected)
    }
  }
}
