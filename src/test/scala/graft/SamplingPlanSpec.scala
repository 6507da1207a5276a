package graft

import org.apache.spark.sql.functions._

import graft.functions.Sampling

/** quotaPerGroup must keep Catalyst's InferWindowGroupLimit rule
  * eligible: with a low-cardinality group column the difference is a
  * map-side <=quota rows/group pre-reduce vs the whole table sorting
  * through a handful of reducers. */
class SamplingPlanSpec extends SparkSpec {
  import spark.implicits._

  test("quotaPerGroup plan carries a Partial WindowGroupLimit before the exchange") {
    val df = spark.range(10000).select(
      (col("id") % 3).cast("string").as("grp"), col("id").as("v"))
    val plan = Sampling.quotaPerGroup(df, col("grp"), Seq(col("v").desc), 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"rule did not fire:\n$plan")
    assert(plan.contains("Partial"), s"no partial (map-side) group limit:\n$plan")
  }

  test("quotaPerGroup keeps exactly quota best rows per group") {
    val df = spark.range(1000).select((col("id") % 4).as("grp"), col("id").as("v"))
    val got = Sampling.quotaPerGroup(df, col("grp"), Seq(col("v").desc), 3)
      .select("grp", "v").as[(Long, Long)].collect().toSet
    val want = (0L until 4L).flatMap(g => (0L until 1000L).filter(_ % 4 == g).sorted.reverse.take(3).map(g -> _)).toSet
    assert(got == want)
  }

  test("weightedSample: rate-accurate, partition-invariant, shuffle-free") {
    val df = spark.range(20000).select(col("id"), ((col("id") % 10) / 10.0).as("w"))
    val kept = Sampling.weightedSample(df, col("id"), col("w"))
    val n = kept.count().toDouble
    val expected = (0 until 10).map(_ / 10.0).sum / 10.0 * 20000 // E = 9000
    assert(math.abs(n - expected) < 0.05 * 20000, s"kept $n vs expected $expected")
    // same decision set on any layout
    val ids = kept.select("id").as[Long].collect().sorted.toSeq
    val ids2 = Sampling.weightedSample(df.repartition(17), col("id"), col("w"))
      .select("id").as[Long].collect().sorted.toSeq
    assert(ids == ids2)
    // zero weight drops everything, full weight keeps everything
    assert(Sampling.weightedSample(df, col("id"), lit(0.0)).count() == 0)
    assert(Sampling.weightedSample(df, col("id"), lit(1.0)).count() == 20000)
    // pure filter: no exchange in the plan
    val plan = kept.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"weighted sample should not shuffle:\n$plan")
  }
}
