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

  test("hashBucket/unitHash: overflow-proof beyond the 64-bit wrap point, no-op reduction below 2^31") {
    // ids straddling the old hazard: a raw id*2654435761 wraps Long
    // for ids > ~3.47e9 (and DuckDB ERRORS on the same BIGINT
    // overflow). The reduced form must equal exact BigInt arithmetic
    // — what an engine with unbounded integers computes — everywhere.
    val ids = Seq(0L, 1L, 12345L, 2147483647L, 2147483648L, 3470000000L,
      4294967296L, 9007199254740993L, Long.MaxValue)
    val got = ids.toDF("id")
      .select(col("id"), Sampling.hashBucket(col("id"), 100).as("b"))
      .as[(Long, Long)].collect().toMap
    ids.foreach { id =>
      val exact = (((BigInt(id) % BigInt(2147483648L)) * BigInt(2654435761L))
        % BigInt(4294967296L)) % 100
      assert(got(id) == exact.toLong, s"id=$id: got ${got(id)}, exact $exact")
      assert(got(id) >= 0 && got(id) < 100, s"id=$id bucket out of range")
    }
    // below 2^31 the reduction is a no-op vs the historical formula
    ids.filter(_ < 2147483648L).foreach { id =>
      val legacy = ((BigInt(id) * BigInt(2654435761L)) % BigInt(4294967296L)) % 100
      assert(got(id) == legacy.toLong, s"id=$id: sub-2^31 hash changed vs legacy")
    }
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
