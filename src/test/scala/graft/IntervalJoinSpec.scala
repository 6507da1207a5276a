package graft

import org.apache.spark.sql.functions._

import graft.operators.IntervalJoin

/** Binned interval overlap join: exactly the cross-product pairs, one
  * row each, on an equi-join plan. */
class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random intervals (hash-derived, no rand())
  private def intervals(n: Int, idName: String, salt: Long) =
    spark.range(n).select(
      col("id").as(idName),
      ((col("id") * 2654435761L + salt) % 997 / 10.0).as("lo"))
      .withColumn("hi", col("lo") + ((col(idName) * 40503L + salt) % 53 + 1) / 10.0)

  private def naive(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) =
    a.crossJoin(b.withColumnRenamed("lo", "lo_b").withColumnRenamed("hi", "hi_b"))
      .filter(col("lo") < col("hi_b") && col("lo_b") < col("hi"))
      .select(col("id_a"), col("id_b"))

  test("overlapJoin equals the naive cross-product filter, exactly once per pair") {
    val a = intervals(400, "id_a", 7)
    val b = intervals(300, "id_b", 1009)
    val want = naive(a, b).as[(Long, Long)].collect().sorted.toSeq
    for (binSize <- Seq(1.0, 2.5, 7.0)) {
      val gotRows = IntervalJoin.overlapJoin(a, b, "id_a", "id_b", binSize)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSeq
      assert(gotRows.length == gotRows.distinct.length,
        s"binSize=$binSize emitted duplicate pairs")
      assert(gotRows.sorted == want, s"binSize=$binSize pair set mismatch")
    }
    assert(want.nonEmpty, "test would be vacuous with no overlaps")
  }

  test("overlap bounds are the intersection; plan is an equi join, not a nested loop") {
    val a = intervals(200, "id_a", 7)
    val b = intervals(200, "id_b", 1009)
    val out = IntervalJoin.overlapJoin(a, b, "id_a", "id_b", 2.0)
    assert(out.filter(col("overlap_lo") >= col("overlap_hi")).count() == 0,
      "every reported overlap must be non-empty")
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"overlap join fell back to a nested loop:\n$p")
  }

  test("zero-width intervals are empty under half-open semantics and never pair") {
    // [5,5) sits strictly inside [0,10) yet is empty — must not match;
    // the proper pair [4,6) x [0,10) must still come through
    val a = Seq((1L, 5.0, 5.0), (2L, 4.0, 6.0)).toDF("id_a", "lo", "hi")
    val b = Seq((10L, 0.0, 10.0), (11L, 5.0, 5.0)).toDF("id_b", "lo", "hi")
    val got = IntervalJoin.overlapJoin(a, b, "id_a", "id_b", 2.0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == Set((2L, 10L)),
      s"degenerate intervals leaked into the pair set: $got")
  }
}
