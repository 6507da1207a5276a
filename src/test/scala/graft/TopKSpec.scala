package graft

import org.apache.spark.sql.functions._

import graft.functions.{BoundedTopK, Similarity}

/** BoundedTopK (heap partial-agg) vs the row_number window it
  * replaced: identical rows + ranks, partitioning-invariant, and the
  * plan must show partial object-hash aggregation with no Window. */
class TopKSpec extends SparkSpec {
  import spark.implicits._

  private def scoredFrame(rows: Int, queries: Int, parts: Int) = {
    // deterministic pseudo-scores; duplicates included to exercise the
    // neighbor_id tiebreak
    spark.range(rows).repartition(parts)
      .select(
        (col("id") % queries).as("query_id"),
        col("id").as("neighbor_id"),
        (((col("id") * 2654435761L) % 1000L) / lit(1000.0)).as("cos_r"))
  }

  test("bounded-heap topK ≡ window topK, rows and ranks") {
    val scored = scoredFrame(rows = 5000, queries = 7, parts = 13).cache()
    val got = Similarity.topK(scored, 5, col("cos_r"))
      .select("query_id", "neighbor_id", "cos_r", "rnk")
      .as[(Long, Long, Double, Long)].collect().toSet
    val want = Similarity.topKWindow(scored, 5, col("cos_r"))
      .select("query_id", "neighbor_id", "cos_r", "rnk")
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(got == want)
    assert(got.size == 7 * 5)
    scored.unpersist()
  }

  test("topK is partitioning-invariant (total order key)") {
    val a = Similarity.topK(scoredFrame(2000, 5, 3), 4, col("cos_r"))
      .select("query_id", "neighbor_id", "rnk").as[(Long, Long, Long)].collect().toSet
    val b = Similarity.topK(scoredFrame(2000, 5, 17), 4, col("cos_r"))
      .select("query_id", "neighbor_id", "rnk").as[(Long, Long, Long)].collect().toSet
    assert(a == b)
  }

  test("topK handles k larger than the group (emits all, ranked)") {
    val scored = Seq((1L, 10L, 0.9), (1L, 11L, 0.5), (2L, 12L, 0.7))
      .toDF("query_id", "neighbor_id", "cos_r")
    val got = Similarity.topK(scored, 100, col("cos_r"))
      .select("query_id", "neighbor_id", "rnk").as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 10L, 1L), (1L, 11L, 2L), (2L, 12L, 1L)))
  }

  test("topK ties broken by neighbor_id ascending") {
    val scored = Seq((1L, 30L, 0.5), (1L, 10L, 0.5), (1L, 20L, 0.5), (1L, 40L, 0.4))
      .toDF("query_id", "neighbor_id", "cos_r")
    val got = Similarity.topK(scored, 2, col("cos_r"))
      .orderBy("rnk").select("neighbor_id").as[Long].collect().toSeq
    assert(got == Seq(10L, 20L))
  }

  test("topK plan: partial object-hash aggregate, no Window, no global sort") {
    val plan = Similarity.topK(scoredFrame(1000, 3, 5), 5, col("cos_r"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window survived:\n$plan")
    assert(plan.contains("ObjectHashAggregate"), s"no object-hash agg:\n$plan")
    assert(plan.toLowerCase.contains("partial_bounded_top_k"), s"no partial mode:\n$plan")
  }
}
