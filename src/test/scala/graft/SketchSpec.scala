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
}
