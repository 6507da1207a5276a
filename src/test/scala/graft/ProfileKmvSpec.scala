package graft

import org.apache.spark.sql.functions._

import graft.queries.BehaviorQueries

/** q193 (approximate table profile) against q181 (exact): the exact
  * fields must MATCH exactly, and the KMV distinct estimate must sit
  * within order-statistic error of the exact count — k=64 gives a
  * relative standard error of 1/sqrt(k-2) ≈ 12.7%, so 40% is past 3σ
  * for every column; a column with ≤ 64 distinct values ships its
  * whole hash set and the estimate IS exact. */
class ProfileKmvSpec extends SparkSpec {

  test("exact fields match q181 and distinct estimates are order-statistic-bounded") {
    val dir = "/root/testdata/sf0.01"
    val approx = BehaviorQueries.queries("q193_table_profile_kmv")(spark, dir)
    val exact = BehaviorQueries.queries("q181_table_profile")(spark, dir)
      .withColumnRenamed("n_rows", "x_rows").withColumnRenamed("n_null", "x_null")
    val j = approx.join(exact, Seq("col_name")).collect()
    assert(j.length == 11, "one profile row per lineitem column")
    j.foreach { r =>
      val (cn, est, ex) = (r.getAs[String]("col_name"),
        r.getAs[Double]("n_distinct_est"), r.getAs[Long]("n_distinct"))
      assert(r.getAs[Long]("n_rows") == r.getAs[Long]("x_rows"), s"$cn n_rows")
      assert(r.getAs[Long]("n_null") == r.getAs[Long]("x_null"), s"$cn n_null")
      if (ex <= 64) assert(est == ex.toDouble, s"$cn: sketch-is-the-set regime must be exact")
      else assert(math.abs(est - ex) / ex < 0.4,
        s"$cn: KMV estimate $est vs exact $ex exceeds the 3σ order-statistic bound")
    }
  }
}
