package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.TableProfile
import graft.queries.BehaviorQueries
import graft.streaming.StreamPipeline

/** profileMaintain: the maintained per-column state (additive
  * counters + KMV k-min sets) must serve the q193 profile
  * BIT-IDENTICAL to a batch rebuild — under any split of the rows,
  * in any order (the state is exactly mergeable: counter addition +
  * k-min union → re-k-min). */
class ProfileStreamSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val colTypes = Seq(
    "l_orderkey" -> "int", "l_partkey" -> "int", "l_suppkey" -> "int",
    "l_linenumber" -> "int",
    "l_quantity" -> "double", "l_extendedprice" -> "double",
    "l_discount" -> "double", "l_tax" -> "double",
    "l_returnflag" -> "str", "l_linestatus" -> "str", "l_shipdate" -> "ts")

  private def served(store: String) =
    TableProfile.profile(spark.read.parquet(store)).collect().map(_.toSeq).toSet

  test("3-way modulo split (interleaved, not time-ordered) serves declared q193 exactly") {
    val li = graft.core.Tables.lineitem(spark, dir)
    val p = Files.createTempDirectory("graft_prof").toString + "/st"
    (0 until 3).foreach { r =>
      StreamPipeline.profileBatch(li.filter(col("l_orderkey") % 3 === r), p, colTypes, r.toLong)
    }
    val batch = BehaviorQueries.queries("q193_table_profile_kmv")(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(served(p) == batch, "maintained profile must equal declared q193 bitwise")
  }

  test("merge is associative across a different (5-way) split; replay is a no-op") {
    val li = graft.core.Tables.lineitem(spark, dir)
    val p = Files.createTempDirectory("graft_prof5").toString + "/st"
    (0 until 5).foreach { r =>
      StreamPipeline.profileBatch(li.filter(col("l_orderkey") % 5 === r), p, colTypes, r.toLong)
    }
    val batch = BehaviorQueries.queries("q193_table_profile_kmv")(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(served(p) == batch)
    val before = spark.read.parquet(p).collect().toSet
    StreamPipeline.profileBatch(li.filter(col("l_orderkey") % 5 === 4), p, colTypes, 4L)
    assert(spark.read.parquet(p).collect().toSet == before, "marker replay must be a no-op")
  }

  test("state is constant-size and all-null columns survive the round trip") {
    import spark.implicits._
    val ct = Seq("a" -> "int", "b" -> "str")
    val p = Files.createTempDirectory("graft_prof_n").toString + "/st"
    val b1 = Seq((1L, null.asInstanceOf[String]), (2L, null.asInstanceOf[String])).toDF("a", "b")
    val b2 = Seq((3L, "x")).toDF("a", "b")
    StreamPipeline.profileBatch(b1, p, ct, 0L)
    StreamPipeline.profileBatch(b2, p, ct, 1L)
    val rows = TableProfile.profile(spark.read.parquet(p)).collect()
      .map(r => r.getAs[String]("col_name") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("n_null"), r.getAs[Double]("n_distinct_est")))
      .toMap
    assert(rows("a") == ((3L, 0L, 3.0)))
    assert(rows("b") == ((3L, 2L, 1.0)), "two nulls counted, one distinct value")
    assert(spark.read.parquet(p).count() == 2, "state stays |cols| rows")
  }
}
