package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.StreamPipeline

/** madMaintain (leg 26) + basketMaintain (leg 27): the additive
  * grids must serve q248 / q246 BIT-IDENTICAL to the declared batch
  * queries under splits, and replays must be no-ops. The MAD grid
  * has NO arrival contract (hash-shuffled splits converge); the
  * basket cells require order-complete batches (split by ORDER, any
  * hash of the order key).
  */
class InsightStreamSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSet

  test("madMaintain: 4-way hash-shuffled split serves declared q248 exactly; replay no-op") {
    val ev = graft.core.Tables.events(spark, dir)
      .select($"event_type", $"value", $"event_id")
    val p = Files.createTempDirectory("graft_mad4").toString + "/grid"
    (0 until 4).foreach { r =>
      StreamPipeline.madBatch(
        ev.filter(pmod(xxhash64(col("event_id")), lit(4)) === r).drop("event_id"),
        p, r.toLong)
    }
    val declared = rows(SparkEntry.queries("q248_mad_outliers")(spark, dir))
    assert(rows(StreamPipeline.madServe(spark, p)) == declared,
      "served median/MAD must equal declared q248 bitwise")
    // foreachBatch replays only the LAST batch after a crash — the
    // marker protocol guards exactly that batch
    val before = spark.read.parquet(p).collect().toSet
    StreamPipeline.madBatch(
      ev.filter(pmod(xxhash64(col("event_id")), lit(4)) === 3).drop("event_id"), p, 3L)
    assert(spark.read.parquet(p).collect().toSet == before,
      "replaying the last batch must be a no-op")
  }

  test("madMaintain: grid store is value-grain (domain-bounded), one row per (type, cent)") {
    val p = Files.createTempDirectory("graft_madg").toString + "/grid"
    StreamPipeline.madBatch(graft.core.Tables.events(spark, dir)
      .select($"event_type", $"value"), p, 0L)
    val g = spark.read.parquet(p)
    assert(g.groupBy("event_type", "vc").count().filter(col("count") > 1).isEmpty)
    val n = graft.core.Tables.events(spark, dir).filter($"value".isNotNull).count()
    assert(g.agg(sum("x")).head().getLong(0) == n, "grid mass must equal event count")
  }

  test("trimmedServe: the SAME madMaintain grid serves declared q260 exactly (one store, two serves)") {
    val ev = graft.core.Tables.events(spark, dir)
      .select($"event_type", $"value", $"event_id")
    val p = Files.createTempDirectory("graft_trim").toString + "/grid"
    (0 until 3).foreach { r =>
      StreamPipeline.madBatch(
        ev.filter(pmod(xxhash64(col("event_id")), lit(3)) === r).drop("event_id"),
        p, r.toLong)
    }
    val declared = rows(SparkEntry.queries("q260_trimmed_means")(spark, dir))
    assert(rows(StreamPipeline.trimmedServe(spark, p)) == declared,
      "served trimmed/winsorized means must equal declared q260 bitwise")
  }

  test("basketMaintain: order-complete splits serve declared q246 exactly; replay no-op") {
    val li = graft.core.Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_partkey")
    val p = Files.createTempDirectory("graft_basket3").toString + "/cells"
    // split by ORDER (the completed-basket contract): every line of
    // an order lands in the same micro-batch
    (0 until 3).foreach { r =>
      StreamPipeline.basketBatch(
        li.filter(pmod(xxhash64(col("l_orderkey")), lit(3)) === r), p, r.toLong)
    }
    val declared = rows(SparkEntry.queries("q246_basket_rules")(spark, dir))
    assert(rows(StreamPipeline.basketServe(spark, p)) == declared,
      "served rules must equal declared q246 bitwise")
    // foreachBatch replays only the LAST batch after a crash — the
    // marker protocol guards exactly that batch
    val before = spark.read.parquet(p).collect().toSet
    StreamPipeline.basketBatch(
      li.filter(pmod(xxhash64(col("l_orderkey")), lit(3)) === 2), p, 2L)
    assert(spark.read.parquet(p).collect().toSet == before,
      "replaying the last batch must be a no-op")
  }

  test("basketMaintain: the cell store carries exactly one order sentinel row with the order count") {
    val li = graft.core.Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_partkey")
    val p = Files.createTempDirectory("graft_basketg").toString + "/cells"
    (0 until 2).foreach { r =>
      StreamPipeline.basketBatch(
        li.filter(pmod(xxhash64(col("l_orderkey")), lit(2)) === r), p, r.toLong)
    }
    val g = spark.read.parquet(p)
    val sentinel = g.filter(col("ka").isNull && col("kb").isNull).collect()
    assert(sentinel.length == 1)
    assert(sentinel.head.getAs[Long]("cnt") ==
      li.select("l_orderkey").distinct().count())
    // item mass: sum of item-support cells = distinct (order, part)
    assert(g.filter(col("ka").isNotNull && col("kb").isNull)
      .agg(sum("cnt")).head().getLong(0) == li.distinct().count())
  }
}
