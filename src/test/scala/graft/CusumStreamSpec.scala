package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.StreamPipeline

/** cusumMaintain (leg 20): the maintained (event_type, day) count
  * grid must serve q224 BIT-IDENTICAL to a batch run. Addition
  * commutes, so any split — interleaved or hash-shuffled, no arrival
  * order contract — must converge, and a marker replay is a no-op. */
class CusumStreamSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toSeq).toSet

  test("3-way interleaved split: cusumServe == declared q224 bitwise") {
    val ev = graft.core.Tables.events(spark, dir)
    val p = Files.createTempDirectory("graft_cusum3").toString + "/st"
    (0 until 3).foreach { r =>
      StreamPipeline.cusumBatch(ev.filter(col("event_id") % 3 === r), p, r.toLong)
    }
    assert(rows(StreamPipeline.cusumServe(spark, p)) ==
      rows(SparkEntry.queries("q224_cusum_changepoint")(spark, dir)),
      "served CUSUM must equal declared q224 bitwise")
  }

  test("5-way hash-shuffled split converges; replay is a no-op; store stays grid-sized") {
    val ev = graft.core.Tables.events(spark, dir)
    val p = Files.createTempDirectory("graft_cusum5").toString + "/st"
    (0 until 5).foreach { r =>
      StreamPipeline.cusumBatch(
        ev.filter(pmod(xxhash64(col("event_id")), lit(5)) === r), p, r.toLong)
    }
    assert(rows(StreamPipeline.cusumServe(spark, p)) ==
      rows(SparkEntry.queries("q224_cusum_changepoint")(spark, dir)),
      "shuffled split must converge (addition commutes)")
    // replay the LAST batch — the only one Spark's foreachBatch
    // at-least-once contract can redeliver (earlier batches are
    // checkpoint-committed); its marker is still in the live store
    val before = spark.read.parquet(p).collect().toSet
    StreamPipeline.cusumBatch(
      ev.filter(pmod(xxhash64(col("event_id")), lit(5)) === 4), p, 4L)
    assert(spark.read.parquet(p).collect().toSet == before,
      "marker replay must be a no-op (counts are NOT idempotent without it)")
    val store = spark.read.parquet(p)
    assert(store.groupBy(col("event_type"), col("day")).count()
      .filter(col("count") > 1).isEmpty, "one row per (event_type, day)")
    // the store is the exact batch grid
    val batchGrid = graft.core.Tables.events(spark, dir)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("x"))
    assert(rows(store.select(col("event_type"), col("day"), col("x"))) == rows(batchGrid))
  }
}
