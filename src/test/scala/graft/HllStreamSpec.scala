package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.StreamPipeline

/** hllMaintain (leg 25): max-merged registers must serve q232's
  * estimate columns BIT-IDENTICAL to the declared batch under any
  * split — max commutes, is idempotent, and is duplicate-insensitive,
  * so even OVERLAPPING batches (replayed docs) converge — and the
  * store stays ≤ |sources| × 512 rows forever.
  */
class HllStreamSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSet

  private def declared() = rows(
    SparkEntry.queries("q232_hll_distinct")(spark, dir)
      .select("source", "n_buckets_used", "hll_est_r2"))

  test("3-way split serves declared q232 estimates exactly") {
    val docs = graft.core.Tables.documents(spark, dir).select($"doc_id", $"source", $"text")
    val p = Files.createTempDirectory("graft_hll3").toString + "/regs"
    (0 until 3).foreach { r =>
      StreamPipeline.hllBatch(docs.filter(pmod($"doc_id", lit(3)) === r), p, r.toLong)
    }
    assert(rows(StreamPipeline.hllServe(spark, p)) == declared(),
      "served HLL estimates must equal declared q232 bitwise")
  }

  test("overlapping batches and replays converge to the same registers; store stays bounded") {
    val docs = graft.core.Tables.documents(spark, dir).select($"doc_id", $"source", $"text")
    val p = Files.createTempDirectory("graft_hllov").toString + "/regs"
    // overlapping thirds: every doc appears in TWO batches — the
    // duplicate-insensitivity no other maintainer class can claim
    StreamPipeline.hllBatch(docs.filter(pmod($"doc_id", lit(3)) =!= 0), p, 0L)
    StreamPipeline.hllBatch(docs.filter(pmod($"doc_id", lit(3)) =!= 1), p, 1L)
    StreamPipeline.hllBatch(docs.filter(pmod($"doc_id", lit(3)) =!= 2), p, 2L)
    assert(rows(StreamPipeline.hllServe(spark, p)) == declared(),
      "overlapping feeds must converge: registers are duplicate-insensitive")
    // replay the last batch: marker no-op
    val before = spark.read.parquet(p).collect().toSet
    StreamPipeline.hllBatch(docs.filter(pmod($"doc_id", lit(3)) =!= 2), p, 2L)
    assert(spark.read.parquet(p).collect().toSet == before)
    val store = spark.read.parquet(p)
    val nSources = store.select("source").distinct().count()
    assert(store.count() <= nSources * 512,
      s"store must stay <= |sources| x 512: ${store.count()}")
  }
}
