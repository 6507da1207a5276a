package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.Retention
import graft.streaming.StreamPipeline

/** retentionMaintain: the maintained (user, day) activity set must
  * reproduce batch q184's triangle EXACTLY — and because the state is
  * a distinct set + per-user min (fully order-insensitive), it must
  * do so even when the feed arrives in SHUFFLED order, with no
  * ordered-arrival contract at all. */
class RetentionStreamSpec extends SparkSpec {
  import spark.implicits._

  private def sf() = "/root/testdata/sf0.001"

  private def triSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSet

  private def run(order: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
                  label: String, chunks: Int): Unit = {
    val ev = order(graft.core.Tables.events(spark, sf()).select($"user_id", $"ts"))
      .as[(Long, java.sql.Timestamp)].collect().toSeq
    val dir = Files.createTempDirectory(s"graft_ret_$label").toString
    val s = MemoryStream[(Long, java.sql.Timestamp)](spark)
    val q = StreamPipeline.retentionMaintain(
      s.toDF().toDF("user_id", "ts"), s"$dir/act", s"$dir/ckpt",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      ev.grouped((ev.size + chunks - 1) / chunks).foreach { c =>
        s.addData(c); q.processAllAvailable()
      }
      val streamed = triSet(Retention.triangle(spark.read.parquet(s"$dir/act")))
      val batch = triSet(SparkEntry.queries("q184_retention")(spark, sf()))
      assert(streamed == batch,
        s"$label: maintained triangle must equal declared q184 exactly")
    } finally q.stop()
  }

  test("event-time-ordered 4-way split reproduces batch q184 exactly") {
    run(_.orderBy($"ts"), "ordered", 4)
  }

  test("SHUFFLED 5-way split still reproduces batch q184 (order-insensitive state)") {
    // deterministic shuffle: order by a hash of the row, so days and
    // users interleave arbitrarily across micro-batches
    run(_.orderBy(org.apache.spark.sql.functions.xxhash64($"user_id", $"ts")),
      "shuffled", 5)
  }

  test("replay idempotence and day-grain store") {
    val dir = Files.createTempDirectory("graft_ret_r").toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def ts(d: Int, h: Int) = new java.sql.Timestamp(t0.getTime + (d * 24L + h) * 3600000L)
    val b1 = Seq((1L, ts(0, 0)), (1L, ts(0, 5)), (2L, ts(1, 0)))
    val b2 = Seq((1L, ts(2, 1)), (2L, ts(1, 9))) // u2's second event: same day, no new row
    StreamPipeline.retentionBatch(b1.toDF("user_id", "ts"), s"$dir/act", 0L)
    StreamPipeline.retentionBatch(b2.toDF("user_id", "ts"), s"$dir/act", 1L)
    val store = spark.read.parquet(s"$dir/act")
    assert(store.count() == 3, "day-grain: (u1,d0), (u1,d2), (u2,d1)")
    val before = store.collect().toSet
    StreamPipeline.retentionBatch(b2.toDF("user_id", "ts"), s"$dir/act", 1L)
    assert(spark.read.parquet(s"$dir/act").collect().toSet == before)
  }
}
