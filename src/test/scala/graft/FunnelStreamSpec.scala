package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Funnel
import graft.streaming.StreamPipeline

/** funnelMaintain: the maintained user-grain stage-time store must
  * reproduce batch q183's 4-row summary EXACTLY under any event-time-
  * ordered batch split (the state is mergeable per-user minima; the
  * maintainer runs the batch query's own gating over carry ∪ batch),
  * survive replay idempotently, and keep the store user-grain. */
class FunnelStreamSpec extends SparkSpec {
  import spark.implicits._

  private def sf() = "/root/testdata/sf0.001"

  private def summarySet(df: org.apache.spark.sql.DataFrame) = df.collect()
    .map(r => (r.getAs[Int]("stage_no"), r.getAs[String]("stage"),
      r.getAs[Long]("n_users"), Option(r.getAs[Double]("pct_prev")),
      Option(r.getAs[Double]("pct_first")))).toSet

  private def runSplit(chunks: Int): Unit = {
    val ev = graft.core.Tables.events(spark, sf())
      .select($"user_id", $"ts", $"event_type")
      .orderBy($"ts")
      .as[(Long, java.sql.Timestamp, String)].collect().toSeq
    val dir = Files.createTempDirectory(s"graft_funnel$chunks").toString
    val s = MemoryStream[(Long, java.sql.Timestamp, String)](spark)
    val q = StreamPipeline.funnelMaintain(
      s.toDF().toDF("user_id", "ts", "event_type"),
      s"$dir/funnel", s"$dir/ckpt",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      ev.grouped((ev.size + chunks - 1) / chunks).foreach { c =>
        s.addData(c); q.processAllAvailable()
      }
      val streamed = summarySet(Funnel.summary(spark.read.parquet(s"$dir/funnel")))
      val batch = summarySet(SparkEntry.queries("q183_funnel")(spark, sf()))
      assert(streamed == batch,
        s"$chunks-way split: maintained funnel must equal declared q183 exactly")
      // the SAME store serves q191's latency distribution exactly
      val served = Funnel.timeToConvert(spark.read.parquet(s"$dir/funnel"))
        .collect().map(_.toSeq).toSet
      val q191 = SparkEntry.queries("q191_time_to_convert")(spark, sf())
        .collect().map(_.toSeq).toSet
      assert(served == q191,
        s"$chunks-way split: store-served time-to-convert must equal declared q191")
    } finally q.stop()
  }

  test("3-way event-time split reproduces batch q183 exactly") { runSplit(3) }

  test("7-way event-time split reproduces batch q183 exactly") { runSplit(7) }

  test("replay idempotence and user-grain store") {
    val dir = Files.createTempDirectory("graft_funnel_r").toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def ts(min: Int) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    // u1 completes the funnel across two batches (purchase qualifies
    // against the CARRIED click); u2 views only; u3 has a click with
    // no prior view (gated out) — plus an error row for presence.
    val b1 = Seq((1L, ts(0), "view"), (1L, ts(5), "click"), (2L, ts(1), "view"),
      (3L, ts(2), "click"))
    val b2 = Seq((1L, ts(10), "purchase"), (3L, ts(11), "error"))
    StreamPipeline.funnelBatch(b1.toDF("user_id", "ts", "event_type"), s"$dir/f", 0L)
    StreamPipeline.funnelBatch(b2.toDF("user_id", "ts", "event_type"), s"$dir/f", 1L)
    val store = spark.read.parquet(s"$dir/f")
    assert(store.count() == 3, "user-grain: one row per user ever seen")
    val u1 = store.filter($"user_id" === 1L).head()
    assert(u1.getAs[java.sql.Timestamp]("t_purch") == ts(10),
      "cross-batch purchase must qualify against the carried click")
    val u3 = store.filter($"user_id" === 3L).head()
    assert(u3.getAs[java.sql.Timestamp]("t_view") == null &&
      u3.getAs[java.sql.Timestamp]("t_click") == null,
      "click before any view stays gated out; presence survives")
    // replaying the latest batch id is a no-op on the store
    val before = store.collect().toSet
    StreamPipeline.funnelBatch(b2.toDF("user_id", "ts", "event_type"), s"$dir/f", 1L)
    assert(spark.read.parquet(s"$dir/f").collect().toSet == before)
    val sum = summarySet(Funnel.summary(spark.read.parquet(s"$dir/f")))
    assert(sum == summarySet(Funnel.summary(Funnel.stageTimes(
      (b1 ++ b2).toDF("user_id", "ts", "event_type")))))
  }

  test("transitionMaintain surfaces event-time regressions via lateTransitionRows") {
    val dir = Files.createTempDirectory("graft_late").toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def ts(min: Int) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    val b1 = Seq((1L, ts(10), 1L, "view"), (2L, ts(10), 2L, "view"))
    // u1's second event arrives BEFORE its carried ts — a regression;
    // u2's is in order
    val b2 = Seq((1L, ts(5), 3L, "click"), (2L, ts(12), 4L, "click"))
    val before = StreamPipeline.lateTransitionRows.get()
    StreamPipeline.transitionBatch(
      b1.toDF("user_id", "ts", "event_id", "event_type"), s"$dir/c", s"$dir/k", 0L)
    assert(StreamPipeline.lateTransitionRows.get() == before, "in-order batch: no violations")
    StreamPipeline.transitionBatch(
      b2.toDF("user_id", "ts", "event_id", "event_type"), s"$dir/c", s"$dir/k", 1L)
    assert(StreamPipeline.lateTransitionRows.get() == before + 1,
      "exactly u1's regression must be counted")
  }
}
