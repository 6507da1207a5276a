package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Sessions
import graft.streaming.StreamPipeline

/** sessionsMaintain: the user-grain closed+open store must serve
  * q182's summary BIT-IDENTICAL to a batch rebuild under any
  * event-time-ordered split — including sessions that span three
  * batches and users untouched by a batch. */
class SessionsStreamSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def served(store: String) =
    Sessions.summary(spark.read.parquet(store)).collect().map(_.toSeq).toSet

  private def declared() =
    SparkEntry.queries("q182_sessions")(spark, dir).collect().map(_.toSeq).toSet

  private def runSplit(chunks: Int): Unit = {
    val ev = graft.core.Tables.events(spark, dir)
      .select($"user_id", $"ts", $"event_id")
      .orderBy($"ts", $"event_id")
      .as[(Long, java.sql.Timestamp, Long)].collect().toSeq
    val p = Files.createTempDirectory(s"graft_sess$chunks").toString + "/st"
    ev.grouped((ev.size + chunks - 1) / chunks).zipWithIndex.foreach { case (c, i) =>
      StreamPipeline.sessionsBatch(c.toDF("user_id", "ts", "event_id"), p, i.toLong)
    }
    assert(served(p) == declared(),
      s"$chunks-way split: served session summary must equal declared q182 exactly")
  }

  test("4-way event-time split serves declared q182 exactly") { runSplit(4) }

  test("8-way event-time split serves declared q182 exactly") { runSplit(8) }

  test("a session spanning three batches stays ONE session; untouched users persist") {
    val t0 = java.sql.Timestamp.valueOf("2024-07-01 10:00:00")
    def ts(min: Int) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    val p = Files.createTempDirectory("graft_sess_span").toString + "/st"
    // u1: one session built 1 event per batch (gaps 20 min < 30);
    // u2: only in batch 1, then untouched
    StreamPipeline.sessionsBatch(
      Seq((1L, ts(0), 1L), (2L, ts(0), 2L)).toDF("user_id", "ts", "event_id"), p, 0L)
    StreamPipeline.sessionsBatch(
      Seq((1L, ts(20), 3L)).toDF("user_id", "ts", "event_id"), p, 1L)
    StreamPipeline.sessionsBatch(
      Seq((1L, ts(40), 4L)).toDF("user_id", "ts", "event_id"), p, 2L)
    val got = Sessions.summary(spark.read.parquet(p)).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_sessions"), r.getAs[Long]("total_events"),
          r.getAs[Long]("max_session_events"), r.getAs[Double]("avg_session_secs"))).toMap
    assert(got(1L) == ((1L, 3L, 3L, 2400.0)), s"u1: ${got(1L)}") // one 40-min session
    assert(got(2L) == ((1L, 1L, 1L, 0.0)), "untouched user keeps its state")
    // a 31-min gap then closes it — two sessions
    StreamPipeline.sessionsBatch(
      Seq((1L, ts(71), 5L)).toDF("user_id", "ts", "event_id"), p, 3L)
    val got2 = Sessions.summary(spark.read.parquet(p)).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n_sessions")).toMap
    assert(got2(1L) == 2L, "the 31-min gap must cut a new session")
    // replaying the latest batch is a no-op
    val before = spark.read.parquet(p).collect().toSet
    StreamPipeline.sessionsBatch(
      Seq((1L, ts(71), 5L)).toDF("user_id", "ts", "event_id"), p, 3L)
    assert(spark.read.parquet(p).collect().toSet == before)
  }
}
