package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.Sessionize

/** Event-time-timeout sessionization: completed sessions emitted
  * exactly once, equal to the declarative session_window grouping on
  * the same data, with state removed as sessions close. */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private val Gap = 30 * 60 * 1000L // 30 min
  private def t(min: Long) = new Timestamp(3600_000L * 100 + min * 60_000L)

  test("streaming sessions equal batch session_window; timeouts flush quiet keys") {
    val stream = MemoryStream[(Long, Timestamp, Double)](spark)
    val input = stream.toDF().toDF("user_id", "ts", "value")
      .withWatermark("ts", "10 minutes")
    val out = Sessionize.sessions(spark, input, Gap)
    val q = out.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      // user 1: two sessions (35-min gap between min 20 and min 55 — wait,
      // gap is 30 min so 20 -> 55 is a 35-min silence = session break);
      // user 2: one session; events arrive out of order within batches
      stream.addData((1L, t(10), 1.0), (1L, t(0), 2.0), (2L, t(5), 5.0))
      q.processAllAvailable()
      stream.addData((1L, t(20), 3.0), (1L, t(55), 4.0), (2L, t(15), 6.0))
      q.processAllAvailable()
      // sentinel advances the watermark far past everything + gap,
      // firing the event-time timeouts for all open sessions
      stream.addData((99L, t(10000), 0.0))
      q.processAllAvailable()
      stream.addData((99L, t(20000), 0.0))
      q.processAllAvailable()

      val got = spark.table("sess_out")
        .filter($"user_id" < 99)
        .select($"user_id", $"session_start", $"session_end", $"n_events", $"sum_value")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3), r.getDouble(4)))
        .toSet

      val batch = Seq(
        (1L, t(10), 1.0), (1L, t(0), 2.0), (2L, t(5), 5.0),
        (1L, t(20), 3.0), (1L, t(55), 4.0), (2L, t(15), 6.0))
        .toDF("user_id", "ts", "value")
        .groupBy($"user_id", session_window($"ts", "30 minutes").as("w"))
        .agg(count(lit(1)).as("n"), sum($"value").as("s"))
        .select($"user_id", $"w.start", $"w.end", $"n", $"s")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3), r.getDouble(4)))
        .toSet

      assert(got == batch, s"streaming $got\nbatch $batch")
      assert(got.size == 3, "user 1 splits on the 35-min silence; user 2 has one session")
    } finally q.stop()
  }

  test("in-stream closure: a late-session event emits the prior session without a timeout") {
    val stream = MemoryStream[(Long, Timestamp, Double)](spark)
    val input = stream.toDF().toDF("user_id", "ts", "value")
      .withWatermark("ts", "10 minutes")
    val q = Sessionize.sessions(spark, input, Gap)
      .writeStream.format("memory").queryName("sess_out2").outputMode("append").start()
    try {
      stream.addData((7L, t(0), 1.0))
      q.processAllAvailable()
      // same key, one batch later, 40 min after: closes session 1 in-stream
      stream.addData((7L, t(40), 2.0))
      q.processAllAvailable()
      val rows = spark.table("sess_out2").collect()
      assert(rows.length == 1, s"exactly the closed session should be emitted: ${rows.toSeq}")
      val r = rows.head
      assert(r.getAs[Long]("n_events") == 1L)
      assert(r.getAs[Timestamp]("session_end").getTime == t(0).getTime + Gap)
    } finally q.stop()
  }

  test("watermark delay > gap: a straggler disjoint before the open session splits, not merges") {
    val stream = MemoryStream[(Long, Timestamp, Double)](spark)
    // delay (120 min) deliberately exceeds gap (30 min) — the regime
    // where events older than (open-session start - gap) reach the
    // operator instead of being dropped at the watermark
    val input = stream.toDF().toDF("user_id", "ts", "value")
      .withWatermark("ts", "120 minutes")
    val q = Sessionize.sessions(spark, input, Gap)
      .writeStream.format("memory").queryName("sess_out3").outputMode("append").start()
    try {
      stream.addData((7L, t(100), 1.0)) // opens session at min 100
      q.processAllAvailable()
      // straggler at min 0 — 100 min before the open session's start,
      // far beyond gap: it must become its OWN session, and the open
      // session at min 100 must keep its start
      stream.addData((7L, t(0), 2.0))
      q.processAllAvailable()
      stream.addData((99L, t(10000), 0.0), (99L, t(20000), 0.0)) // advance watermark, fire timeouts
      q.processAllAvailable()
      stream.addData((99L, t(30000), 0.0))
      q.processAllAvailable()
      val got = spark.table("sess_out3").filter($"user_id" === 7L)
        .collect().map(r => (r.getAs[Timestamp]("session_start").getTime,
          r.getAs[Timestamp]("session_end").getTime, r.getAs[Long]("n_events")))
        .toSet
      assert(got == Set(
        (t(0).getTime, t(0).getTime + Gap, 1L),
        (t(100).getTime, t(100).getTime + Gap, 1L)),
        s"straggler must split into its own session: $got")
    } finally q.stop()
  }
}
