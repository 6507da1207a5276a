package graft

import java.nio.file.Files

import graft.streaming.StreamPipeline

/** botMaintain: the maintained per-user cadence store must serve q205
  * bit-identical to a batch rebuild. The carry is each user's last
  * event (boundary gaps and session cuts replay the shared gap rule),
  * and the minute-rate state is the three-number (closed max, current
  * minute, its count) triple — a minute split across batches must
  * merge to its exact total. */
class BotStreamSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toSeq).toSet

  test("designed cross-batch feed: metronome spans batches, minute merges exactly, gap vs cut") {
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 09:00:00")
    def ts(sec: Int) = new java.sql.Timestamp(t0.getTime + sec * 1000L)
    val p = Files.createTempDirectory("graft_bot").toString + "/store"
    // u1: 25 events exactly 1 s apart from 09:00:40 — minute 09:00
    // gets 20 events, 09:01 gets 5, and the split at event 16 leaves
    // minute 09:00 OPEN across the boundary (16 + 4 must merge to 20).
    // u2: 40-min gap across the boundary = session CUT (no gap row).
    // u3: 20-s gap across the boundary = ONE within-session gap.
    val b0 = (0 until 16).map(i => (1L, ts(40 + i), 100L + i, "view")) ++
      Seq((2L, ts(0), 200L, "view"), (3L, ts(0), 300L, "view"))
    val b1 = (16 until 25).map(i => (1L, ts(40 + i), 100L + i, "view")) ++
      Seq((2L, ts(2400), 201L, "click"), (3L, ts(20), 301L, "click"))
    StreamPipeline.botBatch(
      b0.toDF("user_id", "ts", "event_id", "event_type"), p, 0L)
    StreamPipeline.botBatch(
      b1.toDF("user_id", "ts", "event_id", "event_type"), p, 1L)
    val got = StreamPipeline.botServe(spark, p).collect()
      .map(r => r.getAs[Long]("user_id") -> r).toMap
    val u1 = got(1L)
    assert(u1.getAs[Long]("n_events") == 25L && u1.getAs[Long]("n_sessions") == 1L &&
      u1.getAs[Long]("n_gaps") == 24L, s"u1: $u1")
    assert(u1.getAs[Long]("epm_max") == 20L, s"split minute must merge to 20: $u1")
    assert(u1.getAs[Double]("mean_gap_s") == 1.0 && u1.getAs[Double]("sd_gap_s") == 0.0 &&
      u1.getAs[Boolean]("is_metronomic"), s"u1: $u1")
    val u2 = got(2L)
    assert(u2.getAs[Long]("n_sessions") == 2L && u2.getAs[Long]("n_gaps") == 0L &&
      u2.isNullAt(u2.fieldIndex("mean_gap_s")) && !u2.getAs[Boolean]("is_metronomic"),
      s"u2: $u2")
    val u3 = got(3L)
    assert(u3.getAs[Long]("n_sessions") == 1L && u3.getAs[Long]("n_gaps") == 1L &&
      u3.getAs[Double]("mean_gap_s") == 20.0 && u3.getAs[Double]("sd_gap_s") == 0.0 &&
      !u3.getAs[Boolean]("is_metronomic"), s"u3: $u3")
    // replayed batch is a no-op on the store
    val before = spark.read.parquet(p).collect().toSet
    StreamPipeline.botBatch(
      b1.toDF("user_id", "ts", "event_id", "event_type"), p, 1L)
    assert(spark.read.parquet(p).collect().toSet == before, "replay must no-op")
    // an event-time regression against the carry is counted, never silent
    val lateBefore = StreamPipeline.lateBotRows.get()
    StreamPipeline.botBatch(
      Seq((1L, ts(0), 999L, "view")).toDF("user_id", "ts", "event_id", "event_type"),
      p, 2L)
    assert(StreamPipeline.lateBotRows.get() > lateBefore, "late row must be observable")
  }

  test("3-chunk and 6-chunk real-feed streams serve declared q205 bitwise") {
    val ev = graft.core.Tables.events(spark, dir)
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .orderBy($"ts", $"event_id")
      .as[(Long, java.sql.Timestamp, Long, String)].collect().toSeq
    val declared = rows(SparkEntry.queries("q205_bot_profile")(spark, dir))
    for (chunks <- Seq(3, 6)) {
      val p = Files.createTempDirectory(s"graft_bot$chunks").toString + "/store"
      ev.grouped((ev.size + chunks - 1) / chunks).zipWithIndex.foreach { case (c, i) =>
        StreamPipeline.botBatch(
          c.toDF("user_id", "ts", "event_id", "event_type"), p, i.toLong)
      }
      assert(rows(StreamPipeline.botServe(spark, p)) == declared,
        s"$chunks-chunk stream must serve the declared q205 exactly")
    }
  }
}
