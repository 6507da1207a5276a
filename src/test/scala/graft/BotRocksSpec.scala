package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.streaming.StreamPipeline

/** botMaintain under the RocksDB state-store provider with a real
  * stop/restart — the second maintainer class run in the 100 TB
  * state-store configuration (TransitionRocksSpec covers the
  * transition carry). The bot store carries the subtlest state in the
  * family: per user, the last-event marker PLUS the three-number
  * minute triple (closed max, current minute, its count) — and the
  * designed feed splits a minute across the restart boundary, so the
  * restarted query must merge the open minute to its exact total.
  * Expected values come from one whole-feed batch into a fresh store
  * (single-batch ≡ multi-batch is BotStreamSpec's pin) plus explicit
  * hand-solved numbers. */
class BotRocksSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("user_id", LongType), StructField("ts", TimestampType),
    StructField("event_id", LongType), StructField("event_type", StringType)))

  test("RocksDB provider + restart: bot store equals whole-feed rebuild, open minute merges") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val srcDir = Files.createTempDirectory("graft_rocks_bot_src").toString
    val dir = Files.createTempDirectory("graft_rocks_bot").toString
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 09:00:00")
    def iso(sec: Int) = new java.sql.Timestamp(t0.getTime + sec * 1000L)
      .toInstant.toString.stripSuffix("Z")
    def writeBatch(name: String, rows: Seq[(Long, Int, Long, String)]): Unit = {
      val lines = rows.map { case (u, s, id, t) =>
        s"""{"user_id":$u,"ts":"${iso(s)}","event_id":$id,"event_type":"$t"}"""
      }
      Files.write(java.nio.file.Paths.get(srcDir, name), lines.mkString("\n").getBytes)
    }
    def startQuery() = StreamPipeline.botMaintain(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").json(srcDir),
      s"$dir/store", s"$dir/ckpt",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    // u1: 25 events 1 s apart from 09:00:40 — minute 09:00 holds 20,
    // 09:01 holds 5; the restart lands at event 16, leaving 09:00
    // OPEN (16 + 4 must merge to 20 across the RocksDB restart).
    // u2: 40-min gap across the restart = session cut, no gap row.
    val b0 = (0 until 16).map(i => (1L, 40 + i, 100L + i, "view")) ++
      Seq((2L, 0, 200L, "view"))
    val b1 = (16 until 25).map(i => (1L, 40 + i, 100L + i, "view")) ++
      Seq((2L, 2400, 201L, "click"))
    try {
      writeBatch("b0.json", b0)
      val q1 = startQuery()
      try q1.processAllAvailable() finally q1.stop()
      writeBatch("b1.json", b1)
      val q2 = startQuery()
      try q2.processAllAvailable() finally q2.stop()
      val got = StreamPipeline.botServe(spark, s"$dir/store").collect()
        .map(r => r.getAs[Long]("user_id") -> r).toMap
      val u1 = got(1L)
      assert(u1.getAs[Long]("n_events") == 25L && u1.getAs[Long]("n_gaps") == 24L &&
        u1.getAs[Long]("epm_max") == 20L && u1.getAs[Boolean]("is_metronomic"),
        s"u1 across RocksDB restart: $u1")
      val u2 = got(2L)
      assert(u2.getAs[Long]("n_sessions") == 2L && u2.getAs[Long]("n_gaps") == 0L,
        s"u2 across RocksDB restart: $u2")
      // full equality vs a whole-feed single-batch rebuild
      import spark.implicits._
      val whole = (b0 ++ b1).map { case (u, s2, id, t) =>
        (u, new java.sql.Timestamp(t0.getTime + s2 * 1000L), id, t)
      }.toDF("user_id", "ts", "event_id", "event_type")
      val freshStore = Files.createTempDirectory("graft_rocks_bot_ref").toString + "/store"
      StreamPipeline.botBatch(whole, freshStore, 0L)
      val want = StreamPipeline.botServe(spark, freshStore)
      val served = StreamPipeline.botServe(spark, s"$dir/store")
      assert(served.exceptAll(want).isEmpty && want.exceptAll(served).isEmpty,
        "restarted RocksDB stream must serve exactly the whole-feed rebuild")
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
