package graft

import java.nio.file.Files

import org.apache.spark.sql.types._

import graft.streaming.StreamPipeline

/** scd2Maintain under the RocksDB state-store provider with a real
  * stop/restart — the third maintainer class run in the 100 TB
  * state-store configuration (transitions and bots are the other
  * two). The designed feed opens an interval BEFORE the restart and
  * closes it with a state change AFTER, so the restarted query must
  * continue the version chain and stamp the pre-restart open row's
  * valid_to from a post-restart event. Expected values: the served
  * dimension must equal the declared batch q220 over the whole feed
  * bitwise. */
class Scd2RocksSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("user_id", LongType), StructField("ts", TimestampType),
    StructField("event_id", LongType), StructField("event_type", StringType)))

  test("RocksDB provider + restart: served dimension equals batch q220, intervals close across the restart") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val srcDir = Files.createTempDirectory("graft_rocks_scd2_src").toString
    val dir = Files.createTempDirectory("graft_rocks_scd2").toString
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 09:00:00")
    def iso(sec: Int) = new java.sql.Timestamp(t0.getTime + sec * 1000L)
      .toInstant.toString.stripSuffix("Z")
    def writeBatch(name: String, rows: Seq[(Long, Int, Long, String)]): Unit = {
      val lines = rows.map { case (u, s, id, t) =>
        s"""{"user_id":$u,"ts":"${iso(s)}","event_id":$id,"event_type":"$t"}"""
      }
      Files.write(java.nio.file.Paths.get(srcDir, name), lines.mkString("\n").getBytes)
    }
    def startQuery() = StreamPipeline.scd2Maintain(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").json(srcDir),
      s"$dir/dim", s"$dir/carry", s"$dir/ckpt",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    // u1: view(0) -> click(60) before the restart; view(120) AFTER the
    // restart closes the click interval opened before it (version 3).
    // u2: one state throughout — the restart must not invent a change.
    val b0 = Seq((1L, 0, 1L, "view"), (1L, 60, 2L, "click"), (2L, 0, 3L, "view"))
    val b1 = Seq((1L, 120, 4L, "view"), (2L, 120, 5L, "view"))
    try {
      writeBatch("b0.json", b0)
      val q1 = startQuery()
      try q1.processAllAvailable() finally q1.stop()
      writeBatch("b1.json", b1)
      val q2 = startQuery()
      try q2.processAllAvailable() finally q2.stop()
      import spark.implicits._
      val whole = (b0 ++ b1).map { case (u, s2, id, t) =>
        (u, new java.sql.Timestamp(t0.getTime + s2 * 1000L), id, t)
      }.toDF("user_id", "ts", "event_id", "event_type")
      val want = graft.queries.GovernQueries.scd2(whole)
      val served = StreamPipeline.scd2Serve(spark, s"$dir/dim", s"$dir/carry")
        .select(want.columns.map(org.apache.spark.sql.functions.col): _*)
      assert(served.count() == 4L)
      assert(served.exceptAll(want).isEmpty && want.exceptAll(served).isEmpty,
        "restarted RocksDB stream must serve exactly the declared batch q220")
      val got = served.collect().map(r => (r.getAs[Long]("user_id"),
        r.getAs[Long]("version")) -> r).toMap
      assert(!got((1L, 2L)).isNullAt(got((1L, 2L)).fieldIndex("valid_to")),
        "the pre-restart open interval must close from a post-restart event")
      assert(got((2L, 1L)).getAs[Boolean]("is_current"))
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
