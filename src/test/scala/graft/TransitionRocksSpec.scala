package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.streaming.StreamPipeline

/** transitionMaintain under the RocksDB state-store provider with a
  * real stop/restart — the 100 TB configuration for the stateful
  * maintainers. The maintainer's own state lives in its parquet
  * stores (foreachBatch), so what RocksDB governs here is the
  * engine-side streaming state (offset/commit tracking and any future
  * stateful upstream); the spec proves the maintainer is
  * provider-agnostic and exactly-once across a restart on a
  * replayable (file) source: no loss, no double-count, counts equal
  * the batch rebuild over the full feed. */
class TransitionRocksSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("user_id", LongType), StructField("ts", TimestampType),
    StructField("event_id", LongType), StructField("event_type", StringType)))

  test("RocksDB provider + restart: maintained counts equal batch q185 over the feed") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val srcDir = Files.createTempDirectory("graft_rocks_src").toString
    val dir = Files.createTempDirectory("graft_rocks_tm").toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def iso(min: Int) = new java.sql.Timestamp(t0.getTime + min * 60000L)
      .toInstant.toString.stripSuffix("Z")
    def writeBatch(name: String, rows: Seq[(Long, Int, Long, String)]): Unit = {
      val lines = rows.map { case (u, m, id, t) =>
        s"""{"user_id":$u,"ts":"${iso(m)}","event_id":$id,"event_type":"$t"}"""
      }
      Files.write(java.nio.file.Paths.get(srcDir, name), lines.mkString("\n").getBytes)
    }
    def startQuery() = StreamPipeline.transitionMaintain(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").json(srcDir),
      s"$dir/counts", s"$dir/carry", s"$dir/ckpt",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    val b1 = Seq((1L, 0, 1L, "view"), (1L, 2, 2L, "click"), (2L, 0, 3L, "view"))
    val b2 = Seq((1L, 4, 4L, "purchase"), (2L, 50, 5L, "click"), (2L, 52, 6L, "view"))
    try {
      writeBatch("b0.json", b1)
      val q1 = startQuery()
      try q1.processAllAvailable() finally q1.stop()
      // restart with the same checkpoint after more data lands
      writeBatch("b1.json", b2)
      val q2 = startQuery()
      try q2.processAllAvailable() finally q2.stop()
      val got = spark.read.parquet(s"$dir/counts").collect()
        .map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type")) ->
          r.getAs[Long]("n_trans")).toMap
      import spark.implicits._
      val whole = (b1 ++ b2).map { case (u, m, id, t) => (u, iso(m) + "Z", id, t) }
        .toDF("user_id", "ts_s", "event_id", "event_type")
        .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
      val want = graft.operators.Transitions.counts(whole).collect()
        .map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type")) ->
          r.getAs[Long]("n_trans")).toMap
      assert(got == want, s"got $got want $want")
      assert(got.values.sum == 3L, "view->click, click->purchase, click->view")
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
