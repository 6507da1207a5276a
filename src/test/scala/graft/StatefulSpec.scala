package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.{Skew, SlidingWindows}
import graft.streaming.{Ingest, RunningExtrema, StreamPipeline}

class StatefulSpec extends SparkSpec {
  import spark.implicits._

  test("mapGroupsWithState running extrema: state carries across batches, resets on day rollover") {
    val stream = MemoryStream[RawTick](spark)
    val out = RunningExtrema.stream(spark, Ingest.clean(stream.toDF()))
    val q = out.toDF().writeStream.outputMode("update").format("memory").queryName("extrema").start()
    try {
      def tick(p: Double, t: String) = RawTick("AAPL", p, 0, "0%", "1", 0, 0, t)
      stream.addData(Seq(tick(10.0, "2024-01-01T10:00:00"), tick(8.0, "2024-01-01T11:00:00")))
      q.processAllAvailable()
      stream.addData(Seq(tick(15.0, "2024-01-01T12:00:00")))
      q.processAllAvailable()
      val d1 = spark.table("extrema").filter($"day" === "2024-01-01")
        .orderBy($"today_high".desc).head()
      assert(d1.getAs[Double]("today_low") == 8.0 && d1.getAs[Double]("today_high") == 15.0,
        "state must carry the day's low across micro-batches")
      // next day resets
      stream.addData(Seq(tick(100.0, "2024-01-02T09:00:00")))
      q.processAllAvailable()
      val d2 = spark.table("extrema").filter($"day" === "2024-01-02").head()
      assert(d2.getAs[Double]("today_low") == 100.0 && d2.getAs[Double]("today_high") == 100.0)
    } finally q.stop()
  }

  test("observe() ingest metrics surface in streaming progress") {
    val stream = MemoryStream[RawTick](spark)
    val dir = java.nio.file.Files.createTempDirectory("graft_obs").toString
    val q = StreamPipeline.run(Ingest.clean(stream.toDF()), s"$dir/buckets", s"$dir/ckpt",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      stream.addData(Seq(RawTick("A", 1.0, 0, "0%", "7", 0, 0, "2024-01-01T00:00:00")))
      q.processAllAvailable()
      val metrics = q.recentProgress.flatMap(p => Option(p.observedMetrics.get("graft_ingest")))
      assert(metrics.nonEmpty, "observed metrics must appear in progress")
      assert(metrics.map(_.getAs[Long]("rows")).sum == 1L)
      assert(metrics.flatMap(r => Option(r.getAs[Long]("volume"))).sum == 7L)
    } finally q.stop()
  }

  test("late-row side-output split") {
    val cleaned = Ingest.clean(Seq(
      RawTick("A", 1.0, 0, "0%", "1", 0, 0, "2024-01-01T00:10:00"),
      RawTick("A", 2.0, 0, "0%", "1", 0, 0, "2024-01-01T00:00:30")
    ).toDF())
    val wm = java.sql.Timestamp.from(java.time.Instant.parse("2024-01-01T00:05:00Z"))
    val (onTime, late) = StreamPipeline.splitLate(cleaned, wm)
    assert(onTime.count() == 1 && late.count() == 1)
    assert(late.head().getAs[Double]("price") == 2.0)
  }

  test("windowed min/max behind the A4 flag") {
    val e = Seq(("X", java.sql.Timestamp.valueOf("2024-01-01 00:07:00"), 5.0),
      ("X", java.sql.Timestamp.valueOf("2024-01-01 00:08:00"), 9.0)).toDF("sym", "ts", "v")
    val m = SlidingWindows.metrics(e, col("sym"), "sym", col("ts"), col("v"),
      "15 minutes", "5 minutes", "_x", includeMinMax = true)
    val r = m.head()
    assert(r.getAs[Double]("min_value_x") == 5.0 && r.getAs[Double]("max_value_x") == 9.0)
  }

  test("salted aggregation equals direct aggregation") {
    val e = graft.core.Tables.events(spark, sf())
    val direct = e.groupBy($"event_type").agg(count(lit(1)).as("n"),
        sum($"value".cast("decimal(18,2)")).as("sv"))
      .select($"event_type", $"n", $"sv".cast("double").as("sv"))
    val salted = Skew.saltedAgg(e, Seq("event_type"), col("event_id"), saltBuckets = 16,
        Map("sv" -> col("value").cast("decimal(18,2)")))
      .select($"event_type", $"n", $"sv".cast("double").as("sv"))
    assert(direct.exceptAll(salted).isEmpty && salted.exceptAll(direct).isEmpty)
  }
}
