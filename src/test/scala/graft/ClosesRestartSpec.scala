package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.streaming.StreamPipeline

/** closesMaintain as a REAL streaming query with a stop/restart in the
  * middle of the feed (the PsiRocksSpec motion for the max-merge
  * store class): the first query generation folds half the days, is
  * stopped, and a NEW query on the SAME checkpoint folds the rest.
  * The batch-marker + idempotent-max protocol must give exactly-once
  * folds across the restart, and the round-13 diagnostics serves
  * (Jarque-Bera, runs, Mann-Kendall, Hurst) plus a forecast-ladder
  * serve must all equal their declared batch queries BITWISE over the
  * whole feed — the closes store is ONE store with many closings, so
  * a single lost or doubled fold would poison every serve at once. */
class ClosesRestartSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("event_type", StringType), StructField("ts", TimestampType),
    StructField("event_id", LongType), StructField("value", DoubleType)))

  test("real stop/restart: closes store folds exactly once; all diagnostics serves == declared batch") {
    val srcDir = Files.createTempDirectory("graft_cl_restart_src").toString
    val dir = Files.createTempDirectory("graft_cl_restart").toString
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 09:00:00")
    def ts(day: Int, sec: Int) = new java.sql.Timestamp(t0.getTime + (day * 86400L + sec) * 1000L)
    def iso(day: Int, sec: Int) = ts(day, sec).toInstant.toString.stripSuffix("Z")
    // two instruments over 40 days (enough for the Hurst block sizes
    // and a defined runs/MK grid), two ticks per day — the SECOND
    // tick must win the close (the max-by tie-break crosses the
    // restart boundary on day 19/20)
    def rows(days: Range) = days.flatMap { d =>
      Seq(
        ("alpha", d, 100, d * 2L, 100.0 + d + 0.25 * (d % 4)),       // trending
        ("alpha", d, 200, d * 2L + 1L, 100.5 + d + 0.3 * ((d + 1) % 3)),
        ("beta", d, 100, 100000L + d * 2L, 50.0 + 3.0 * (d % 2)),    // alternating
        ("beta", d, 200, 100000L + d * 2L + 1L, 50.0 + 2.5 * ((d + 1) % 2)))
    }
    def writeBatch(name: String, days: Range): Unit = {
      val lines = rows(days).map { case (t, d, s, id, v) =>
        s"""{"event_type":"$t","ts":"${iso(d, s)}","event_id":$id,"value":$v}"""
      }
      Files.write(java.nio.file.Paths.get(srcDir, name), lines.mkString("\n").getBytes)
    }
    def startQuery() = StreamPipeline.closesMaintain(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").json(srcDir),
      s"$dir/closes", s"$dir/ckpt",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))

    writeBatch("b0.json", 0 until 20)
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()
    writeBatch("b1.json", 20 until 40)
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()

    import spark.implicits._
    val whole = rows(0 until 40)
      .map { case (t, d, s, id, v) => (t, ts(d, s), id, v) }
      .toDF("event_type", "ts", "event_id", "value")
    def bit(served: org.apache.spark.sql.DataFrame,
            want: org.apache.spark.sql.DataFrame, what: String): Unit = {
      val s2 = served.select(want.columns.map(col): _*)
      assert(want.count() > 0 && s2.count() == want.count(), s"$what: row count")
      assert(s2.exceptAll(want).isEmpty && want.exceptAll(s2).isEmpty,
        s"$what: served must equal declared batch bitwise across the restart")
    }
    val cl = graft.operators.DailyCloses.closes(graft.operators.DailyCloses.state(whole))
    val rets = graft.queries.MarketQueries.returnsFromCloses(cl)
    bit(StreamPipeline.jbServe(spark, s"$dir/closes"),
      graft.queries.MarketQueries.jarqueBera(rets), "jbServe")
    bit(StreamPipeline.runsServe(spark, s"$dir/closes"),
      graft.queries.MarketQueries.runsTest(rets), "runsServe")
    bit(StreamPipeline.mannKendallServe(spark, s"$dir/closes"),
      graft.queries.MarketQueries.mannKendall(cl), "mannKendallServe")
    bit(StreamPipeline.hurstServe(spark, s"$dir/closes"),
      graft.queries.MarketQueries.hurstRs(rets), "hurstServe")
    bit(StreamPipeline.pettittServe(spark, s"$dir/closes"),
      graft.queries.MarketQueries.pettitt(cl), "pettittServe")
    bit(StreamPipeline.vonNeumannServe(spark, s"$dir/closes"),
      graft.queries.MarketQueries.vonNeumann(rets), "vonNeumannServe")
    bit(StreamPipeline.turningPointsServe(spark, s"$dir/closes"),
      graft.queries.MarketQueries.turningPoints(cl), "turningPointsServe")
    bit(StreamPipeline.kpssServe(spark, s"$dir/closes"),
      graft.queries.MarketQueries.kpss(cl), "kpssServe")
    bit(StreamPipeline.dickeyFullerServe(spark, s"$dir/closes"),
      graft.queries.MarketQueries.dickeyFuller(cl), "dickeyFullerServe")
    // exactly-once fold evidence independent of the closings: one row
    // per (instrument, day), and the store equals the batch state
    val store = spark.read.parquet(s"$dir/closes")
    assert(store.groupBy(col("event_type"), col("day")).count()
      .filter(col("count") > 1).isEmpty, "one row per (instrument, day)")
    assert(store.count() == 80L, "40 days x 2 instruments")
    val want = graft.operators.DailyCloses.state(whole)
    assert(store.select(want.columns.map(col): _*).exceptAll(want).isEmpty &&
      want.exceptAll(store.select(want.columns.map(col): _*)).isEmpty,
      "restarted store must equal the batch state exactly (later tick wins)")
  }
}
