package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.streaming.StreamPipeline

/** closesMaintain under `RocksDBStateStoreProvider` with a real
  * stop/restart — the last unpinned cell of the (store class ×
  * provider) matrix (round-14 Next #7; counting-cell × RocksDB landed
  * as BasketRocksSpec last round).
  *
  * NOTE the pin's scope, honestly (the BasketRocksSpec note applies
  * verbatim): closesMaintain is a pure foreachBatch maintainer — its
  * streaming plan has NO stateful operator, so Spark never allocates
  * a state store for it and the provider conf is inert for this class
  * BY CONSTRUCTION. Its durable state is the on-disk max-merge
  * parquet store + the batch-marker/atomic-swap protocol
  * (ClosesRestartSpec pins those under the default provider). What
  * this spec pins is that the claim is TRUE AT RUNTIME: under the
  * RocksDB provider conf, exactly-once folds across a restart still
  * hold and the diagnostics serves still equal their declared batch
  * queries bitwise — i.e. the provider really is out of the loop for
  * the max-merge class too, not silently load-bearing.
  */
class ClosesRocksSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("event_type", StringType), StructField("ts", TimestampType),
    StructField("event_id", LongType), StructField("value", DoubleType)))

  test("RocksDB provider + restart: closes store folds exactly once; serves == declared batch") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val srcDir = Files.createTempDirectory("graft_cl_rocks_src").toString
      val dir = Files.createTempDirectory("graft_cl_rocks").toString
      val t0 = java.sql.Timestamp.valueOf("2024-06-01 09:00:00")
      def ts(day: Int, sec: Int) = new java.sql.Timestamp(t0.getTime + (day * 86400L + sec) * 1000L)
      def iso(day: Int, sec: Int) = ts(day, sec).toInstant.toString.stripSuffix("Z")
      // the ClosesRestartSpec feed shape: two instruments, two ticks
      // per day (the later tick must win the close across the restart)
      def rows(days: Range) = days.flatMap { d =>
        Seq(
          ("alpha", d, 100, d * 2L, 100.0 + d + 0.25 * (d % 4)),
          ("alpha", d, 200, d * 2L + 1L, 100.5 + d + 0.3 * ((d + 1) % 3)),
          ("beta", d, 100, 100000L + d * 2L, 50.0 + 3.0 * (d % 2)),
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
          s"$what: served must equal declared batch bitwise under RocksDB")
      }
      val cl = graft.operators.DailyCloses.closes(graft.operators.DailyCloses.state(whole))
      val rets = graft.queries.MarketQueries.returnsFromCloses(cl)
      // one serve per diagnostics family: store-shape (pettitt), the
      // day-grid fold class (kpss), and the return-grid class (runs)
      bit(StreamPipeline.pettittServe(spark, s"$dir/closes"),
        graft.queries.MarketQueries.pettitt(cl), "pettittServe")
      bit(StreamPipeline.kpssServe(spark, s"$dir/closes"),
        graft.queries.MarketQueries.kpss(cl), "kpssServe")
      bit(StreamPipeline.runsServe(spark, s"$dir/closes"),
        graft.queries.MarketQueries.runsTest(rets), "runsServe")
      // exactly-once fold evidence independent of the closings
      val store = spark.read.parquet(s"$dir/closes")
      assert(store.groupBy(col("event_type"), col("day")).count()
        .filter(col("count") > 1).isEmpty, "one row per (instrument, day)")
      assert(store.count() == 80L, "40 days x 2 instruments")
      val want = graft.operators.DailyCloses.state(whole)
      assert(store.select(want.columns.map(col): _*).exceptAll(want).isEmpty &&
        want.exceptAll(store.select(want.columns.map(col): _*)).isEmpty,
        "restarted store must equal the batch state exactly (later tick wins)")
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
