package graft

import java.nio.file.Files

import org.apache.spark.sql.types._

import graft.streaming.StreamPipeline

/** psiMaintain under the RocksDB state-store provider with a real
  * stop/restart — the REGISTER/GRID store class (merge-by-addition)
  * run in the 100 TB state-store configuration. The per-user carry
  * classes (transitions, bots, SCD2) have restart pins; this is the
  * class most sensitive to a lost or double-counted increment on
  * restart: an additive grid silently drifts if a replayed batch
  * folds twice or a crashed batch never folds. The feed splits one
  * logical day-grid across the restart (early-half day before, late-
  * half day after), so the drift statistic itself only becomes
  * nonzero if the post-restart fold lands exactly once. Expected:
  * the served PSI equals the declared batch q229 over the whole feed
  * bitwise, and the grid's total count equals the event count. */
class PsiRocksSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("event_type", StringType), StructField("ts", TimestampType),
    StructField("value", DoubleType)))

  test("RocksDB provider + restart: served PSI equals batch q229, additive grid folds exactly once") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val srcDir = Files.createTempDirectory("graft_rocks_psi_src").toString
    val dir = Files.createTempDirectory("graft_rocks_psi").toString
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 09:00:00")
    def iso(day: Int, sec: Int) =
      new java.sql.Timestamp(t0.getTime + (day * 86400L + sec) * 1000L)
        .toInstant.toString.stripSuffix("Z")
    def writeBatch(name: String, rows: Seq[(String, Int, Int, Double)]): Unit = {
      val lines = rows.map { case (t, d, s, v) =>
        s"""{"event_type":"$t","ts":"${iso(d, s)}","value":$v}"""
      }
      Files.write(java.nio.file.Paths.get(srcDir, name), lines.mkString("\n").getBytes)
    }
    def startQuery() = StreamPipeline.psiMaintain(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").json(srcDir),
      s"$dir/grid", s"$dir/ckpt",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    // day 0 = early half, day 1 = late half; the late half arrives
    // only AFTER the restart, and view's distribution shifts bands
    // (1.5 -> 12.0) while click's stays put — the drift readout
    // depends on both halves' exact counts.
    val b0 = Seq(
      ("view", 0, 0, 1.5), ("view", 0, 60, 1.6), ("view", 0, 120, 1.5),
      ("click", 0, 30, 4.0), ("click", 0, 90, 4.2),
      ("view", 0, 180, -2.0)) // non-positive pools in band -999
    val b1 = Seq(
      ("view", 1, 0, 12.0), ("view", 1, 60, 11.5), ("view", 1, 120, 12.5),
      ("click", 1, 30, 4.1), ("click", 1, 90, 4.0))
    try {
      writeBatch("b0.json", b0)
      val q1 = startQuery()
      try q1.processAllAvailable() finally q1.stop()
      writeBatch("b1.json", b1)
      val q2 = startQuery()
      try q2.processAllAvailable() finally q2.stop()
      import spark.implicits._
      val whole = (b0 ++ b1).map { case (t, d, s, v) =>
        (t, new java.sql.Timestamp(t0.getTime + (d * 86400L + s) * 1000L), v)
      }.toDF("event_type", "ts", "value")
        .select(org.apache.spark.sql.functions.col("event_type"),
          org.apache.spark.sql.functions.to_date(
            org.apache.spark.sql.functions.col("ts")).as("day"),
          org.apache.spark.sql.functions.col("value"))
      val want = graft.queries.AuditQueries.psiDrift(whole)
      val served = StreamPipeline.psiServe(spark, s"$dir/grid")
        .select(want.columns.map(org.apache.spark.sql.functions.col): _*)
      assert(served.count() == 2L)
      assert(served.exceptAll(want).isEmpty && want.exceptAll(served).isEmpty,
        "restarted RocksDB stream must serve exactly the declared batch q229")
      // additive exactness: a double-fold or lost fold shows here even
      // when the smoothed PSI rounds identically
      val total = spark.read.parquet(s"$dir/grid")
        .agg(org.apache.spark.sql.functions.sum("x")).head().getLong(0)
      assert(total == (b0.size + b1.size).toLong,
        s"grid total $total must equal event count ${b0.size + b1.size}")
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
