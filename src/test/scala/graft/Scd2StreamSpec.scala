package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.queries.GovernQueries
import graft.streaming.StreamPipeline

/** scd2Maintain (leg 23): the closed-dim + open-carry pair must serve
  * q220's dimension BIT-IDENTICAL to a batch rebuild under any
  * event-time-ordered split — versions continuing across batches,
  * intervals closing across batch boundaries, untouched users
  * persisting — and replays must be no-ops.
  */
class Scd2StreamSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def declared() =
    GovernQueries.scd2(graft.core.Tables.events(spark, dir))
      .collect().map(_.toSeq).toSet

  private def runSplit(chunks: Int): Unit = {
    val ev = graft.core.Tables.events(spark, dir)
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .orderBy($"ts", $"event_id")
      .as[(Long, java.sql.Timestamp, Long, String)].collect().toSeq
    val base = Files.createTempDirectory(s"graft_scd2_$chunks").toString
    val (dim, carry) = (base + "/dim", base + "/carry")
    ev.grouped((ev.size + chunks - 1) / chunks).zipWithIndex.foreach { case (c, i) =>
      StreamPipeline.scd2Batch(
        c.toDF("user_id", "ts", "event_id", "event_type"), dim, carry, i.toLong)
    }
    val served = StreamPipeline.scd2Serve(spark, dim, carry)
      .collect().map(_.toSeq).toSet
    assert(served == declared(),
      s"$chunks-way split: served SCD2 dimension must equal declared q220 exactly")
  }

  test("4-way event-time split serves declared q220 exactly") { runSplit(4) }

  test("9-way event-time split serves declared q220 exactly") { runSplit(9) }

  test("intervals close across batch boundaries; versions continue; replay is a no-op") {
    val t0 = java.sql.Timestamp.valueOf("2024-07-01 10:00:00")
    def ts(min: Int) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    val base = Files.createTempDirectory("graft_scd2_span").toString
    val (dim, carry) = (base + "/dim", base + "/carry")
    // u1 flips state every event (one per batch); u2 holds one state
    // throughout; u3 appears only in batch 2.
    StreamPipeline.scd2Batch(Seq(
      (1L, ts(0), 1L, "view"), (2L, ts(0), 2L, "view")
    ).toDF("user_id", "ts", "event_id", "event_type"), dim, carry, 0L)
    StreamPipeline.scd2Batch(Seq(
      (1L, ts(10), 3L, "click"), (2L, ts(10), 4L, "view"),
      (3L, ts(10), 5L, "purchase")
    ).toDF("user_id", "ts", "event_id", "event_type"), dim, carry, 1L)
    StreamPipeline.scd2Batch(Seq(
      (1L, ts(20), 6L, "view")
    ).toDF("user_id", "ts", "event_id", "event_type"), dim, carry, 2L)
    val got = StreamPipeline.scd2Serve(spark, dim, carry)
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("version")) ->
        ((r.getAs[String]("state"), r.getAs[java.sql.Timestamp]("valid_from"),
          Option(r.getAs[java.sql.Timestamp]("valid_to")),
          r.getAs[Boolean]("is_current")))).toMap
    assert(got.size == 5)
    assert(got((1L, 1L)) == (("view", ts(0), Some(ts(10)), false)))
    assert(got((1L, 2L)) == (("click", ts(10), Some(ts(20)), false)))
    assert(got((1L, 3L)) == (("view", ts(20), None, true)))
    assert(got((2L, 1L)) == (("view", ts(0), None, true)), "no-change user keeps one open interval")
    assert(got((3L, 1L)) == (("purchase", ts(10), None, true)))
    // replaying the last batch must not duplicate intervals or bump versions
    StreamPipeline.scd2Batch(Seq(
      (1L, ts(20), 6L, "view")
    ).toDF("user_id", "ts", "event_id", "event_type"), dim, carry, 2L)
    val again = StreamPipeline.scd2Serve(spark, dim, carry).collect().map(_.toSeq).toSet
    assert(again.size == 5 && again == StreamPipeline.scd2Serve(spark, dim, carry)
      .collect().map(_.toSeq).toSet)
    assert(got.values.toSet == StreamPipeline.scd2Serve(spark, dim, carry)
      .collect().map(r => (r.getAs[String]("state"), r.getAs[java.sql.Timestamp]("valid_from"),
        Option(r.getAs[java.sql.Timestamp]("valid_to")), r.getAs[Boolean]("is_current"))).toSet)
  }

  test("serve: close-nothing batches (empty commit dirs) serve open-only; corruption and legacy stores fail loudly") {
    val t0 = java.sql.Timestamp.valueOf("2024-07-01 10:00:00")
    val base = Files.createTempDirectory("graft_scd2_fallback").toString
    val (dim, carry) = (base + "/dim", base + "/carry")
    // one single-event user: the dim commit is an EMPTY batch dir
    // (nothing closes), the carry holds the one open interval
    StreamPipeline.scd2Batch(Seq(
      (1L, t0, 1L, "view")
    ).toDF("user_id", "ts", "event_id", "event_type"), dim, carry, 0L)
    val served = StreamPipeline.scd2Serve(spark, dim, carry).collect()
    assert(served.length == 1 && served.head.getAs[Boolean]("is_current"),
      "a dim root of empty commit dirs must serve open-only, not fail")
    // a corrupted batch data file must PROPAGATE from the read — the
    // old Try(...).toOption would have silently served open-only with
    // every closed interval missing
    StreamPipeline.scd2Batch(Seq(
      (1L, new java.sql.Timestamp(t0.getTime + 60000L), 2L, "click")
    ).toDF("user_id", "ts", "event_id", "event_type"), dim, carry, 1L)
    val part = Files.list(java.nio.file.Paths.get(dim, "batch=1")).iterator()
    var corrupted = false
    while (part.hasNext) {
      val f = part.next()
      if (f.getFileName.toString.endsWith(".parquet")) {
        Files.write(f, "not parquet".getBytes); corrupted = true
      }
    }
    assert(corrupted)
    intercept[Exception] {
      StreamPipeline.scd2Serve(spark, dim, carry).collect()
    }
    // a legacy flat-layout store (root-level part files) is refused by
    // both the maintainer and the serve, with a migration hint
    val legacyBase = Files.createTempDirectory("graft_scd2_legacy").toString
    val (ldim, lcarry) = (legacyBase + "/dim", legacyBase + "/carry")
    Seq((9L, 1L, "view", t0, t0)).toDF(
      "user_id", "version", "state", "valid_from", "valid_to")
      .coalesce(1).write.parquet(ldim)
    val batch = Seq((9L, t0, 1L, "view")).toDF("user_id", "ts", "event_id", "event_type")
    val e1 = intercept[IllegalStateException] {
      StreamPipeline.scd2Batch(batch, ldim, lcarry, 0L)
    }
    assert(e1.getMessage.contains("legacy flat-layout"))
    Seq((9L, 1L, "view", t0)).toDF("user_id", "version", "state", "valid_from")
      .coalesce(1).write.parquet(lcarry)
    val e2 = intercept[IllegalStateException] {
      StreamPipeline.scd2Serve(spark, ldim, lcarry).collect()
    }
    assert(e2.getMessage.contains("legacy flat-layout"))
  }

  test("stale .tmpb_ staging dirs abandoned by a crash are swept on the next batch") {
    val t0 = java.sql.Timestamp.valueOf("2024-07-01 10:00:00")
    val base = Files.createTempDirectory("graft_scd2_sweep").toString
    val (dim, carry) = (base + "/dim", base + "/carry")
    Files.createDirectories(java.nio.file.Paths.get(s"$dim.tmpb_7"))
    Files.write(java.nio.file.Paths.get(s"$dim.tmpb_7/part-junk.parquet"), "x".getBytes)
    StreamPipeline.scd2Batch(Seq(
      (1L, t0, 1L, "view")
    ).toDF("user_id", "ts", "event_id", "event_type"), dim, carry, 0L)
    assert(!Files.exists(java.nio.file.Paths.get(s"$dim.tmpb_7")),
      "abandoned staging dir must be swept")
    assert(StreamPipeline.scd2Serve(spark, dim, carry).count() == 1L)
  }

  test("event-time regressions against the carry are counted, not silent") {
    val t0 = java.sql.Timestamp.valueOf("2024-07-01 10:00:00")
    def ts(min: Int) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    val base = Files.createTempDirectory("graft_scd2_late").toString
    val (dim, carry) = (base + "/dim", base + "/carry")
    StreamPipeline.scd2Batch(Seq(
      (1L, ts(10), 1L, "view")
    ).toDF("user_id", "ts", "event_id", "event_type"), dim, carry, 0L)
    val before = StreamPipeline.lateScd2Rows.get()
    // equal ts, SMALLER event_id: the full-sort-key regression the
    // ts-only check missed (the round-10 advisory)
    StreamPipeline.scd2Batch(Seq(
      (1L, ts(10), 0L, "click")
    ).toDF("user_id", "ts", "event_id", "event_type"), dim, carry, 1L)
    assert(StreamPipeline.lateScd2Rows.get() == before + 1)
  }
}
