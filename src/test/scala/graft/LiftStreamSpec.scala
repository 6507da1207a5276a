package graft

import java.nio.file.Files

import graft.streaming.StreamPipeline

/** liftMaintain: served support/lift must equal declared q190 EXACTLY
  * after any event-time-ordered split — closed sessions' type sets
  * are final, open sessions' sets ride the carry, and a session
  * spanning batches unions its set across them. */
class LiftStreamSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def served(d: String) =
    StreamPipeline.liftServe(spark, s"$d/counts", s"$d/carry")
      .collect().map(_.toSeq).toSet

  private def declared() =
    SparkEntry.queries("q190_session_lift")(spark, dir).collect().map(_.toSeq).toSet

  private def runSplit(chunks: Int): Unit = {
    val ev = graft.core.Tables.events(spark, dir)
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .orderBy($"ts", $"event_id")
      .as[(Long, java.sql.Timestamp, Long, String)].collect().toSeq
    val d = Files.createTempDirectory(s"graft_lift$chunks").toString
    ev.grouped((ev.size + chunks - 1) / chunks).zipWithIndex.foreach { case (c, i) =>
      StreamPipeline.liftBatch(c.toDF("user_id", "ts", "event_id", "event_type"),
        s"$d/counts", s"$d/carry", i.toLong)
    }
    assert(served(d) == declared(),
      s"$chunks-way split: served lift must equal declared q190 exactly")
  }

  test("4-way event-time split serves declared q190 exactly") { runSplit(4) }

  test("6-way event-time split serves declared q190 exactly") { runSplit(6) }

  test("a session's type set unions across batches; closed sets are final") {
    val t0 = java.sql.Timestamp.valueOf("2024-08-01 09:00:00")
    def ts(min: Int) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    val d = Files.createTempDirectory("graft_lift_u").toString
    // u1 session 1: view (batch 1) + click (batch 2, 20-min gap) —
    // the (view, click) pair must exist exactly once after the
    // session closes in batch 3 (40-min gap starts session 2).
    StreamPipeline.liftBatch(Seq((1L, ts(0), 1L, "view"))
      .toDF("user_id", "ts", "event_id", "event_type"), s"$d/counts", s"$d/carry", 0L)
    StreamPipeline.liftBatch(Seq((1L, ts(20), 2L, "click"))
      .toDF("user_id", "ts", "event_id", "event_type"), s"$d/counts", s"$d/carry", 1L)
    val mid = StreamPipeline.liftServe(spark, s"$d/counts", s"$d/carry").collect()
      .map(r => (r.getAs[String]("type_a"), r.getAs[String]("type_b")) ->
        (r.getAs[Long]("n_both"), r.getAs[Double]("lift"))).toMap
    assert(mid(("click", "view")) == ((1L, 1.0)), s"open-session pair served: $mid")
    StreamPipeline.liftBatch(Seq((1L, ts(61), 3L, "error"))
      .toDF("user_id", "ts", "event_id", "event_type"), s"$d/counts", s"$d/carry", 2L)
    // now the (click, view) pair is PERMANENT and n_sessions = 2
    val perm = spark.read.parquet(s"$d/counts")
      .filter($"kind" === "pair").collect()
      .map(r => (r.getString(1), r.getString(2)) -> r.getAs[Long]("n")).toMap
    assert(perm == Map(("click", "view") -> 1L), s"perm pairs: $perm")
    val fin = StreamPipeline.liftServe(spark, s"$d/counts", s"$d/carry").collect()
      .map(r => (r.getAs[String]("type_a"), r.getAs[String]("type_b")) ->
        (r.getAs[Long]("n_both"), r.getAs[Double]("support"))).toMap
    assert(fin(("click", "view")) == ((1L, 0.5)), "support halves once session 2 opens")
    // replay no-op
    val bc = spark.read.parquet(s"$d/counts").collect().toSet
    StreamPipeline.liftBatch(Seq((1L, ts(61), 3L, "error"))
      .toDF("user_id", "ts", "event_id", "event_type"), s"$d/counts", s"$d/carry", 2L)
    assert(spark.read.parquet(s"$d/counts").collect().toSet == bc)
  }
}
