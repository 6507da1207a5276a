package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.queries.BehaviorQueries
import graft.streaming.StreamPipeline

/** attributionMaintain: served removal-effect attribution must equal
  * declared q196 EXACTLY after any event-time-ordered batch split —
  * the permanent edge stores are append-only (closed-session ENDs
  * only), the open session's END stays provisional in the carry, and
  * session gap boundaries anchor on the last ANY event (a truncated
  * post-purchase event still extends its session). */
class AttributionStreamSpec extends SparkSpec {
  import spark.implicits._

  private def sf() = "/root/testdata/sf0.001"

  private def attrSet(df: DataFrame) = df.collect().map(_.toSeq).toSet

  private def feed(dir: String, batches: Seq[Seq[(Long, java.sql.Timestamp, Long, String)]]): Unit =
    batches.zipWithIndex.foreach { case (b, i) =>
      StreamPipeline.attributionBatch(
        b.toDF("user_id", "ts", "event_id", "event_type"),
        s"$dir/counts", s"$dir/carry", i.toLong)
    }

  private def runSplit(chunks: Int): Unit = {
    val ev = graft.core.Tables.events(spark, sf())
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .orderBy($"ts", $"event_id")
      .as[(Long, java.sql.Timestamp, Long, String)].collect().toSeq
    val dir = Files.createTempDirectory(s"graft_attr$chunks").toString
    val s = MemoryStream[(Long, java.sql.Timestamp, Long, String)](spark)
    val q = StreamPipeline.attributionMaintain(
      s.toDF().toDF("user_id", "ts", "event_id", "event_type"),
      s"$dir/counts", s"$dir/carry", s"$dir/ckpt",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      ev.grouped((ev.size + chunks - 1) / chunks).foreach { c =>
        s.addData(c); q.processAllAvailable()
      }
      val served = attrSet(StreamPipeline.attributionServe(spark, s"$dir/counts", s"$dir/carry"))
      val batch = attrSet(SparkEntry.queries("q196_markov_attribution")(spark, sf()))
      assert(served == batch,
        s"$chunks-way split: served attribution must equal declared q196 exactly")
    } finally q.stop()
  }

  test("3-way event-time split serves declared q196 exactly") { runSplit(3) }

  test("9-way event-time split serves declared q196 exactly") { runSplit(9) }

  test("truncated post-purchase event still anchors its session's gap boundary") {
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 12:00:00")
    def ts(min: Int) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    // u1: view@0 -> purchase@1 -> error@29 | batch 2: click@58.
    // error->click gap is 29 min < 30, so the click CONTINUES the
    // converted session (truncated, contributes nothing). A carry
    // that kept only the last KEPT event (the purchase@1) would see a
    // 57-min gap and invent a new session (a spurious START->click).
    // u2 exists so the matrix has a non-converting state.
    val b1 = Seq((1L, ts(0), 1L, "view"), (1L, ts(1), 2L, "purchase"), (1L, ts(29), 3L, "error"),
      (2L, ts(0), 4L, "view"))
    val b2 = Seq((1L, ts(58), 5L, "click"))
    val dir = Files.createTempDirectory("graft_attr_tp").toString
    feed(dir, Seq(b1, b2))
    val served = attrSet(StreamPipeline.attributionServe(spark, s"$dir/counts", s"$dir/carry"))
    val union = (b1 ++ b2).toDF("user_id", "ts", "event_id", "event_type")
    val batch = attrSet(BehaviorQueries.markovAttribution(spark, union))
    assert(served == batch, "continuation through a truncated event must not fork a session")
    // and the spurious-session shape really would differ: no START edge
    // from 'click' may exist in the permanent counts
    val starts = spark.read.parquet(s"$dir/counts")
      .filter($"f" === "START" && $"t2" === "click").count()
    assert(starts == 0L, "no spurious START->click from the post-purchase continuation")
  }

  test("closed-session END is permanent exactly once; open END stays provisional") {
    val t0 = java.sql.Timestamp.valueOf("2024-06-02 08:00:00")
    def ts(min: Int) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    // u2 converts so the solve has a non-degenerate pF
    val b1 = Seq((1L, ts(0), 1L, "view"), (2L, ts(0), 9L, "view"), (2L, ts(1), 10L, "purchase"))
    val b2 = Seq((1L, ts(100), 2L, "view"))   // closes u1 session 1 -> END(view) permanent
    val b3 = Seq((1L, ts(101), 3L, "error"))  // extends session 2 -> provisional END moves to error
    val dir = Files.createTempDirectory("graft_attr_end").toString
    feed(dir, Seq(b1, b2))
    val counts2 = spark.read.parquet(s"$dir/counts")
      .filter($"f" === "view" && $"t2" === "NULL").select($"n").as[Long].collect()
    assert(counts2.toSeq == Seq(1L), "exactly one PERMANENT view->NULL after the close")
    StreamPipeline.attributionBatch(
      b3.toDF("user_id", "ts", "event_id", "event_type"), s"$dir/counts", s"$dir/carry", 2L)
    val served = attrSet(StreamPipeline.attributionServe(spark, s"$dir/counts", s"$dir/carry"))
    val union = (b1 ++ b2 ++ b3).toDF("user_id", "ts", "event_id", "event_type")
    assert(served == attrSet(BehaviorQueries.markovAttribution(spark, union)))
    // replaying the latest batch is a no-op on both stores
    val bc = spark.read.parquet(s"$dir/counts").collect().toSet
    val bk = spark.read.parquet(s"$dir/carry").collect().toSet
    StreamPipeline.attributionBatch(
      b3.toDF("user_id", "ts", "event_id", "event_type"), s"$dir/counts", s"$dir/carry", 2L)
    assert(spark.read.parquet(s"$dir/counts").collect().toSet == bc)
    assert(spark.read.parquet(s"$dir/carry").collect().toSet == bk)
  }
}
