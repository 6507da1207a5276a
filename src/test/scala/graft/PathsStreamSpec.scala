package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.StreamPipeline

/** pathsMaintain: the maintained trigram count table must serve q204
  * bit-identical to a batch rebuild. The carry is the last TWO events
  * per user, so a trigram spanning a batch boundary (two carried rows
  * + one batch row, or one + two) is counted exactly once, and a gap
  * across the boundary cuts the path exactly as the batch query
  * does. */
class PathsStreamSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toSeq).toSet

  test("designed cross-batch trigrams: boundary-spanning counted once, gap cuts") {
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 09:00:00")
    def ts(min: Int) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    val p = Files.createTempDirectory("graft_paths").toString
    // batch 1: u1 view@0 click@1 (no trigram yet); u2 view@0 click@1
    StreamPipeline.pathsBatch(
      Seq((1L, ts(0), 1L, "view"), (1L, ts(1), 2L, "click"),
        (2L, ts(0), 3L, "view"), (2L, ts(1), 4L, "click"))
        .toDF("user_id", "ts", "event_id", "event_type"),
      s"$p/counts", s"$p/carry", 0L)
    // batch 2: u1 purchase@2 -> trigram (view, click, purchase) spans
    // the boundary, once; u2 purchase@45 -> 44-min gap: session cut,
    // NO trigram
    StreamPipeline.pathsBatch(
      Seq((1L, ts(2), 5L, "purchase"), (2L, ts(45), 6L, "purchase"))
        .toDF("user_id", "ts", "event_id", "event_type"),
      s"$p/counts", s"$p/carry", 1L)
    val got = spark.read.parquet(s"$p/counts").collect()
      .map(r => (r.getAs[String]("step1"), r.getAs[String]("step2"),
        r.getAs[String]("step3")) -> r.getAs[Long]("n_paths")).toMap
    assert(got == Map(("view", "click", "purchase") -> 1L), s"counts: $got")
    // replay batch 1 (marker gone after swap) must be a no-op on counts
    val before = spark.read.parquet(s"$p/counts").collect().toSet
    StreamPipeline.pathsBatch(
      Seq((1L, ts(2), 5L, "purchase"), (2L, ts(45), 6L, "purchase"))
        .toDF("user_id", "ts", "event_id", "event_type"),
      s"$p/counts", s"$p/carry", 1L)
    assert(spark.read.parquet(s"$p/counts").collect().toSet == before, "replay must no-op")
  }

  test("3-chunk and 7-chunk real-feed streams serve declared q204 bitwise") {
    val ev = graft.core.Tables.events(spark, dir)
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .orderBy($"ts", $"event_id")
      .as[(Long, java.sql.Timestamp, Long, String)].collect().toSeq
    val declared = rows(SparkEntry.queries("q204_session_paths")(spark, dir))
    for (chunks <- Seq(3, 7)) {
      val p = Files.createTempDirectory(s"graft_paths$chunks").toString
      ev.grouped((ev.size + chunks - 1) / chunks).zipWithIndex.foreach { case (c, i) =>
        StreamPipeline.pathsBatch(
          c.toDF("user_id", "ts", "event_id", "event_type"),
          s"$p/counts", s"$p/carry", i.toLong)
      }
      assert(rows(StreamPipeline.pathsServe(spark, s"$p/counts")) == declared,
        s"$chunks-chunk stream must serve the declared q204 exactly")
    }
  }
}
