package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.streaming.StreamPipeline

/** basketMaintain (leg 27) under a REAL stop/restart and under torn
  * writes at every crash point of the marker + atomic-swap protocol —
  * the counting-cell analogue of Scd2StreamSpec/Scd2RocksSpec. The
  * additive grid's failure mode is DOUBLE-COUNTING (a replayed batch
  * adding its cells twice inflates supports and flips lift ranks
  * silently), so each test pins the post-recovery grid bitwise
  * against a cleanly-built one.
  */
class BasketRestartSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("l_orderkey", LongType), StructField("l_partkey", LongType)))

  /** Orders 1..8 over a 4-part vocabulary, order-complete per file. */
  private val feedA = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 12L),
    (3L, 10L), (3L, 11L), (4L, 11L), (4L, 12L))
  private val feedB = Seq((5L, 10L), (5L, 11L), (6L, 10L), (6L, 13L),
    (7L, 11L), (7L, 13L), (8L, 10L), (8L, 11L))

  private def grid(p: String) = spark.read.parquet(p)
    .select(col("ka"), col("kb"), col("cnt")).collect().map(_.toSeq).toSet

  test("real stop/restart between micro-batches: serve equals the whole-feed batch rules") {
    val srcDir = Files.createTempDirectory("graft_basket_src").toString
    val dir = Files.createTempDirectory("graft_basket_rs").toString
    def writeFile(name: String, rows: Seq[(Long, Long)]): Unit =
      Files.write(java.nio.file.Paths.get(srcDir, name),
        rows.map { case (o, p) => s"""{"l_orderkey":$o,"l_partkey":$p}""" }
          .mkString("\n").getBytes)
    def startQuery() = StreamPipeline.basketMaintain(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").json(srcDir),
      s"$dir/cells", s"$dir/ckpt",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    writeFile("a.json", feedA)
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()
    writeFile("b.json", feedB)
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()
    val whole = (feedA ++ feedB).toDF("l_orderkey", "l_partkey")
    val want = graft.queries.InsightQueries
      .basketRules(whole, minItem = 2L, minPair = 1L)
      .collect().map(_.toSeq).toSet
    val served = graft.queries.InsightQueries.rulesFromCells(
      spark.read.parquet(s"$dir/cells").select(col("ka"), col("kb"), col("cnt")),
      minItem = 2L, minPair = 1L)
      .collect().map(_.toSeq).toSet
    assert(served == want,
      "restarted maintainer must serve the whole-feed batch rules bitwise")
  }

  test("torn writes at every crash point: recovery never double-counts a cell") {
    val hconf = spark.sparkContext.hadoopConfiguration
    def fs(p: String) = new org.apache.hadoop.fs.Path(p).getFileSystem(hconf)
    def pathOf(p: String) = new org.apache.hadoop.fs.Path(p)
    val dfA = feedA.toDF("l_orderkey", "l_partkey")
    val dfB = feedB.toDF("l_orderkey", "l_partkey")

    // the clean two-batch grid every recovery must reproduce
    val cleanP = Files.createTempDirectory("graft_basket_clean").toString + "/cells"
    StreamPipeline.basketBatch(dfA, cleanP, 0L)
    StreamPipeline.basketBatch(dfB, cleanP, 1L)
    val clean = grid(cleanP)

    // crash point 1: batch 1's staging dir fully written (marker
    // included) but the swap never ran — foreachBatch replays batch 1,
    // which must rebuild staging from the UNSWAPPED live grid, not
    // trust the leftover, and must not add batch 1 twice.
    val p1 = Files.createTempDirectory("graft_basket_t1").toString + "/cells"
    StreamPipeline.basketBatch(dfA, p1, 0L)
    StreamPipeline.basketBatch(dfB, p1 + ".torn", 1L) // stand-in staging content
    assert(fs(p1).rename(pathOf(p1 + ".torn"), pathOf(p1 + ".tmp")))
    StreamPipeline.basketBatch(dfB, p1, 1L)
    assert(grid(p1) == clean, "pre-swap torn staging must not double-count")

    // crash point 2: mid-swap — live moved to .old, staging not yet
    // renamed in. heal() must restore .old before the replay merges.
    val p2 = Files.createTempDirectory("graft_basket_t2").toString + "/cells"
    StreamPipeline.basketBatch(dfA, p2, 0L)
    assert(fs(p2).rename(pathOf(p2), pathOf(p2 + ".old")))
    StreamPipeline.basketBatch(dfB, p2, 1L)
    assert(grid(p2) == clean, "mid-swap crash must heal then merge exactly once")

    // crash point 3: swap committed, checkpoint not — foreachBatch
    // replays batch 1 against a grid that already holds it; the
    // marker must make the replay a byte-for-byte no-op.
    val p3 = Files.createTempDirectory("graft_basket_t3").toString + "/cells"
    StreamPipeline.basketBatch(dfA, p3, 0L)
    StreamPipeline.basketBatch(dfB, p3, 1L)
    StreamPipeline.basketBatch(dfB, p3, 1L)
    assert(grid(p3) == clean, "post-swap replay must be a no-op")
  }
}
