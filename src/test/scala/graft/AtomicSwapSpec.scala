package graft

import java.nio.file.Files

import graft.batch.AtomicSwap

class AtomicSwapSpec extends SparkSpec {

  private def conf = spark.sparkContext.hadoopConfiguration
  private def mkDir(base: String, name: String, marker: String): String = {
    val d = new java.io.File(base, name)
    d.mkdirs()
    Files.writeString(new java.io.File(d, "data.txt").toPath, marker)
    d.getAbsolutePath
  }
  private def markerOf(path: String): String =
    Files.readString(new java.io.File(path, "data.txt").toPath)

  test("swap replaces live with tmp; old layout is cleaned up") {
    val base = Files.createTempDirectory("swap").toString
    val live = mkDir(base, "store", "OLD")
    val tmp = mkDir(base, "store.tmp", "NEW")
    AtomicSwap.swapInto(conf, tmp, live)
    assert(markerOf(live) == "NEW")
    assert(!new java.io.File(tmp).exists())
    assert(!new java.io.File(live + ".old").exists())
  }

  test("swap into an absent live path (first write)") {
    val base = Files.createTempDirectory("swap").toString
    val tmp = mkDir(base, "store.tmp", "NEW")
    val live = s"$base/store"
    AtomicSwap.swapInto(conf, tmp, live)
    assert(markerOf(live) == "NEW")
  }

  test("missing tmp throws and leaves live untouched") {
    val base = Files.createTempDirectory("swap").toString
    val live = mkDir(base, "store", "OLD")
    intercept[java.io.IOException] {
      AtomicSwap.swapInto(conf, s"$base/nope", live)
    }
    assert(markerOf(live) == "OLD")
  }

  test("crash healing: leftover .old restored when live vanished, dropped when live exists") {
    // crash between steps 1 and 2: only .old remains
    val base1 = Files.createTempDirectory("swap").toString
    mkDir(base1, "store.old", "SURVIVOR")
    val tmp1 = mkDir(base1, "store.tmp", "NEW")
    AtomicSwap.swapInto(conf, tmp1, s"$base1/store")
    // healed first (restored), then swapped: NEW wins, nothing lost mid-way
    assert(markerOf(s"$base1/store") == "NEW")
    // stale .old next to an intact live store is discarded
    val base2 = Files.createTempDirectory("swap").toString
    mkDir(base2, "store.old", "STALE")
    mkDir(base2, "store", "LIVE")
    val tmp2 = mkDir(base2, "store.tmp", "NEW")
    AtomicSwap.swapInto(conf, tmp2, s"$base2/store")
    assert(markerOf(s"$base2/store") == "NEW")
    assert(!new java.io.File(s"$base2/store.old").exists())
  }

  test("heal() restores a torn swap BEFORE a merger reads; maintainer keeps accumulated state") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // build a transition-counts store via two maintained batches
    val dir = Files.createTempDirectory("graft_heal_tm").toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def ts(min: Int) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    graft.streaming.StreamPipeline.transitionBatch(
      Seq((1L, ts(0), 1L, "view"), (1L, ts(1), 2L, "click"))
        .toDF("user_id", "ts", "event_id", "event_type"), s"$dir/c", s"$dir/k", 0L)
    // simulate a crash between AtomicSwap's live->old and tmp->live
    // renames: the live counts store vanishes, .old survives
    val fs = new org.apache.hadoop.fs.Path(s"$dir/c").getFileSystem(conf)
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$dir/c"),
      new org.apache.hadoop.fs.Path(s"$dir/c.old")))
    // the replayed/next batch must NOT plan "store absent -> batch-only":
    // heal runs first, so the view->click count survives the merge
    graft.streaming.StreamPipeline.transitionBatch(
      Seq((1L, ts(2), 3L, "purchase"))
        .toDF("user_id", "ts", "event_id", "event_type"), s"$dir/c", s"$dir/k", 1L)
    val got = spark.read.parquet(s"$dir/c").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n_trans")).toMap
    assert(got == Map(("view", "click") -> 1L, ("click", "purchase") -> 1L),
      s"accumulated counts must survive the torn swap: $got")
  }
}
