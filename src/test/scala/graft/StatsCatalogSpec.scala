package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.ZOrder
import graft.sources.StatsCatalog

/** File-skipping end to end: write a clustered multi-file layout,
  * build the per-file min/max catalog, and assert that a range
  * predicate (a) opens a small fraction of the files and (b) returns
  * EXACTLY the full-scan answer — the plan-time scan economy a 100 TB
  * table lives on. */
class StatsCatalogSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("range-clustered layout: quarter predicate opens few files, result equals full scan") {
    val dir = tmp("stats_range")
    Tables.lineitem(spark, sf("sf0.01"))
      .repartitionByRange(16, col("l_shipdate"))
      .write.mode("overwrite").parquet(dir)

    val stats = StatsCatalog.build(spark, dir, Seq("l_shipdate", "l_partkey"))
    assert(stats.count() == 16)

    val lo = java.sql.Timestamp.valueOf("1996-01-01 00:00:00")
    val hi = java.sql.Timestamp.valueOf("1996-03-31 23:59:59")
    val keep = StatsCatalog.pruneFiles(stats, "l_shipdate", lo, hi)
    // ~7 years of shipdates across 16 range-clustered files: one
    // quarter lands in 1-2 files (+1 boundary slack)
    assert(keep.nonEmpty && keep.size <= 3, s"expected <=3 of 16 files, got ${keep.size}")

    val pruned = StatsCatalog.prunedRead(spark, dir, stats, "l_shipdate", lo, hi)
    val full = spark.read.parquet(dir)
      .filter(col("l_shipdate") >= lit(lo) && col("l_shipdate") <= lit(hi))
    assert(pruned.count() == full.count() && full.count() > 0)
    assert(pruned.exceptAll(full).isEmpty && full.exceptAll(pruned).isEmpty)
  }

  test("z-ordered layout: the catalog prunes on EITHER clustered dimension") {
    val dir = tmp("stats_zorder")
    val li = Tables.lineitem(spark, sf("sf0.01"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
    ZOrder.cluster(li, col("l_partkey"), col("l_suppkey"), 16)
      .write.mode("overwrite").parquet(dir)

    val stats = StatsCatalog.build(spark, dir, Seq("l_partkey", "l_suppkey"))
    val mx = li.agg(max(col("l_partkey")), max(col("l_suppkey"))).head()
    val (mp, ms) = (mx.getLong(0), mx.getLong(1))

    // an octant of either key space touches a strict subset of files —
    // the property a single-column sort can only deliver for ONE key
    val onPart = StatsCatalog.pruneFiles(stats, "l_partkey", 0L, mp / 8)
    val onSupp = StatsCatalog.pruneFiles(stats, "l_suppkey", 0L, ms / 8)
    assert(onPart.size < 16, s"partkey octant touched all ${onPart.size} files")
    assert(onSupp.size < 16, s"suppkey octant touched all ${onSupp.size} files")

    val pruned = StatsCatalog.prunedRead(spark, dir, stats, "l_suppkey", 0L, ms / 8)
    val full = spark.read.parquet(dir)
      .filter(col("l_suppkey") >= 0L && col("l_suppkey") <= ms / 8)
    assert(pruned.count() == full.count() && full.count() > 0)
    assert(pruned.exceptAll(full).isEmpty && full.exceptAll(pruned).isEmpty)
  }

  test("3-dimensional z-order: the catalog prunes on ANY of the three clustered keys") {
    val dir = tmp("stats_zorder3")
    val li = Tables.lineitem(spark, sf("sf0.01"))
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_suppkey"), col("l_quantity").cast("long").as("qty"))
    ZOrder.clusterN(li, Seq(col("l_partkey"), col("l_suppkey"), col("qty")), 16)
      .write.mode("overwrite").parquet(dir)
    val stats = StatsCatalog.build(spark, dir, Seq("l_partkey", "l_suppkey", "qty"))
    val mx = li.agg(max(col("l_partkey")), max(col("l_suppkey")), max(col("qty"))).head()
    val kept = Seq("l_partkey" -> mx.getLong(0), "l_suppkey" -> mx.getLong(1), "qty" -> mx.getLong(2))
      .map { case (c, m) => c -> StatsCatalog.pruneFiles(stats, c, 0L, m / 8).size }
    kept.foreach { case (c, k) =>
      assert(k < 16, s"octant on $c touched all $k files")
    }
    // correctness on one dimension
    val pruned = StatsCatalog.prunedRead(spark, dir, stats, "qty", 0L, mx.getLong(2) / 8)
    val full = spark.read.parquet(dir).filter(col("qty").between(0L, mx.getLong(2) / 8))
    assert(pruned.count() == full.count() && full.count() > 0)
  }

  test("bloom catalog prunes point lookups where min/max cannot") {
    val dir = tmp("stats_bloom")
    // hash-clustered on the key: every file spans the FULL key range,
    // so the range catalog is useless here by construction — and a
    // given orderkey's lines land in exactly one file
    Tables.lineitem(spark, sf("sf0.01"))
      .repartition(16, col("l_orderkey"))
      .write.mode("overwrite").parquet(dir)

    val range = StatsCatalog.build(spark, dir, Seq("l_orderkey"))
    val someKey = spark.read.parquet(dir).select(col("l_orderkey")).head().getLong(0)
    assert(StatsCatalog.pruneFiles(range, "l_orderkey", someKey, someKey).size == 16,
      "range stats should be useless on a hash layout (that is the point)")

    val bloom = StatsCatalog.buildBloom(spark, dir, "l_orderkey")
    val keep = StatsCatalog.pruneFilesPoint(bloom, someKey)
    assert(keep.nonEmpty && keep.size <= 4, s"bloom kept ${keep.size} of 16 files")
    val got = spark.read.parquet(keep: _*).filter(col("l_orderkey") === someKey).count()
    val want = spark.read.parquet(dir).filter(col("l_orderkey") === someKey).count()
    assert(got == want && want > 0)

    // an absent key prunes to (almost) nothing — false positives only
    assert(StatsCatalog.pruneFilesPoint(bloom, -987654321L).size <= 2)
  }

  test("declared q121 reads through the catalog: few files actually opened, full-scan answer") {
    // The end-to-end wiring the oracle checks for correctness, pinned
    // here for scan economy: the aggregate's input files ARE the
    // pruned subset — a quarter predicate over a 16-file range
    // clustering opens at most 3.
    val df = graft.SparkEntry.queries("q121_stats_pruned_scan")(spark, sf("sf0.01"))
    val opened = df.inputFiles.filter(_.contains("graft_q121"))
    assert(opened.nonEmpty && opened.length <= 3,
      s"q121 opened ${opened.length} of 16 layout files")
    val full = Tables.lineitem(spark, sf("sf0.01"))
      .filter(col("l_shipdate").between(
        lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")),
        lit(java.sql.Timestamp.valueOf("1996-03-31 23:59:59"))))
      .groupBy(col("l_returnflag")).count()
    assert(df.select(col("l_returnflag"), col("n_rows")).exceptAll(
      full.select(col("l_returnflag"), col("count"))).isEmpty,
      "pruned rollup must equal the full-scan rollup")
  }

  test("gated read: collect and whole-scan regimes return identical rows") {
    val dir = tmp("stats_gated")
    Tables.lineitem(spark, sf("sf0.01"))
      .repartitionByRange(16, col("l_shipdate"))
      .write.mode("overwrite").parquet(dir)
    val stats = StatsCatalog.build(spark, dir, Seq("l_shipdate"))
    val lo = java.sql.Timestamp.valueOf("1996-01-01 00:00:00")
    val hi = java.sql.Timestamp.valueOf("1996-03-31 23:59:59")
    // default gate -> selective regime (collect survivor paths);
    // gate=0 -> unselective regime (one whole-path scan, pushed-down
    // predicate). The two must agree row for row — AND with the plain
    // prunedRead they both wrap.
    val collected = StatsCatalog.prunedReadGated(spark, dir, stats, "l_shipdate", lo, hi)
    val wholeScan = StatsCatalog.prunedReadGated(spark, dir, stats, "l_shipdate", lo, hi,
      collectGate = 0L)
    assert(collected.count() == wholeScan.count() && collected.count() > 0)
    assert(collected.exceptAll(wholeScan).isEmpty && wholeScan.exceptAll(collected).isEmpty)
    // the selective regime really pruned; the unselective one really scanned all
    assert(collected.inputFiles.count(_.contains("stats_gated")) <= 3)
    assert(wholeScan.inputFiles.count(_.contains("stats_gated")) == 16)
  }

  test("empty selection returns an empty frame with the table schema") {
    val dir = tmp("stats_empty")
    Tables.lineitem(spark, sf("sf0.001"))
      .repartitionByRange(4, col("l_partkey"))
      .write.mode("overwrite").parquet(dir)
    val stats = StatsCatalog.build(spark, dir, Seq("l_partkey"))
    val none = StatsCatalog.prunedRead(spark, dir, stats, "l_partkey", -100L, -1L)
    assert(none.isEmpty)
    assert(none.schema == spark.read.parquet(dir).schema)
  }
}
