package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, oracle-checkable sketches over EXPLICIT universal
  * hashing: h_d(k) = (a_d * k + b_d) mod P mod width, with fixed odd
  * multipliers and P = 2^31 - 1. Unlike engine-internal sketches
  * (HLL++, theta), every cell is reproducible in ANSI SQL, so sketch
  * CONTENTS — not just their answers — can be hash-compared across
  * engines.
  *
  * Both sketches are mergeable summaries (the 100 TB property):
  * Count-Min cells merge by cell-wise SUM and Bloom bit sets by
  * UNION, so partial sketches built per partition / per micro-batch /
  * per day combine into the exact sketch of the union stream —
  * `StreamingSketchSpec` pins batch≡incremental equality.
  */
object Sketches {

  val P = 2147483647L // Mersenne prime 2^31-1
  private val A = Seq(1299721L, 15485863L, 32452843L, 49979687L)
  private val B = Seq(7L, 101L, 1009L, 10007L)

  /** Hash row `d` of the family, bucketed to `width`. */
  def slot(key: Column, d: Int, width: Long): Column =
    (key * A(d) + B(d)) % P % width

  /** Count-Min sketch cells (depth, cslot, cell_n) for a long key
    * column: depth rows x width counters, cell = total count of keys
    * hashing there. Built from the per-key pre-aggregate, so raw rows
    * never fan out x depth; only <= depth*width cells leave the
    * aggregation. */
  def countMinCells(df: DataFrame, key: Column, depth: Int = 4, width: Long = 1024L): DataFrame = {
    require(depth >= 1 && depth <= A.length, s"depth must be 1..${A.length}")
    df.groupBy(key.as("__k")).agg(count(lit(1)).as("__n"))
      .select(col("__n"), posexplode(array((0 until depth).map(d => slot(col("__k"), d, width)): _*)))
      .groupBy(col("pos").as("depth"), col("col").as("cslot"))
      .agg(sum(col("__n")).as("cell_n"))
  }

  /** Merge partial CMS cell tables (cell-wise sum). */
  def mergeCells(cells: DataFrame*): DataFrame =
    cells.reduce(_ unionByName _)
      .groupBy(col("depth"), col("cslot"))
      .agg(sum(col("cell_n")).as("cell_n"))

  /** Point estimates for `keys` (a frame with a long key column):
    * min over depth rows of the landed cell — always >= the true
    * count (collisions only add). */
  def cmsEstimate(cells: DataFrame, keys: DataFrame, key: Column,
                  depth: Int = 4, width: Long = 1024L): DataFrame = {
    keys.select(key.as("key"),
      posexplode(array((0 until depth).map(d => slot(key, d, width)): _*)))
      .join(cells, col("pos") === col("depth") && col("col") === col("cslot"))
      .groupBy(col("key"))
      .agg(min(col("cell_n")).as("est_n"))
  }

  /** Equi-join cardinality estimate from two CMS cell tables over the
    * SAME hash family: within a depth row, sum(cellA * cellB) equals
    * the true join size plus non-negative collision mass, so the min
    * over depths is an upper bound that tightens with width — the
    * classic sketch inner product (AMS/CMS), the statistic a
    * cost-based optimizer wants before committing a 100 TB join
    * strategy. Cost: |cells| work, never touching the fact tables. */
  def cmsInnerProduct(cellsA: DataFrame, cellsB: DataFrame): DataFrame = {
    val b = cellsB.select(col("depth").as("depth_b"), col("cslot").as("cslot_b"),
      col("cell_n").as("cell_b"))
    cellsA.join(b, col("depth") === col("depth_b") && col("cslot") === col("cslot_b"))
      .groupBy(col("depth"))
      .agg(sum(col("cell_n") * col("cell_b")).as("ip"))
      .agg(min(col("ip")).as("est_pairs"))
  }

  /** Bloom bit positions (distinct) for a long key column — the
    * filter is <= numHashes*|set| distinct ints capped by `bits`,
    * broadcast-sized regardless of input scale; merge across partial
    * builds is set UNION (distinct of the concatenation). */
  def bloomBits(df: DataFrame, key: Column, numHashes: Int = 3, bits: Long = 4096L): DataFrame = {
    require(numHashes >= 1 && numHashes <= A.length)
    df.select(explode(array((0 until numHashes).map(j => slot(key, j, bits)): _*)).as("bit"))
      .distinct()
  }

  /** Probe every row's key against a bit-position table: true iff all
    * hash positions are set (no false negatives; false positives are
    * the fixed family's collision pattern). The bit table broadcasts,
    * so a 100 TB probe stream never shuffles. */
  def bloomProbe(bitsDf: DataFrame, probes: DataFrame, key: Column,
                 numHashes: Int = 3, bits: Long = 4096L): DataFrame = {
    probes.select(key.as("key"),
      posexplode(array((0 until numHashes).map(j => slot(key, j, bits)): _*)))
      .join(broadcast(bitsDf), col("col") === col("bit"), "left")
      .groupBy(col("key"))
      .agg((count(col("bit")) === numHashes).as("bloom_hit"))
  }
}
