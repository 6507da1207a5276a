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

  /** Count-Min cells built WITHOUT the per-key pre-aggregate: each
    * row fans out to its depth cells map-side (codegen explode) and
    * the only shuffle is the cell groupBy — map-side partial
    * aggregation bounds it at depth*width rows PER TASK regardless of
    * key cardinality. This is the build for streams/corpora whose
    * distinct-key count is itself fact-sized (the per-key pre-agg in
    * [[countMinCells]] would shuffle |keys| rows first); cells are
    * identical to [[countMinCells]] (SketchesSpec pins equality). */
  def countMinCellsDirect(df: DataFrame, key: Column, depth: Int = 4, width: Long = 1024L): DataFrame = {
    require(depth >= 1 && depth <= A.length, s"depth must be 1..${A.length}")
    df.select(posexplode(array((0 until depth).map(d => slot(key, d, width)): _*)))
      .groupBy(col("pos").as("depth"), col("col").as("cslot"))
      .agg(count(lit(1)).as("cell_n"))
  }

  /** Exact heavy hitters behind a Count-Min gate — the two-pass
    * frequent-items shape that never shuffles the light-key mass.
    * Pass 1 builds CMS cells with [[countMinCellsDirect]] (shuffle
    * <= depth*width rows/task). The cells pivot into ONE row of
    * per-depth lookup maps that broadcasts; pass 2 scores every row's
    * key map-side (least over depth element_at's) and only rows whose
    * estimate clears `minCount` reach the exact groupBy. CMS
    * estimates are >= truth, so the gate has no false negatives and
    * the post-count HAVING makes the output EXACTLY the keys with
    * true count >= minCount — oracle-checkable against a plain
    * GROUP BY/HAVING while shuffling only the heavy-candidate rows
    * (at a Zipfian 100 TB: a few percent of the stream). */
  def heavyHitters(df: DataFrame, key: Column, minCount: Long,
                   depth: Int = 4, width: Long = 1024L): DataFrame = {
    val cells = countMinCellsDirect(df, key, depth, width)
    // depth rows -> one row: array indexed by depth of cslot->cell_n maps
    val lookup = cells
      .groupBy(col("depth"))
      .agg(map_from_entries(collect_list(struct(col("cslot"), col("cell_n")))).as("m"))
      .agg(map_from_entries(collect_list(struct(col("depth"), col("m")))).as("mm"))
    val est = least((0 until depth).map(d =>
      coalesce(element_at(element_at(col("mm"), d), slot(key, d, width)), lit(0L))): _*)
    // round-16: the estimate pass pays depth x (hash + map probe) per
    // row INSIDE the scan stage — row-group-bound on a small file; the
    // adaptive fan-out (no-op at real scale) spreads it over the
    // session's cores
    graft.operators.Skew.fanOut(df).crossJoin(broadcast(lookup))
      .filter(est >= minCount)
      .groupBy(key.as("key"))
      .agg(count(lit(1)).as("true_n"))
      .filter(col("true_n") >= minCount)
  }

  /** Quantile-sketch buckets: each value (a NONNEGATIVE integer
    * column — scale decimals to their minor unit first) rounds DOWN
    * to `sig` significant digits; the bucket id IS that rounded
    * integer, so reconstruction needs no side table and every step is
    * exact integer arithmetic — reproducible bit-for-bit in ANSI SQL,
    * unlike float log-gamma bucketing (DDSketch) whose libm ulps can
    * flip boundary buckets across engines. Bucket width is
    * 10^(digits-sig), so relative error is < 10^(1-sig) (sig=3 →
    * <1%); bucket count is bounded by 9*10^(sig-1) per decade —
    * thousands of cells for any 100 TB column. Merge across
    * partitions / micro-batches / days is bucket-wise SUM
    * ([[mergeSigBuckets]]): the mergeable-summary property that makes
    * full-sort percentiles unnecessary at scale. */
  def sigBuckets(df: DataFrame, intValue: Column, sig: Int = 3): DataFrame = {
    require(sig >= 1 && sig <= 15)
    df.select(intValue.cast("long").as("__v"))
      // p = 10^(digits - sig) in exact integer arithmetic: length() of
      // the decimal rendering is the digit count (no float log10), and
      // power(10, k) is exact in double out to 10^22 — beyond long —
      // so the bigint cast is lossless. DIV is integer division.
      .withColumn("__p",
        expr(s"cast(power(10, greatest(length(cast(__v as string)) - $sig, 0)) as bigint)"))
      .select((expr("__v DIV __p") * col("__p")).as("b_lo"))
      .groupBy(col("b_lo"))
      .agg(count(lit(1)).as("bucket_n"))
  }

  /** Merge partial sig-digit bucket tables (bucket-wise sum). */
  def mergeSigBuckets(buckets: DataFrame*): DataFrame =
    buckets.reduce(_ unionByName _)
      .groupBy(col("b_lo"))
      .agg(sum(col("bucket_n")).as("bucket_n"))

  /** Inverse quantile (CDF) from a bucket table: for each probe value
    * (a row with a long `x` column), the fraction of the sketched
    * input that is <= x, computed as cum_n at the last bucket whose
    * lower bound <= x over total_n. The answer is exact up to bucket
    * resolution (the same <10^(1-sig) relative bound as the quantile
    * direction); the walk again touches only the sketch-sized table.
    * Together with [[sigQuantiles]] this closes the pair a monitoring
    * pipeline needs: "what value is p99" AND "what percentile is this
    * value". */
  def sigCdf(buckets: DataFrame, probes: DataFrame): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val wCum = W.orderBy(col("b_lo"))
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    val wTot = W.partitionBy()
      .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    // sentinel empty bucket at -inf: every probe matches at least one
    // row, so below-range probes read cdf 0 (and total_n) from it
    // instead of null — and the sketch is still consumed exactly once
    val withSentinel = buckets.unionByName(buckets.sparkSession.range(1)
      .select(lit(Long.MinValue).as("b_lo"), lit(0L).as("bucket_n")))
    val cum = withSentinel
      .withColumn("cum_n", sum(col("bucket_n")).over(wCum))
      .withColumn("total_n", sum(col("bucket_n")).over(wTot))
    probes.select(col("x"))
      .join(broadcast(cum), col("b_lo") <= col("x"))
      .groupBy(col("x"))
      .agg((max(col("cum_n")).cast("double")
        / max(col("total_n")).cast("double")).as("cdf"))
  }

  /** KMV (k-minimum-values) distinct-count sketch: the k smallest
    * values of [[kmvHash]] over the distinct keys. The
    * k-th smallest hash h_k estimates distinct count as
    * (k-1) * P / h_k (uniform order statistics); the summary is k
    * longs however large the input, and two sketches merge by
    * re-taking the k smallest of their union — the mergeable path to
    * distinct counts per partition / micro-batch / day. Unlike HLL
    * (engine-internal registers), every value here replays in ANSI
    * SQL, so the sketch CONTENTS are oracle-checkable. Build shape:
    * per-key distinct is a partial-agg shuffle; the k-min is a single
    * sorted limit on the distinct-hash stream (TakeOrdered — no
    * global sort). */
  def kmvSketch(df: DataFrame, key: Column, k: Int = 64): DataFrame =
    df.select(kmvHash(key).as("h")).distinct()
      .orderBy(col("h")).limit(k)

  /** KMV needs a NONLINEAR hash: the affine family above preserves
    * key order on domains that don't wrap past P, which makes the
    * k-th-smallest order statistic (and thus the estimate) garbage on
    * small/sequential key ranges. Squaring mod P before the affine
    * step breaks monotonicity while every term stays inside BIGINT on
    * both engines ((k mod P)^2 < 2^63), so the hash still replays
    * exactly in ANSI SQL. */
  def kmvHash(key: Column): Column = {
    val kp = key % P
    (kp * kp % P * A(0) + kp * B(0) + 1) % P
  }

  /** Merge partial KMV sketches: k smallest of the union. */
  def mergeKmv(k: Int, sketches: DataFrame*): DataFrame =
    sketches.reduce(_ unionByName _).distinct().orderBy(col("h")).limit(k)

  /** Distinct-count estimate from a KMV sketch: (k-1)*P/h_k, or the
    * sketch size itself when the input had fewer than `k` distinct
    * keys (the sketch then IS the distinct hash set and the count is
    * exact). */
  def kmvEstimate(sketch: DataFrame, k: Int = 64): DataFrame =
    sketch.agg(count(lit(1)).as("kk"), max(col("h")).as("hk"))
      .select(
        when(col("kk") < lit(k), col("kk").cast("double"))
          .otherwise((col("kk") - 1).cast("double") * lit(P.toDouble) / col("hk"))
          .as("est_distinct"))

  /** Per-group KMV: the k smallest hashes PER KEY — one distinct-count
    * sketch per group, |groups| * k rows total. The per-group k-min
    * rides the raw `row_number <= k` filter, which keeps Catalyst's
    * InferWindowGroupLimit eligible: every map task ships at most k
    * hashes per group before the exchange (the same plan property
    * SamplingPlanSpec pins for quota sampling) — per-key distinct
    * estimation over 100 TB without a per-key global sort. */
  def kmvSketchBy(df: DataFrame, group: Column, key: Column, k: Int = 64): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("h"))
    df.select(group.as("grp"), kmvHash(key).as("h")).distinct()
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col("grp"), col("h"))
  }

  /** [[kmvSketchBy]] as ONE dedup-ing bounded-heap aggregate
    * ([[KmvMinsAgg]]): identical output set, but the exchange carries
    * O(maps × k) longs per group instead of every unique hash — no
    * distinct shuffle, no window. The shape to prefer when the
    * unique-value universe is large (q193's per-column profile at
    * volume); [[kmvSketchBy]] remains for plan-pinned callers. */
  def kmvMinsSketchBy(df: DataFrame, group: Column, key: Column, k: Int = 64): DataFrame =
    df.select(group.as("grp"), kmvHash(key).as("h"))
      .groupBy(col("grp"))
      .agg(KmvMins.column(col("h"), k).as("hs"))
      .select(col("grp"), explode(col("hs")).as("h"))

  /** Per-group estimates from a [[kmvSketchBy]] table. */
  def kmvEstimateBy(sketch: DataFrame, k: Int = 64): DataFrame =
    sketch.groupBy(col("grp"))
      .agg(count(lit(1)).as("kk"), max(col("h")).as("hk"))
      .select(col("grp"),
        when(col("kk") < lit(k), col("kk").cast("double"))
          .otherwise((col("kk") - 1).cast("double") * lit(P.toDouble) / col("hk"))
          .as("est_distinct"))

  /** Pairwise SET-OPERATION estimates from a [[kmvSketchBy]] table —
    * corpus-overlap analytics (how much of source A duplicates source
    * B) WITHOUT touching the raw data again: every computation below
    * runs on the k-row-per-group sketch table.
    *
    * For each group pair (a < b):
    *  - `est_a`/`est_b`: the standard KMV distinct estimates;
    *  - `est_union`: k smallest of the two sketches' union (the k-min
    *    of a union is always contained in the union of k-mins — exact
    *    mergeability), estimated the same way;
    *  - `est_common_theta`: theta-style cut — with theta = min of the
    *    two k-th-minima, each sketch restricted to h < theta is a
    *    uniform hash sample of its set at rate theta/P, so common
    *    hashes below theta scale up by P/theta. Degenerates to the
    *    EXACT count when both groups have < k distinct keys (theta =
    *    P: the sketches are the full hash sets);
    *  - `est_common_ie`: inclusion-exclusion est_a + est_b -
    *    est_union, clamped at 0 — cheaper, higher variance;
    *  - `est_jaccard`: est_common_theta / est_union.
    *
    * Scale shape: |groups|^2 pairs of k-row sketches; nothing here
    * re-reads the corpus — the one corpus pass happened in
    * [[kmvSketchBy]]. Output: (grp_a, grp_b, est_a, est_b, est_union,
    * est_common_ie, est_common_theta, est_jaccard), estimates
    * unrounded (round at the query site). */
  def kmvSetOps(sketchBy: DataFrame, k: Int = 64): DataFrame = {
    val est = when(col("kk") < k, col("kk").cast("double"))
      .otherwise((col("kk") - 1).cast("double") * lit(P.toDouble) / col("hk"))
    val stats = sketchBy.groupBy(col("grp"))
      .agg(count(lit(1)).as("kk"), max(col("h")).as("hk"))
      .select(col("grp"), when(col("kk") < k, lit(P)).otherwise(col("hk")).as("theta"),
        est.as("est"))
    val pairs = stats.select(col("grp").as("grp_a"), col("theta").as("ta"), col("est").as("est_a"))
      .join(stats.select(col("grp").as("grp_b"), col("theta").as("tb"), col("est").as("est_b")),
        col("grp_a") < col("grp_b"))
      .withColumn("theta", least(col("ta"), col("tb")))
    // common hashes below the pair's theta cut (left join keeps
    // zero-overlap pairs in the output)
    val common = sketchBy.select(col("grp").as("grp_a"), col("h"))
      .join(sketchBy.select(col("grp").as("grp_b"), col("h")), Seq("h"))
      .filter(col("grp_a") < col("grp_b"))
    val withCommon = pairs.join(common, Seq("grp_a", "grp_b"), "left")
      .groupBy(col("grp_a"), col("grp_b"), col("theta"), col("est_a"), col("est_b"))
      .agg(sum(when(col("h").isNotNull && col("h") < col("theta"), 1L).otherwise(0L)).as("n_common"))
    // union sketch per pair: k smallest of the two sketches' hashes
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp_a"), col("grp_b")).orderBy(col("h"))
    val unionEst = pairs.select(col("grp_a"), col("grp_b"))
      .join(sketchBy, col("grp") === col("grp_a") || col("grp") === col("grp_b"))
      .select(col("grp_a"), col("grp_b"), col("h")).distinct()
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") <= k)
      .groupBy(col("grp_a"), col("grp_b"))
      .agg(count(lit(1)).as("kk"), max(col("h")).as("hk"))
      .select(col("grp_a"), col("grp_b"), est.as("est_union"))
    withCommon.join(unionEst, Seq("grp_a", "grp_b"))
      .select(col("grp_a"), col("grp_b"), col("est_a"), col("est_b"), col("est_union"),
        greatest(col("est_a") + col("est_b") - col("est_union"), lit(0d)).as("est_common_ie"),
        (col("n_common").cast("double") * lit(P.toDouble) / col("theta")).as("est_common_theta"),
        (col("n_common").cast("double") * lit(P.toDouble) / col("theta") / col("est_union"))
          .as("est_jaccard"))
  }

  /** Per-group sig-digit buckets: one quantile sketch per key —
    * (group, b_lo, bucket_n). Same exact-integer bucketing as
    * [[sigBuckets]]; the groupBy carries the group columns, so the
    * whole build is still ONE partial-agg shuffle and the result is
    * |groups| * buckets-per-group rows. */
  def sigBucketsBy(df: DataFrame, group: Column, intValue: Column, sig: Int = 3): DataFrame = {
    require(sig >= 1 && sig <= 15)
    df.select(group.as("grp"), intValue.cast("long").as("__v"))
      .withColumn("__p",
        expr(s"cast(power(10, greatest(length(cast(__v as string)) - $sig, 0)) as bigint)"))
      .select(col("grp"), (expr("__v DIV __p") * col("__p")).as("b_lo"))
      .groupBy(col("grp"), col("b_lo"))
      .agg(count(lit(1)).as("bucket_n"))
  }

  /** Per-group discrete quantiles from a [[sigBucketsBy]] table: the
    * cumulative walk runs per group under a partitioned window (each
    * group's sketch is thousands of rows at most, so no task ever
    * sees more than one group's buckets x |qs|). */
  def sigQuantilesBy(buckets: DataFrame, qs: Seq[Double]): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    // cumulative AND total from the SAME per-group window partition:
    // the bucket table shuffles once and the underlying fact is never
    // re-scanned for the denominator (a groupBy+join here would
    // re-derive the whole sketch build a second time)
    val wCum = W.partitionBy(col("grp")).orderBy(col("b_lo"))
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    val wTot = W.partitionBy(col("grp"))
      .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    val cum = buckets
      .withColumn("cum_n", sum(col("bucket_n")).over(wCum))
      .withColumn("total_n", sum(col("bucket_n")).over(wTot))
    val qdf = buckets.sparkSession.range(1)
      .select(explode(array(qs.map(lit(_)): _*)).as("q"))
    cum.crossJoin(broadcast(qdf))
      .filter(col("cum_n") >= ceil(col("q") * col("total_n")))
      .groupBy(col("grp"), col("q"))
      .agg(min(col("b_lo")).as("q_lo"))
  }

  /** Discrete quantiles from a bucket table: for each q, the smallest
    * bucket lower-bound whose cumulative count reaches ceil(q*N) —
    * the true q-quantile rounded down to the sketch's significant
    * digits (within its <10^(1-sig) relative bound). The walk runs
    * over the bucket table only (thousands of rows however large the
    * input), as a single-partition cumulative window — the correct
    * shape for a sketch-sized table. */
  def sigQuantiles(buckets: DataFrame, qs: Seq[Double]): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    // total from a second window over the same single partition (the
    // sketch is thousands of rows) — an agg+crossJoin would re-run
    // the whole bucket build, re-scanning the fact table
    val wCum = W.orderBy(col("b_lo"))
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    val wTot = W.partitionBy()
      .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    val cum = buckets
      .withColumn("cum_n", sum(col("bucket_n")).over(wCum))
      .withColumn("total_n", sum(col("bucket_n")).over(wTot))
    val qdf = buckets.sparkSession.range(1)
      .select(explode(array(qs.map(lit(_)): _*)).as("q"))
    cum.crossJoin(broadcast(qdf))
      .filter(col("cum_n") >= ceil(col("q") * col("total_n")))
      .groupBy(col("q"))
      .agg(min(col("b_lo")).as("q_lo"))
  }
}
