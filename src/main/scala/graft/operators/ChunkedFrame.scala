package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trailing ROW-frame aggregates without the per-key parallelism
  * ceiling of a single `Window.partitionBy(key)`.
  *
  * A bounded frame like `rowsBetween(-19, current)` evaluated the
  * direct way sorts each key's ENTIRE history in one task — fine for
  * thousands of keys, a 2M-rows-per-task wall when a feed has five
  * event types at 100x volume (the q108 scale-probe finding). This
  * operator breaks the ceiling with the engine's two-level prefix-sum
  * idiom (the q70 token-shard pattern):
  *
  *  1. rows get a LOCAL rank inside (key, chunk) — chunk is any
  *     monotonic-in-order bucketing (hour/day of the order column),
  *     so this window runs keys x chunks tasks wide;
  *  2. per-(key, chunk) row counts — a chunk-count-sized table —
  *     take an exclusive running sum per key: each chunk learns how
  *     many rows precede it. local rank + offset = EXACT global rank,
  *     no global sort ever happens;
  *  3. global rank div `blockSize` forms fixed-size row blocks; the
  *     last `width` rows of each block are duplicated into the NEXT
  *     block as a marked halo (blocks are full by construction, so
  *     one block's halo always suffices);
  *  4. the frame window runs inside (key, block ∪ halo) — body rows
  *     see exactly the `width` preceding rows the global frame would,
  *     halo rows contribute and are dropped.
  *
  * The frame sums are DECIMAL (exact, associative), so the two-level
  * evaluation is bit-identical to the single-window plan — the same
  * reason q108 uses decimal sums for cross-engine parity makes them
  * re-composition-safe here. Cost: a second full-row shuffle (key,
  * block) plus `width` halo rows per block, bought against
  * per-key-unbounded parallelism: tasks scale with volume/blockSize,
  * not with key count.
  */
object ChunkedFrame {

  /** Loud-failure bound on a single (key, chunk) band — the DayGrid
    * move one level down (round-15 Next #2). Chunk grain is meant to
    * be hour/day-of-order per key, so per-band rows are bounded by
    * ticks per (key, hour); nothing in the machinery itself bounds
    * them, and the q129@1000× probe showed a density-only replica
    * silently growing bands to ~½M rows (maxTask 113 s) — a genuinely
    * hot chunk (one instrument × market-open hour) at 100 TB would
    * keep going into multi-GB single-task sorts. 4M rows ≈ ~120 MB of
    * band per task: survivable, and well past any sane chunk grain —
    * the same loud-not-OOM philosophy (and bound) as
    * [[DayGrid.MaxSeriesLen]]. */
  val MaxChunkRows: Int = 4000000

  /** The guarded chunk-offset wrapper: `okExpr` when the band holds
    * ≤ `maxLen` rows, a loud grain-contract `raise_error` otherwise.
    * Lives in the chunk-summary (broadcast-side) projection, which
    * every output row of the band joins through — so an oversized
    * band dies at evaluation with a message naming the band, not as
    * an inscrutable executor OOM inside the local-rank sort. */
  private def guardedBand(caller: String, key: Column, chunk: Column,
                          cnt: Column, okExpr: Column,
                          outType: org.apache.spark.sql.types.DataType,
                          maxLen: Int): Column =
    when(cnt <= lit(maxLen.toLong), okExpr)
      .otherwise(raise_error(concat(lit(
        s"$caller: a single (key, chunk) band exceeds $maxLen rows — " +
          "the chunk column must bucket each key's order domain " +
          "(hour/day grain), not collapse it; got "),
        cnt.cast("string"), lit(" rows for key "), key.cast("string"),
        lit(" chunk "), chunk.cast("string"))).cast(outType))

  /** Adds `__g` — the exact 0-based global rank of each row within
    * `keyCol` under `orderCols` — WITHOUT ever sorting a key's whole
    * history in one task (steps 1–2 of the class doc): a local rank
    * inside (key, chunk) runs keys x chunks tasks wide, and an
    * exclusive prefix sum over the chunk-count-sized (key, chunk)
    * count table supplies each chunk's offset. `chunk` must be
    * monotonic non-decreasing in the order prefix (e.g.
    * `date_trunc("hour", ts)` when ordering by (ts, id)): rows that
    * share order-column values must share a chunk.
    *
    * This is the scale-correct foundation for every rank-family
    * window function: row_number IS `__g + 1`, and with the per-key
    * total (one partial-agg shuffle) percent_rank / cume_dist /
    * ntile are pure per-row arithmetic over (`__g`, N) — see q127. */
  /** `broadcastOffsets = false` drops the explicit broadcast hint on
    * the offset join: the offset table is one row per nonempty
    * (key, chunk), which approaches EVENT grain when the key is
    * user-cardinality and chunks are sparse (the Transitions
    * flagsChunked advisory) — AQE then upgrades to broadcast at
    * runtime only when it actually fits. Dim-keyed callers (event
    * types × hours) keep the default hint. */
  def globalRank(df: DataFrame, keyCol: String, chunk: Column,
                 orderCols: Seq[String],
                 broadcastOffsets: Boolean = true,
                 maxChunkRows: Int = MaxChunkRows): DataFrame = {
    val ord = orderCols.map(col)
    val k = col(keyCol)
    val withChunk = df.withColumn("__chunk", chunk)

    // 1. local rank, keys x chunks wide
    val wLocal = Window.partitionBy(k, col("__chunk")).orderBy(ord: _*)
    val ranked = withChunk.withColumn("__lr", row_number().over(wLocal))

    // 2. exclusive per-key prefix over the tiny (key, chunk) count
    // table -> exact global rank. The table is one row per nonempty
    // (key, chunk); its window is chunk-count-sized, never row-sized.
    // Counts come from the SOURCE, not from `ranked` — this arm's
    // scan column-prunes to (key, order prefix) and never pays the
    // rank window twice.
    val wOffset = Window.partitionBy(col(s"__o_$keyCol")).orderBy(col("__o_chunk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // the hot-chunk guard rides the offset every body row adds to its
    // local rank: a band past `maxChunkRows` raises at evaluation
    // (round-15 Next #2 — loud, with the band named, instead of a
    // silent multi-GB local-rank sort task)
    val offsets = withChunk.groupBy(k.as(s"__o_$keyCol"), col("__chunk").as("__o_chunk"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", guardedBand("ChunkedFrame.globalRank",
        col(s"__o_$keyCol"), col("__o_chunk"), col("__cnt"),
        coalesce(sum(col("__cnt")).over(wOffset), lit(0L)),
        org.apache.spark.sql.types.LongType, maxChunkRows))
      .drop("__cnt")
    ranked.join(if (broadcastOffsets) broadcast(offsets) else offsets,
        k === col(s"__o_$keyCol") && col("__chunk") === col("__o_chunk"))
      .withColumn("__g", col("__off") + col("__lr") - 1)
      .drop(s"__o_$keyCol", "__o_chunk", "__off", "__lr", "__chunk")
  }

  /** The generic two-level evaluator (steps 3–4 of the class doc):
    * blocks rows by global rank, duplicates each block's last
    * `haloWidth` rows into the next block as a marked halo, hands
    * `build` the assembled frame plus the in-block window base
    * (partitionBy(key, block) orderBy(global rank)), then drops halo
    * rows and the internal columns.
    *
    * `build`'s contract: every column it adds must be a window
    * expression over the given base (or a rowsBetween frame of it)
    * whose value for a BODY row depends on at most `haloWidth`
    * preceding rows — including through composition (a lag(1) feeding
    * a -w..0 frame sum needs haloWidth >= w+1, because the earliest
    * in-frame derived value reaches one row further back). Halo rows
    * near a partition edge may compute WRONG derived values (their
    * own lookback is truncated); that is sound exactly because they
    * are dropped and no body row's frame reaches past the halo. */
  def withTrailingEval(df: DataFrame, keyCol: String, chunk: Column,
                       orderCols: Seq[String], haloWidth: Int,
                       blockSize: Int = 4096,
                       broadcastOffsets: Boolean = true,
                       maxChunkRows: Int = MaxChunkRows)
                      (build: (DataFrame, org.apache.spark.sql.expressions.WindowSpec) => DataFrame): DataFrame = {
    require(haloWidth >= 1 && blockSize > haloWidth,
      s"blockSize $blockSize must exceed halo width $haloWidth")
    val k = col(keyCol)
    val indexed = globalRank(df, keyCol, chunk, orderCols, broadcastOffsets,
      maxChunkRows)

    // 3. fixed-size blocks; a row in the last `haloWidth` of its block
    // ALSO emits a halo copy into the next block — one map-side
    // explode, not a union (a union's two arms would each re-execute
    // the whole scan+rank lineage: the documented two-consumer trap)
    val blk = expr(s"__g DIV $blockSize") // integer div — `/` on columns is double division
    val assigned = indexed
      .select(col("*"), explode(
        when(col("__g") % blockSize >= blockSize - haloWidth,
          array(struct(blk.as("b"), lit(false).as("h")),
            struct((blk + 1).as("b"), lit(true).as("h"))))
          .otherwise(array(struct(blk.as("b"), lit(false).as("h"))))).as("__d"))
      .withColumn("__blk", col("__d.b")).withColumn("__halo", col("__d.h"))
      .drop("__d")

    // 4. the caller's windows, inside (key, block) — body rows' frames
    // are complete because the halo supplies the cross-boundary prefix
    val wBase = Window.partitionBy(k, col("__blk")).orderBy(col("__g"))
    build(assigned, wBase)
      .filter(!col("__halo"))
      .drop("__g", "__blk", "__halo")
  }

  /** Adds `n_w`, `s1`, `s2` — count, sum(v), sum(v*v) over the
    * trailing `width+1`-row frame of `valCol` (a decimal column) per
    * `keyCol`, ordered by `orderCols` — equal to
    * `count/sum/sum(v*v) over (partitionBy(key) orderBy(order)
    * rowsBetween(-width, current))` bit for bit.
    *
    * `chunk` must be monotonic non-decreasing in the order prefix
    * (e.g. `date_trunc("hour", ts)` when ordering by (ts, id)): rows
    * that share order-column values must share a chunk. */
  def withTrailingDecimalSums(df: DataFrame, keyCol: String, chunk: Column,
                              orderCols: Seq[String], valCol: String,
                              width: Int, blockSize: Int = 4096,
                              maxChunkRows: Int = MaxChunkRows): DataFrame =
    withTrailingEval(df, keyCol, chunk, orderCols, width, blockSize,
      maxChunkRows = maxChunkRows) { (d, w) =>
      val wFrame = w.rowsBetween(-width, Window.currentRow)
      val v = col(valCol)
      d.select(col("*"),
        count(lit(1)).over(wFrame).as("n_w"),
        sum(v).over(wFrame).as("s1"),
        sum(v * v).over(wFrame).as("s2"))
    }

  /** Adds `outCol` — the RUNNING maximum of `valCol` per `keyCol`
    * under `orderCols`, equal to `max(valCol) over (partitionBy(key)
    * orderBy(order) rowsBetween(unboundedPreceding, currentRow))` bit
    * for bit — WITHOUT the per-key single-task sort that makes the
    * direct window a ceiling on low-cardinality keys (the q108/q109
    * finding: five event types at 100x = five ~2M-row sort tasks).
    *
    * Running max is associative and order-insensitive within any
    * prefix split, so the unbounded frame needs NONE of the
    * block-and-halo machinery of `withTrailingEval`: the prefix
    * decomposes exactly at chunk boundaries.
    *
    *  1. a LOCAL running max inside (key, chunk) runs keys x chunks
    *     tasks wide — each task sorts one chunk, not one key;
    *  2. per-(key, chunk) maxes — a chunk-count-sized table — take an
    *     EXCLUSIVE prefix-max per key: each chunk learns the max of
    *     everything before it (the `globalRank` offset idiom with max
    *     in place of sum);
    *  3. running max = greatest(local, prior-chunk prefix) — pure
    *     per-row arithmetic after a broadcast join on (key, chunk).
    *
    * max over doubles/decimals is EXACT (no summation-order effects),
    * so chunked ≡ direct needs no decimal detour. Null semantics
    * match the window's too: `max` ignores nulls and `greatest`
    * skips null arguments, so a row whose prefix is all-null gets
    * null in both plans. Running min and running decimal sum follow
    * the same idiom (least / coalesce+plus in step 3); they get
    * siblings when a query needs them.
    *
    * `chunk` must be monotonic non-decreasing in the order prefix
    * (rows that share order-column values must share a chunk), same
    * contract as every entry point here. */
  def withRunningMax(df: DataFrame, keyCol: String, chunk: Column,
                     orderCols: Seq[String], valCol: String,
                     outCol: String,
                     maxChunkRows: Int = MaxChunkRows): DataFrame = {
    val k = col(keyCol)
    val v = col(valCol)
    val withChunk = df.withColumn("__chunk", chunk)

    // 1. local running max, keys x chunks wide
    val wLocal = Window.partitionBy(k, col("__chunk"))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = withChunk.withColumn("__lm", max(v).over(wLocal))

    // 2. exclusive per-key prefix-max over the tiny (key, chunk) max
    // table. Counts come from the SOURCE frame (column-pruned scan),
    // never from `local` — the two-consumer re-execution trap.
    val wPrev = Window.partitionBy(col(s"__p_$keyCol")).orderBy(col("__p_chunk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prior = withChunk.groupBy(k.as(s"__p_$keyCol"), col("__chunk").as("__p_chunk"))
      .agg(max(v).as("__cm"), count(lit(1)).as("__cc"))
      .withColumn("__pm", guardedBand("ChunkedFrame.withRunningMax",
        col(s"__p_$keyCol"), col("__p_chunk"), col("__cc"),
        max(col("__cm")).over(wPrev),
        df.schema(valCol).dataType, maxChunkRows))
      .drop("__cm", "__cc")

    // 3. per-row combine; greatest skips the null first-chunk prefix
    local.join(broadcast(prior),
        k === col(s"__p_$keyCol") && col("__chunk") === col("__p_chunk"))
      .withColumn(outCol, greatest(col("__lm"), col("__pm")))
      .drop(s"__p_$keyCol", "__p_chunk", "__pm", "__lm", "__chunk")
  }

  /** Adds `outCol` — the RUNNING sum of `valCol` per `keyCol` under
    * `orderCols`, equal to `sum(valCol) over (partitionBy(key)
    * orderBy(order) rowsBetween(unboundedPreceding, currentRow))` bit
    * for bit — the promised sum sibling of [[withRunningMax]], same
    * chunk decomposition (running sum splits exactly at chunk
    * boundaries), same volume-wide parallelism on low-cardinality
    * keys. Pass an EXACT-typed column (integer/long/decimal): the
    * whole point of the split evaluation is that partial sums
    * reassociate, which floating point does not guarantee.
    *
    * Null semantics match the window: `sum` ignores nulls, so a row
    * whose entire per-key prefix is null gets null; once any prefix
    * value exists the running sum is the sum of the non-null prefix
    * (the when-guard below — a bare `__ls + __ps` would null out any
    * row whose own CHUNK hadn't seen a value yet). */
  def withRunningSum(df: DataFrame, keyCol: String, chunk: Column,
                     orderCols: Seq[String], valCol: String,
                     outCol: String,
                     maxChunkRows: Int = MaxChunkRows): DataFrame =
    withRunningSums(df, keyCol, chunk, orderCols, Seq(valCol -> outCol),
      maxChunkRows)

  /** N running sums in ONE banding pass — same local windows, ONE
    * chunk-summary aggregate, one broadcast join (q268 needs the
    * pooled AND the early cumulative together; two sequential
    * [[withRunningSum]] calls would re-window and re-join the whole
    * grid a second time). Single-pair calls compile to the exact
    * plan the old single-column body produced. */
  def withRunningSums(df: DataFrame, keyCol: String, chunk: Column,
                      orderCols: Seq[String],
                      sums: Seq[(String, String)],
                      maxChunkRows: Int = MaxChunkRows): DataFrame =
    withRunningSumsKeys(df, Seq(keyCol), chunk, orderCols, sums, maxChunkRows)

  /** [[withRunningSums]] with a COMPOSITE key (round-16 optimization:
    * the fused multi-relation statistics key their grids by
    * (relation, group), so the single-`keyCol` API would force a
    * synthetic concat column into every exchange). Single-element
    * `keyCols` compiles to exactly the plan the single-key form
    * always produced — the public single-key entry delegates here. */
  def withRunningSumsKeys(df: DataFrame, keyCols: Seq[String], chunk: Column,
                          orderCols: Seq[String],
                          sums: Seq[(String, String)],
                          maxChunkRows: Int = MaxChunkRows): DataFrame = {
    require(sums.nonEmpty,
      "withRunningSums needs at least one (valCol, outCol) pair")
    require(keyCols.nonEmpty, "withRunningSumsKeys needs at least one key")
    val ks = keyCols.map(col)
    val pks = keyCols.map(k => col(s"__p_$k"))
    val withChunk = df.withColumn("__chunk", chunk)

    val wLocal = Window.partitionBy(ks :+ col("__chunk"): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = sums.zipWithIndex.foldLeft(withChunk) {
      case (d, ((v, _), i)) => d.withColumn(s"__ls$i", sum(col(v)).over(wLocal))
    }

    val wPrev = Window.partitionBy(pks: _*).orderBy(col("__p_chunk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // chunk sums + the band row count the hot-chunk guard reads
    val csAggs = sums.zipWithIndex.map { case ((v, _), i) => sum(col(v)).as(s"__cs$i") } :+
      count(lit(1)).as("__cc")
    val gCols = keyCols.map(k => col(k).as(s"__p_$k")) :+ col("__chunk").as("__p_chunk")
    val prior0 = withChunk.groupBy(gCols: _*)
      .agg(csAggs.head, csAggs.tail: _*)
    // the guard message names the band by its (possibly composite) key
    val guardKey =
      if (pks.size == 1) pks.head
      else concat_ws("/", pks.map(_.cast("string")): _*)
    // every out column's final expression reads its __ps band prefix,
    // so guarding EACH prefix puts the loud bound on every consumer's
    // evaluation path even after downstream column pruning
    val prior = sums.indices.foldLeft(prior0) { (d, i) =>
      d.withColumn(s"__ps$i", guardedBand("ChunkedFrame.withRunningSums",
        guardKey, col("__p_chunk"), col("__cc"),
        sum(col(s"__cs$i")).over(wPrev),
        prior0.schema(s"__cs$i").dataType, maxChunkRows))
    }.drop("__cc" +: sums.indices.map(i => s"__cs$i"): _*)

    val joinCond = keyCols.map(k => col(k) === col(s"__p_$k"))
      .reduce(_ && _) && col("__chunk") === col("__p_chunk")
    val joined = local.join(broadcast(prior), joinCond)
    sums.zipWithIndex.foldLeft(joined) { case (d, ((_, out), i)) =>
      d.withColumn(out,
        when(col(s"__ls$i").isNull && col(s"__ps$i").isNull, lit(null))
          .otherwise(coalesce(col(s"__ls$i"), lit(0)) + coalesce(col(s"__ps$i"), lit(0))))
    }.drop(keyCols.map(k => s"__p_$k") ++ Seq("__p_chunk", "__chunk") ++
      sums.indices.flatMap(i => Seq(s"__ps$i", s"__ls$i")): _*)
  }

  /** Adds `sg`, `sl`, `n_d` — the gain sum, loss sum, and non-null
    * diff count over the trailing `width+1`-diff frame of the
    * first-difference series of `valCol` (a decimal column): the
    * RSI/momentum shape, where the frame statistic is over DERIVED
    * per-row diffs rather than the values themselves. Equal bit for
    * bit to lag + CASE-split frame sums under the direct per-key
    * window. The halo is `width + 1` wide: a body row's frame reaches
    * `width` diffs back, and the earliest of those needs ITS
    * predecessor row for the lag. A halo row at the very edge
    * computes a null diff (no predecessor in the partition) — sound,
    * because only other halo rows' frames see it and they are
    * dropped. Keys' global first rows have no predecessor anywhere,
    * so their diff is null in both plans and `n_d` excludes it. */
  def withTrailingGainLossSums(df: DataFrame, keyCol: String, chunk: Column,
                               orderCols: Seq[String], valCol: String,
                               width: Int, blockSize: Int = 4096,
                               maxChunkRows: Int = MaxChunkRows): DataFrame =
    withTrailingEval(df, keyCol, chunk, orderCols, width + 1, blockSize,
      maxChunkRows = maxChunkRows) { (d, w) =>
      val fr = w.rowsBetween(-width, Window.currentRow)
      val diffed = d.withColumn("__df", col(valCol) - lag(col(valCol), 1).over(w))
      diffed.select(col("*"),
        sum(when(col("__df") > 0, col("__df")).otherwise(lit(0))).over(fr).as("sg"),
        sum(when(col("__df") < 0, -col("__df")).otherwise(lit(0))).over(fr).as("sl"),
        count(col("__df")).over(fr).as("n_d"))
        .drop("__df")
    }
}
