package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling to a regular grid with
  * last-observation-carried-forward — the missing-data step every
  * downstream model join needs (training pipelines resample event
  * streams before feature joins; the reference's windowed metrics
  * leave gaps wherever a slide has no ticks).
  *
  * Physical shape, in order:
  *   1. bin-collapse: one partial-agg shuffle keyed (key, bin) picks
  *      the last observation per bin via max_by over a total order —
  *      this is the only pass over the raw (large) input;
  *   2. span: per-key min/max bin — a tiny aggregate on the collapsed
  *      table;
  *   3. grid: explode(sequence(t0, t1, step)) per key — one array per
  *      KEY, not per row. The array length is span/step; for grids
  *      beyond ~10^6 bins per key (decade-long spans at second
  *      resolution) chunk by a coarser unit first (e.g. generate
  *      day rows, then sequence within the day) — same two-level
  *      trick as salting;
  *   4. LOCF: last(ignoreNulls) over (key ORDER BY bin) — per-key
  *      sequential by nature (each bin depends on its predecessors);
  *      the partition is the GRID (bounded by span/step), not the raw
  *      data, so the sort is over already-collapsed rows.
  */
object GapFill {

  /** Resample `df` to a `unit` grid ("minute"/"hour"/"day") per key.
    * `order` breaks intra-bin ties (must totally order rows within a
    * bin, e.g. Seq(tsCol, idCol)); rows with null `valueCol` are
    * ignored as observations. Output: keyName, bin, value (carried
    * forward; null before the first observation — the grid starts at
    * each key's first observed bin so this only happens when
    * `valueCol` was all-null in the opening bin), is_observed. */
  def locf(df: DataFrame, keyCol: Column, keyName: String, tsCol: Column,
           valueCol: Column, order: Seq[Column], unit: String = "minute"): DataFrame = {
    val step = expr(s"interval 1 $unit")
    val perBin = df.filter(valueCol.isNotNull)
      .groupBy(keyCol.as(keyName), date_trunc(unit, tsCol).as("bin"))
      .agg(max_by(valueCol, struct(order: _*)).as("v_obs"))
    val spans = perBin.groupBy(col(keyName))
      .agg(min(col("bin")).as("t0"), max(col("bin")).as("t1"))
    val grid = spans.select(col(keyName),
      explode(sequence(col("t0"), col("t1"), step)).as("bin"))
    grid.join(perBin, Seq(keyName, "bin"), "left")
      .select(col(keyName), col("bin"),
        last(col("v_obs"), ignoreNulls = true)
          .over(Window.partitionBy(col(keyName)).orderBy(col("bin"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("value"),
        col("v_obs").isNotNull.as("is_observed"))
  }
}
