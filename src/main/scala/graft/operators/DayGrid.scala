package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared day-grid series builder for the `collect_list`-then-fold
  * diagnostics family (ACF/Ljung-Box, PACF, Mann-Kendall, Hurst R/S,
  * Theil-Sen).
  *
  * These queries all fold a PER-KEY ARRAY of day-grid values — some
  * with O(n·lag), O(n·m), or C(n,2) folds — and are volume-independent
  * ONLY because the input contract is one row per (key, day) (the
  * q221/DailyCloses argument: 30 years of days is ~11k longs ≈ 88 KB
  * per key). A caller feeding TICK-grain rows would build per-key
  * arrays the size of the volume and run an n²≈10¹³-op fold; the guard
  * here fails any per-key series longer than [[MaxSeriesLen]] with a
  * grain-contract message BEFORE the fold runs — a wrong-grain feed
  * dies loudly, not as an inscrutable executor OOM. Hoisted from
  * `MarketQueries.acfLagFrame` (round-12 item 6) so every array-fold
  * path shares ONE guarded entry point (round-13 Next #3).
  */
object DayGrid {

  /** Loud-failure bound on a per-key series. Day-grain decades are
    * ~11k rows; even minute-grain decades stay ≤ ~5.3M — the bound
    * catches tick-grain feeds (volume-sized) while never tripping on
    * a legal day grid. Same value `acfLagFrame` shipped with. */
  val MaxSeriesLen = 4000000

  /** The guarded size column: `size(ps)` as long, or a loud
    * grain-contract `raise_error` past [[MaxSeriesLen]]. */
  def guardedSize(caller: String, key: Column, ps: Column,
                  maxLen: Int = MaxSeriesLen): Column =
    when(size(ps) <= lit(maxLen), size(ps).cast("long"))
      .otherwise(raise_error(concat(lit(
        s"$caller: per-key series exceeds $maxLen rows — " +
          "input must be day-grid (one row per (key, day)), " +
          "not tick-grain; got "), size(ps).cast("string"),
        lit(" rows for key "), key.cast("string"))).cast("long"))

  /** One guarded day-grid series per key: `(keyCol, ps, xs, n)` where
    * `ps` is the day-sorted `struct(dayCol, valCol)` array, `xs` the
    * projected value array (in day order), and `n` the GUARDED length
    * as long — reading `n` (or anything derived from it) past the
    * bound raises the grain-contract error before any fold runs.
    * Callers fold over `xs` and must gate their folds on `n` (every
    * current consumer does — the fold expressions read `n`, so the
    * guard is on the evaluation path). */
  def series(df: DataFrame, keyCol: String, dayCol: String,
             valCol: String, caller: String,
             maxLen: Int = MaxSeriesLen): DataFrame =
    df.select(col(keyCol), struct(col(dayCol), col(valCol)).as("p"))
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(col("p"))).as("ps"))
      .withColumn("xs", expr(s"transform(ps, p -> p.$valCol)"))
      .withColumn("n", guardedSize(caller, col(keyCol), col("ps"), maxLen))
}
