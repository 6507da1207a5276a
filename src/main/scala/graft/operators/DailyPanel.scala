package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The composed per-(instrument, day) market panel — ONE code path
  * behind the q172 batch query and the streaming incremental
  * maintainer ([[graft.streaming.StreamPipeline.panelMaintain]]), so
  * the spec can pin stream-maintained ≡ batch-computed. See q172's
  * comment for the one-window-pass/one-aggregation design and the
  * per-column exactness constructions (micro-log2, decimal dollar
  * volume, integer flow).
  */
object DailyPanel {

  private def qlog2(x: Column): Column = floor(log2(x) * lit(1e6) + lit(0.5)).cast("long")

  /** Full panel from an events-shaped frame (event_id, ts, event_type,
    * value, props). Output: one row per (event_type, day). */
  def compute(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("event_type"), col("day")).orderBy(col("ts"), col("event_id"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ln2 = lit(0.6931471805599453)
    val base = events
      .filter(col("value") > 0)
      .withColumn("day", to_date(col("ts")))
      .withColumn("lv", qlog2(col("value")))
      .withColumn("k", graft.functions.JsonField.longField(col("props"), "k"))
      .withColumn("rn", row_number().over(w))
      .withColumn("prev_lv", lag(col("lv"), 1).over(w))
      .withColumn("chg", col("value") - lag(col("value"), 1).over(w))
      .withColumn("sgn", last(
        when(col("chg") > 0, 1).when(col("chg") < 0, -1).otherwise(lit(null).cast("int")),
        ignoreNulls = true).over(wRun))
    val agg = base.groupBy(col("event_type"), col("day"))
      .agg(
        count(lit(1)).as("n_ticks"),
        max(col("value")).as("hi"), min(col("value")).as("lo"),
        min_by(col("lv"), col("rn")).as("open_lv"),
        max_by(col("lv"), col("rn")).as("close_lv"),
        sum(col("value").cast("decimal(18,4)") * col("k")).as("pv"),
        sum(col("k")).as("volume"),
        sum(when(col("prev_lv").isNotNull,
          (col("lv") - col("prev_lv")) * (col("lv") - col("prev_lv")))).as("rv_fp"),
        sum(when(col("sgn") === 1, col("k")).otherwise(0L)).as("buy_vol"),
        sum(when(col("sgn") === -1, col("k")).otherwise(0L)).as("sell_vol"))
    val dhl = (qlog2(col("hi")) - qlog2(col("lo"))).cast("double")
    val dco = (col("close_lv") - col("open_lv")).cast("double")
    def r4(c: Column): Column = floor(c * lit(10000d) + lit(0.5d)) / lit(10000d)
    agg.select(col("event_type"), col("day"), col("n_ticks"),
      col("hi"), col("lo"), col("volume"),
      when(col("volume") > 0,
        r4(col("pv").cast("double") / col("volume").cast("double"))).as("vwap"),
      r4(dco / lit(1e6)).as("ret_cc"),
      r4(sqrt(coalesce(col("rv_fp"), lit(0L)).cast("double")) / lit(1e6)).as("rv"),
      r4(dhl / lit(1e6) * sqrt(lit(0.6931471805599453)) / lit(2d)).as("park_vol"),
      r4(ln2 * lit(1e-6) * sqrt(greatest(lit(0d),
        lit(0.5) * dhl * dhl - (lit(2d) * ln2 - lit(1d)) * dco * dco))).as("gk_vol"),
      when(col("buy_vol") + col("sell_vol") > 0,
        r4((col("buy_vol") - col("sell_vol")).cast("double")
          / (col("buy_vol") + col("sell_vol")).cast("double"))).as("ofi"))
  }
}
