package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Round-7 market-analytics surface — the time-series statistics a
  * stock pipeline (the reference's domain,
  * /root/reference/src/spark/spark_stream_processor.py) layers on top
  * of its OHLCV/sliding-window base: bounded-frame rolling bands
  * (Bollinger), running-peak drawdown, and a pairwise correlation
  * matrix over aligned per-minute series. All three are oracle-checked
  * against DuckDB; every sum that crosses a shuffle or a window frame
  * goes through fixed-point decimal so results are partition- and
  * frame-evaluation-order invariant (the graft-oracle-parity rule),
  * and every double expression is the SAME IEEE op sequence on both
  * engines, so values agree bitwise before the cosmetic r4.
  */
object MarketQueries {

  private def ev(s: SparkSession, dir: String) = Tables.events(s, dir)

  /** Micro-log2 fixed point: each price's log2 quantized ONCE to
    * integer micro-units (the q81 fixed-point-transcendental rule), so
    * downstream differences/sums are exact integers — partition- and
    * frame-order free — and both engines agree bitwise. */
  private def qlog2(x: Column): Column = floor(log2(x) * lit(1e6) + lit(0.5)).cast("long")

  // q108 — BOLLINGER BANDS: trailing 20-row mean / sample stddev per
  // event_type, the first BOUNDED window frame in the battery (every
  // prior frame is unbounded-preceding). Variance comes from exact
  // decimal frame sums (sum v, sum v^2) — a double sliding sum would
  // make the result depend on the engine's frame-evaluation strategy
  // (Spark re-scans the buffer, DuckDB uses a segment tree; different
  // summation orders) — then one double op sequence both engines
  // replay bitwise. greatest(0, var) guards the classic all-equal
  // frame, where cancellation can leave var at -1 ulp and sqrt would
  // NaN. Scale shape: two bounded shuffles (hour-chunks, then row
  // blocks) with per-BLOCK sorts — parallelism scales with volume,
  // not with the key count (see ChunkedFrame).
  private def q108(s: SparkSession, dir: String): DataFrame = {
    // The frame evaluates through ChunkedFrame (two-level blocks with
    // a 19-row halo) instead of Window.partitionBy(event_type): a
    // direct per-key window sorts one task per event type — 2M
    // rows/task at the 100x probe with this feed's FIVE types. Exact
    // decimal frame sums make the chunked evaluation bit-identical to
    // the single window (same reason they make it engine-portable).
    val base = graft.operators.ChunkedFrame.withTrailingDecimalSums(
      ev(s, dir).withColumn("vd", col("value").cast("decimal(18,4)"))
        .select(col("event_id"), col("event_type"), col("ts"), col("vd")),
      keyCol = "event_type", chunk = date_trunc("hour", col("ts")),
      orderCols = Seq("ts", "event_id"), valCol = "vd", width = 19)
    val n  = col("n_w").cast("double")
    val s1 = col("s1").cast("double")
    val s2 = col("s2").cast("double")
    val ma = s1 / n
    val sd = sqrt(greatest(lit(0d), (s2 - (s1 * s1) / n) / (n - lit(1d))))
    base.select(
      col("event_id"), col("event_type"), col("n_w"),
      r4(ma).as("ma"),
      when(col("n_w") > 1, r4(sd)).as("sd"),
      when(col("n_w") > 1, r4(ma - lit(2d) * sd)).as("lo_band"),
      when(col("n_w") > 1, r4(ma + lit(2d) * sd)).as("hi_band"))
  }

  // q109 — RUNNING-PEAK DRAWDOWN: per event_type, the running maximum
  // of the series and the relative drop from it, summarized to each
  // type's maximum drawdown — the risk metric every price pipeline
  // reports. max() is order-free, so the per-row peak needs no decimal
  // detour; the per-row ratio is one IEEE division of identical
  // doubles. The zero-peak guard covers leading all-zero prefixes
  // (value >= 0 in this feed): drawdown is 0 by convention there on
  // both engines, instead of an engine-specific 0/0. Scale shape: the
  // running peak evaluates through ChunkedFrame.withRunningMax — a
  // direct Window.partitionBy(event_type) would sort each key's
  // ENTIRE history in one task (five event types at 100x = five
  // ~2M-row tasks, the q108 ceiling); the two-level prefix-max keeps
  // parallelism proportional to volume/chunk. max is exact on
  // doubles, so chunked ≡ direct bitwise (ChunkedFrameSpec pins it);
  // the 5-row summary re-aggregates map-side.
  private def q109(s: SparkSession, dir: String): DataFrame = {
    graft.operators.ChunkedFrame.withRunningMax(
      ev(s, dir).select(col("event_type"), col("ts"), col("event_id"), col("value")),
      keyCol = "event_type", chunk = date_trunc("hour", col("ts")),
      orderCols = Seq("ts", "event_id"), valCol = "value", outCol = "peak")
      .select(col("event_type"), col("value"), col("peak"))
      .withColumn("dd",
        when(col("peak") > 0, (col("peak") - col("value")) / col("peak"))
          .otherwise(lit(0d)))
      .groupBy(col("event_type"))
      .agg(
        r4(max(col("peak"))).as("max_peak"),
        r4(max(col("dd"))).as("max_dd"),
        count(lit(1)).as("n_rows"))
  }

  // q110 — PAIRWISE CORRELATION MATRIX over minute-binned series: the
  // cross-asset dependence table (beta/hedging input). Built-in
  // corr() is a running double recurrence — partition-order dependent
  // on BOTH engines — so the query quantizes each (type, minute) mean
  // to integer micro-units (Pearson is invariant under uniform
  // scaling) and feeds EXACT integer-decimal sums (sx, sy, sxy, sxx,
  // syy) into one final double formula. Scale shape: the (type ×
  // minute) pre-aggregate is volume-independent (the bin grid is
  // fixed by the time range); the self-join on bin pairs types, and
  // the pair aggregate is |types|² rows. The den > 0 guard covers a
  // constant-on-shared-bins series, where the formula's denominator
  // is exactly 0 (exact sums, no ulp noise) and corr is undefined.
  private def q110(s: SparkSession, dir: String): DataFrame = {
    val m = ev(s, dir)
      .groupBy(col("event_type"), date_trunc("minute", col("ts")).as("bin"))
      .agg(sum(col("value").cast("decimal(18,4)")).as("sv"), count(lit(1)).as("n"))
      .select(col("event_type"), col("bin"),
        floor(col("sv").cast("double") / col("n") * lit(1000000d) + lit(0.5d))
          .cast("decimal(18,0)").as("mu"))
    val a = m.select(col("event_type").as("type_a"), col("bin"), col("mu").as("mua"))
    val b = m.select(col("event_type").as("type_b"), col("bin"), col("mu").as("mub"))
    val p = a.join(b, Seq("bin")).filter(col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n_bins"),
        sum(col("mua")).as("sx"), sum(col("mub")).as("sy"),
        sum(col("mua") * col("mub")).as("sxy"),
        sum(col("mua") * col("mua")).as("sxx"),
        sum(col("mub") * col("mub")).as("syy"))
    def d(c: Column) = c.cast("double")
    val nb  = d(col("n_bins"))
    val num = nb * d(col("sxy")) - d(col("sx")) * d(col("sy"))
    val den = sqrt(nb * d(col("sxx")) - d(col("sx")) * d(col("sx"))) *
      sqrt(nb * d(col("syy")) - d(col("sy")) * d(col("sy")))
    p.select(col("type_a"), col("type_b"), col("n_bins"),
      when(den > 0, r4(num / den)).as("corr_r"))
  }

  // q125 — TWAP (time-weighted average price) per instrument per day:
  // the execution-quality benchmark every trading desk reports — each
  // tick's price is weighted by how long it REMAINED the price
  // (microseconds until the next tick, day-end capped for the last
  // one), so a price that held for hours dominates one that flickered
  // for a second — the property the plain mean (q06's close/avg) has
  // no notion of. Exact arithmetic end to end: integer microsecond
  // weights x decimal prices, one double division at the very end
  // (r4-quantized). Scale shape: one (type, day) window for the lead,
  // then a partial-agg shuffle on the same key — weight derivation is
  // a 1-row lookahead, so a skewed instrument parallelizes by day.
  private def q125(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"), col("day"))
      .orderBy(col("ts"), col("event_id"))
    ev(s, dir)
      .withColumn("day", date_trunc("day", col("ts")))
      .withColumn("t_us", unix_micros(col("ts")))
      .withColumn("end_us", unix_micros(col("day") + expr("INTERVAL 1 DAY")))
      .withColumn("next_us", coalesce(lead(col("t_us"), 1).over(w), col("end_us")))
      .withColumn("w_us", col("next_us") - col("t_us"))
      .groupBy(col("event_type"), col("day"))
      .agg(
        r4(sum(col("value").cast("decimal(18,4)") * col("w_us")).cast("double")
          / sum(col("w_us")).cast("double")).as("twap"),
        count(lit(1)).as("n_rows"))
      .select(col("event_type"), col("day").cast("date").as("day"),
        col("twap"), col("n_rows"))
  }

  // q126 — VWAP (volume-weighted average price) per instrument per
  // day, the companion benchmark to q125's TWAP: each tick's price is
  // weighted by its traded size rather than its hold time. The size
  // rides in the feed's JSON props blob (`{"k": N}`) — so this query
  // is also the battery's JSON-path-extraction-into-arithmetic probe
  // (the reference parses the same shape at ingest,
  // spark_stream_processor.py's value_json path). Exact arithmetic:
  // decimal price x integer size, one double division at the end.
  // Scale shape: the size extraction is graft's json_long_field — a
  // zero-allocation byte scan inlined into codegen (built-in
  // get_json_object builds a Jackson parser PER ROW; a 100x probe
  // thread-sample showed that allocation storm costing 80-220 s vs
  // ~3 s of aggregate work — see JsonField.scala) — then ONE
  // partial-agg shuffle on
  // (type, day) — map-side combine reduces each task to its local
  // (type, day) partials before anything moves.
  private def q126(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .withColumn("day", date_trunc("day", col("ts")))
      .withColumn("k", graft.functions.JsonField.longField(col("props"), "k"))
      .groupBy(col("event_type"), col("day"))
      .agg(
        sum(col("value").cast("decimal(18,4)") * col("k")).as("pv"),
        sum(col("k")).as("volume"),
        count(lit(1)).as("n_rows"))
      .select(col("event_type"), col("day").cast("date").as("day"),
        when(col("volume") > 0,
          r4(col("pv").cast("double") / col("volume").cast("double"))).as("vwap"),
        col("volume"), col("n_rows"))

  // q128 — STOCHASTIC OSCILLATOR %K-14 / %D-3 per instrument: where
  // TODAY'S close sits inside the last 14 days' high-low range
  // (Lane's %K), smoothed by a 3-day SMA (%D) — the overbought/
  // oversold companion every charting package draws next to q129's
  // RSI. Exactness: prices quantize ONCE to the cent grid; the daily
  // (hi, lo, close) triple is exact integer (close by max struct
  // (ts, event_id) — the DailyCloses tie-break, arg_max(vc, rn) in
  // the oracle); %K is a pure integer rounded ratio
  // k_fp = (2·(c−l)·10⁶ + (h−l)) DIV (2·(h−l))  [= floor(x+0.5)]
  // and %D averages THREE k_fp integers as (2·Σ + 3) DIV 6 — no
  // float ever crosses rows, the only IEEE op is the final /1e4
  // display divide. Cents are domain-bounded (price magnitude, not
  // volume), so the LONG products hold at any corpus size. Flat
  // 14-day windows (h = l) have no %K by convention (NULL, as on
  // every charting package); %D requires three CONSECUTIVE defined
  // %K rows (both counts pinned — Spark window sums skip NULLs, so
  // an unguarded sum would fabricate a %D from two values). Rows
  // emit only with a full 14-day frame (warm-up undefined, the q129
  // rule). Scale shape: ONE volume-sized partial agg to the
  // (instrument, day) grid, then 14-row/3-row windows over day-grid
  // rows partitioned by instrument — |days| per type (the
  // q221/DailyCloses argument), never a volume-sized sort.
  private def q128(s: SparkSession, dir: String): DataFrame =
    stochastic(ev(s, dir))

  /** q128's closing over any (event_type, ts, event_id, value) feed. */
  private[graft] def stochastic(e: DataFrame): DataFrame = {
    val wd = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val w14 = wd.rowsBetween(-13, 0)
    val w3 = wd.rowsBetween(-2, 0)
    e
      .filter(col("value").isNotNull)
      .withColumn("day", to_date(col("ts")))
      .withColumn("vc", floor(col("value") * lit(100d) + lit(0.5d)).cast("long"))
      .groupBy(col("event_type"), col("day"))
      .agg(max(col("vc")).as("hi"), min(col("vc")).as("lo"),
        max(struct(col("ts"), col("event_id"), col("vc")))
          .getField("vc").as("close_c"))
      .withColumn("h14", max(col("hi")).over(w14))
      .withColumn("l14", min(col("lo")).over(w14))
      .withColumn("nw", count(lit(1)).over(w14))
      .filter(col("nw") === 14)
      .withColumn("k_fp", when(col("h14") > col("l14"),
        expr("(2 * (close_c - l14) * 1000000 + (h14 - l14)) DIV (2 * (h14 - l14))")))
      .withColumn("sum3", sum(col("k_fp")).over(w3))
      .withColumn("nk3", count(col("k_fp")).over(w3))
      .withColumn("nr3", count(lit(1)).over(w3))
      .select(col("event_type"), col("day"), col("close_c"),
        col("h14").as("h14_c"), col("l14").as("l14_c"),
        (col("k_fp").cast("double") / lit(1e4)).as("pct_k_r4"),
        when(col("nk3") === 3 && col("nr3") === 3,
          expr("(2 * sum3 + 3) DIV 6").cast("double") / lit(1e4)).as("pct_d_r4"))
  }

  // q129 — RSI-14 (Cutler's SMA variant) per instrument: the
  // overbought/oversold oscillator. Cutler's form uses simple moving
  // averages of gains/losses — unlike Wilder's recursive smoothing it
  // is a pure bounded-frame statistic, so the same exact-decimal
  // frame-sum discipline as q108 applies: per-tick diffs in decimal
  // (lag 1), gains/losses split per row, 14-row trailing sums, ONE
  // double op sequence at the end. Rows emit only once a full 14-diff
  // frame exists (the warm-up prefix is undefined on every charting
  // package too). sl = 0 (no losses in the window) is RSI 100 by
  // convention on both engines — exact decimal sums make the zero
  // test exact, not ulp-lucky. Scale shape: like q108, the frame
  // evaluates through ChunkedFrame (two-level blocks, width+1 halo so
  // the earliest in-frame diff still sees its lag predecessor) — a
  // direct Window.partitionBy(event_type) sorts one task per
  // instrument, this feed's five-key per-key ceiling at 100x. Exact
  // decimal diffs/sums make the chunked evaluation bit-identical to
  // the single window. Each key's global first row has a null diff in
  // both plans; n_d counts non-null diffs, so the n_d = 14 gate
  // reproduces the filter-then-frame semantics exactly.
  private def q129(s: SparkSession, dir: String): DataFrame =
    graft.operators.ChunkedFrame.withTrailingGainLossSums(
      ev(s, dir).withColumn("vd", col("value").cast("decimal(18,4)"))
        .select(col("event_id"), col("event_type"), col("ts"), col("vd")),
      keyCol = "event_type", chunk = date_trunc("hour", col("ts")),
      orderCols = Seq("ts", "event_id"), valCol = "vd", width = 13)
      .filter(col("n_d") === 14)
      .select(col("event_id"), col("event_type"),
        when(col("sl") > 0,
          r4(lit(100d) - lit(100d) /
            (lit(1d) + col("sg").cast("double") / col("sl").cast("double"))))
          .otherwise(lit(100d)).as("rsi"))

  // q153 — DAILY REALIZED VOLATILITY: per (instrument, day), the sum
  // of squared intraday log returns and its square root — the
  // standard RV estimator high-frequency risk systems compute nightly
  // (Andersen & Bollerslev realized-variance construction). Returns
  // are micro-log2 integers: each price's log2 is quantized ONCE
  // (the q81 fixed-point-transcendental rule) so the return is an
  // integer difference, RV an exact integer sum — partition- and
  // frame-order free; the single closing sqrt is IEEE-exact on both
  // engines. Scale shape: the lag runs per (instrument, DAY) — the
  // q125 TWAP precedent: key cardinality grows with the data span, so
  // partition size is bounded by ticks/day/instrument at any corpus
  // size (unlike the all-history-per-key shape q109 had to escape).
  private def q153(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"), col("day")).orderBy(col("ts"), col("event_id"))
    ev(s, dir)
      .filter(col("value") > 0)
      .withColumn("day", to_date(col("ts")))
      .withColumn("lv", qlog2(col("value")))
      .withColumn("prev", lag("lv", 1).over(w))
      .filter(col("prev").isNotNull)
      .withColumn("r_fp", col("lv") - col("prev"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n_returns"), sum(col("r_fp") * col("r_fp")).as("rv_fp"))
      .withColumn("vol", r4(sqrt(col("rv_fp").cast("double")) / lit(1e6)))
  }

  // q154 — DRAWDOWN EPISODES (time under water): contiguous runs of
  // rows below the running peak, per instrument — start/end, length,
  // and maximum relative depth of every underwater episode (the
  // recovery-time readout next to q109's per-row drawdown). The
  // classic gaps-and-islands identity (island = global position −
  // position among underwater rows) runs ENTIRELY on ChunkedFrame
  // primitives: withRunningMax for the peak and globalRank twice for
  // the two positions — zero bare per-key windows, so the five-key
  // event feed never serializes into five tasks at any volume (the
  // exact q108/q109 ceiling this family exists to avoid). The
  // 0-based/1-based rank offset between engines cancels in the
  // island DIFFERENCE. Depth compares/divides doubles (no sums), so
  // results are order-free without a decimal detour.
  private def q154(s: SparkSession, dir: String): DataFrame = {
    val cf = graft.operators.ChunkedFrame
    val hour = date_trunc("hour", col("ts"))
    val base = ev(s, dir).select(col("event_id"), col("ts"), col("event_type"), col("value"))
    val peaked = cf.withRunningMax(base, "event_type", hour,
      Seq("ts", "event_id"), "value", "peak")
    val ranked = cf.globalRank(peaked, "event_type", hour, Seq("ts", "event_id"))
      .withColumnRenamed("__g", "g_all")
    val under = ranked.filter(col("value") < col("peak"))
    cf.globalRank(under, "event_type", hour, Seq("ts", "event_id"))
      .withColumn("island", col("g_all") - col("__g"))
      .groupBy(col("event_type"), col("island"))
      .agg(min(col("ts")).as("start_ts"), max(col("ts")).as("end_ts"),
        count(lit(1)).as("n_rows"),
        r4(max((col("peak") - col("value")) / col("peak"))).as("max_dd"))
      .drop("island")
  }

  // q155 — INTRADAY VOLATILITY SEASONALITY: mean and max absolute
  // log return by (instrument, hour-of-day) — the U-shape profile
  // (open/close volatility concentration) that drives intraday risk
  // limits and execution scheduling. Same exact micro-log2 return
  // construction as q153 (quantize each price's log2 once, integer
  // differences after), same span-bounded (instrument, day) lag; the
  // mean closes as one integer-ratio division. Output is
  // |instruments| x 24 rows from one partial-agg shuffle.
  private def q155(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"), col("day")).orderBy(col("ts"), col("event_id"))
    ev(s, dir)
      .filter(col("value") > 0)
      .withColumn("day", to_date(col("ts")))
      .withColumn("lv", qlog2(col("value")))
      .withColumn("prev", lag("lv", 1).over(w))
      .filter(col("prev").isNotNull)
      .withColumn("hod", hour(col("ts")))
      .withColumn("ar", abs(col("lv") - col("prev")))
      .groupBy(col("event_type"), col("hod"))
      .agg(count(lit(1)).as("n_returns"), sum(col("ar")).as("sa_fp"), max(col("ar")).as("max_fp"))
      .select(col("event_type"), col("hod"), col("n_returns"),
        r4(col("sa_fp").cast("double") / (col("n_returns").cast("double") * lit(1e6))).as("mean_abs_ret"),
        r4(col("max_fp").cast("double") / lit(1e6)).as("max_abs_ret"))
  }

  // q156 — ON-BALANCE VOLUME (Granville's OBV): per instrument, the
  // running sum of signed volume (+vol on an uptick, −vol on a
  // downtick, 0 flat/first) — the classic accumulation/distribution
  // indicator, and the query that exercises BOTH unbounded
  // ChunkedFrame siblings end to end: the tick sign needs lag-1
  // (withTrailingEval, halo 1) and the accumulation needs the
  // running SUM (withRunningSum — exact long arithmetic, so the
  // chunk-split partial sums reassociate bit for bit). Volume is the
  // props JSON `k` field (the q126 precedent). Zero bare per-key
  // windows: the five-instrument feed keeps volume-wide parallelism
  // through both passes.
  private def q156(s: SparkSession, dir: String): DataFrame = {
    val cf = graft.operators.ChunkedFrame
    val hour = date_trunc("hour", col("ts"))
    val base = ev(s, dir).select(col("event_id"), col("ts"), col("event_type"), col("value"),
      graft.functions.JsonField.longField(col("props"), "k").as("vol"))
    val flowed = cf.withTrailingEval(base, "event_type", hour,
        Seq("ts", "event_id"), haloWidth = 1) { (d, w) =>
      d.withColumn("__df", col("value") - lag(col("value"), 1).over(w))
        .withColumn("flow", when(col("__df") > 0, col("vol"))
          .when(col("__df") < 0, -col("vol")).otherwise(lit(0L)))
        .drop("__df")
    }
    cf.withRunningSum(flowed, "event_type", hour, Seq("ts", "event_id"), "flow", "obv")
      .select(col("event_id"), col("event_type"), col("obv"))
  }

  // q157 — PARKINSON RANGE VOLATILITY per (instrument, day): the
  // high-low range estimator (Parkinson 1980) — sigma =
  // ln(H/L) / (2*sqrt(ln 2)) — which extracts ~5x more efficiency per
  // day than close-to-close because the intraday EXTREMES carry the
  // information; the companion estimator to q153's sum-of-squared
  // intraday returns (RV needs every tick, Parkinson needs two numbers
  // per day — the 100 TB trade is real: this one aggregates to
  // |instruments| x |days| rows in ONE partial-agg shuffle). hi/lo are
  // exact max/min (order-free); each extreme's log2 is quantized ONCE
  // to micro-units (the q153/q155 rule) so the range is an integer
  // difference, and the closing constant sqrt(ln 2)/2 is one IEEE
  // sqrt of the shared ln-2 double literal — the identical op
  // sequence on both engines.
  private def q157(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .filter(col("value") > 0)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(max(col("value")).as("hi"), min(col("value")).as("lo"),
        count(lit(1)).as("n_ticks"))
      .withColumn("d_fp", qlog2(col("hi")) - qlog2(col("lo")))
      .select(col("event_type"), col("day"), col("n_ticks"), col("hi"), col("lo"),
        r4(col("d_fp").cast("double") / lit(1e6) * sqrt(lit(0.6931471805599453)) / lit(2d))
          .as("park_vol"))

  // q158 — AMIHUD ILLIQUIDITY per instrument: mean over days of
  // |daily log return| / dollar volume (Amihud 2002) — the standard
  // price-impact-per-traded-dollar proxy liquidity desks and academic
  // factor pipelines compute from daily data. Open/close are the
  // first/last tick of each (instrument, day) under the total
  // (ts, event_id) order — selected with arg-min/max over the
  // partition row_number, NOT distinct-on (the engine-portable
  // deterministic-survivor rule); the return is an exact micro-log2
  // integer difference; dollar volume is an exact decimal sum of
  // price x size (the q126 JSON-props size field). Each day's
  // illiquidity ratio (scaled to per-million-dollar units) is ONE
  // IEEE division both engines replay bitwise, then quantized to
  // integer micro-units BEFORE the cross-day mean — the
  // fixed-point-before-reaggregation rule that keeps the final
  // per-instrument mean an exact integer ratio. Scale shape: one
  // (instrument, day) window for rn (span-bounded partitions — the
  // q125/q153 precedent), one partial-agg shuffle, then a 5-row
  // rollup; nothing scales with tick volume past the first pass.
  private def q158(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"), col("day")).orderBy(col("ts"), col("event_id"))
    val daily = ev(s, dir)
      .filter(col("value") > 0)
      .withColumn("day", to_date(col("ts")))
      .withColumn("lv", qlog2(col("value")))
      .withColumn("k", graft.functions.JsonField.longField(col("props"), "k"))
      .withColumn("rn", row_number().over(w))
      .groupBy(col("event_type"), col("day"))
      .agg(
        min_by(col("lv"), col("rn")).as("open_lv"),
        max_by(col("lv"), col("rn")).as("close_lv"),
        sum(col("value").cast("decimal(18,4)") * col("k")).as("dvol"),
        count(lit(1)).as("n_ticks"))
      .filter(col("dvol") > 0)
      .withColumn("ret_fp", abs(col("close_lv") - col("open_lv")))
      .withColumn("iq",
        floor(col("ret_fp").cast("double") / lit(1e6) / col("dvol").cast("double")
          * lit(1e6) * lit(1e6) + lit(0.5)).cast("long"))
    daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        r4(sum(col("iq")).cast("double") / (count(lit(1)).cast("double") * lit(1e6)))
          .as("mean_illiq"),
        r4(max(col("iq")).cast("double") / lit(1e6)).as("max_illiq"))
  }

  // q159 — ROLLING 20-DAY BETA/CORRELATION vs the equal-weight market:
  // each instrument's trailing regression slope against the
  // cross-sectional mean return — the hedge-ratio/market-sensitivity
  // readout (next to q110's full-history pairwise matrix, this is the
  // time-VARYING form risk systems actually chart). Daily
  // close-to-close returns in exact micro-log2 integers; the market
  // return is the per-day cross-instrument mean quantized once to an
  // integer (floor(avg + 0.5) — beta/corr are invariant to the shared
  // 1e-6 scale); all five trailing sums (x, y, x², y², xy) are exact
  // integer window sums, closed by one double formula per row. Scale
  // shape: every window here runs on DAY-GRAIN rows — |instruments| x
  // |days| = volume-independent (the feed's span is fixed; at 100x the
  // tick count grows, the day grid does not — the q110 bin-grid
  // argument), so bare per-key windows are the RIGHT plan: the
  // volume-sized work is exactly one (instrument, day) partial-agg
  // pass, and everything after fits on one executor at any corpus
  // size.
  private def q159(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"), col("day")).orderBy(col("ts"), col("event_id"))
    val closes = ev(s, dir)
      .filter(col("value") > 0)
      .withColumn("day", to_date(col("ts")))
      .withColumn("lv", qlog2(col("value")))
      .withColumn("rn", row_number().over(w))
      .groupBy(col("event_type"), col("day"))
      .agg(max_by(col("lv"), col("rn")).as("close_lv"))
    val wd = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val rets = closes
      .withColumn("prev", lag(col("close_lv"), 1).over(wd))
      .filter(col("prev").isNotNull)
      .withColumn("r_fp", col("close_lv") - col("prev"))
      .select(col("event_type"), col("day"), col("r_fp"))
    val mkt = rets.groupBy(col("day"))
      .agg(floor(sum(col("r_fp")).cast("double") / count(lit(1)).cast("double") + lit(0.5))
        .cast("long").as("m_fp"))
    val wf = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-19, Window.currentRow)
    val sums = rets.join(mkt, Seq("day"))
      .withColumn("n_w", count(lit(1)).over(wf))
      .withColumn("sx", sum(col("m_fp")).over(wf))
      .withColumn("sy", sum(col("r_fp")).over(wf))
      .withColumn("sxx", sum(col("m_fp") * col("m_fp")).over(wf))
      .withColumn("syy", sum(col("r_fp") * col("r_fp")).over(wf))
      .withColumn("sxy", sum(col("m_fp") * col("r_fp")).over(wf))
      .filter(col("n_w") === 20)
    def d(c: Column) = c.cast("double")
    val n = d(col("n_w"))
    val num  = n * d(col("sxy")) - d(col("sx")) * d(col("sy"))
    val denB = n * d(col("sxx")) - d(col("sx")) * d(col("sx"))
    val denC = sqrt(n * d(col("sxx")) - d(col("sx")) * d(col("sx"))) *
      sqrt(n * d(col("syy")) - d(col("sy")) * d(col("sy")))
    sums.select(col("event_type"), col("day"),
      when(denB =!= 0, r4(num / denB)).as("beta"),
      when(denC > 0, r4(num / denC)).as("corr_r"))
  }

  // q165 — GARMAN-KLASS VOLATILITY per (instrument, day): the
  // OHLC-complete range estimator (Garman & Klass 1980) — sigma² =
  // 0.5·ln(H/L)² − (2·ln2 − 1)·ln(C/O)² — which improves on
  // Parkinson (q157) by correcting the range term with the open-close
  // drift, closing out the battery's volatility-estimator family
  // (q153 tick RV needs every tick, q157 needs hi/lo, this needs the
  // four OHLC numbers). hi/lo are exact extrema, open/close the
  // deterministic first/last under (ts, event_id) (the q158
  // arg-min/max-over-row_number rule); all four log2s quantize ONCE
  // to micro-units so both squared terms are exact-integer squares
  // (d² ≤ (16e6)² < 2^53 — exactly representable), and the closing
  // sqrt + ln2 scale is one shared IEEE sequence. greatest(0, ·)
  // guards the estimator's known negative region (large drift, small
  // range). Scale shape: one (instrument, day) window for rn + one
  // partial-agg shuffle — the q158 span-bounded pattern; output is
  // the fixed (instrument x day) grid at any tick volume.
  private def q165(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"), col("day")).orderBy(col("ts"), col("event_id"))
    val ln2 = lit(0.6931471805599453)
    ev(s, dir)
      .filter(col("value") > 0)
      .withColumn("day", to_date(col("ts")))
      .withColumn("lv", qlog2(col("value")))
      .withColumn("rn", row_number().over(w))
      .groupBy(col("event_type"), col("day"))
      .agg(
        max(col("value")).as("hi"), min(col("value")).as("lo"),
        min_by(col("lv"), col("rn")).as("open_lv"),
        max_by(col("lv"), col("rn")).as("close_lv"),
        count(lit(1)).as("n_ticks"))
      .withColumn("dhl", (qlog2(col("hi")) - qlog2(col("lo"))).cast("double"))
      .withColumn("dco", (col("close_lv") - col("open_lv")).cast("double"))
      .select(col("event_type"), col("day"), col("n_ticks"),
        r4(ln2 * lit(1e-6) * sqrt(greatest(lit(0d),
          lit(0.5) * col("dhl") * col("dhl")
            - (lit(2d) * ln2 - lit(1d)) * col("dco") * col("dco")))).as("gk_vol"))
  }

  // q167 — ORDER-FLOW IMBALANCE per (instrument, day) under the tick
  // rule (Lee & Ready 1991's tick test): an uptick classifies the
  // trade as buyer-initiated, a downtick seller-initiated, and a
  // zero-tick INHERITS the last non-zero direction — the standard
  // trade-signing convention when quote data is absent. OFI =
  // (buyVol − sellVol)/(buyVol + sellVol) is the daily
  // pressure-imbalance readout next to q156's running OBV. The
  // inherited sign is last_value-ignore-nulls over the unbounded
  // frame — exact on both engines because the sign is an INTEGER
  // (no arithmetic accumulates); the leading unsigned run (before
  // any price change) contributes no flow by construction. Volumes
  // are exact integer sums of the json_long_field size; the closing
  // ratio is one IEEE division. Scale shape: one span-bounded
  // (instrument, day) window (the q125/q158 precedent) + one
  // partial-agg shuffle to the day grid.
  private def q167(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"), col("day")).orderBy(col("ts"), col("event_id"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev(s, dir)
      .withColumn("day", to_date(col("ts")))
      .withColumn("k", graft.functions.JsonField.longField(col("props"), "k"))
      .withColumn("chg", col("value") - lag(col("value"), 1).over(w))
      .withColumn("sgn_raw",
        when(col("chg") > 0, 1).when(col("chg") < 0, -1).otherwise(lit(null).cast("int")))
      .withColumn("sgn", last(col("sgn_raw"), ignoreNulls = true).over(wRun))
      .groupBy(col("event_type"), col("day"))
      .agg(
        sum(when(col("sgn") === 1, col("k")).otherwise(0L)).as("buy_vol"),
        sum(when(col("sgn") === -1, col("k")).otherwise(0L)).as("sell_vol"),
        count(lit(1)).as("n_ticks"))
      .select(col("event_type"), col("day"), col("buy_vol"), col("sell_vol"), col("n_ticks"),
        when(col("buy_vol") + col("sell_vol") > 0,
          r4((col("buy_vol") - col("sell_vol")).cast("double")
            / (col("buy_vol") + col("sell_vol")).cast("double"))).as("ofi"))
  }

  // q169 — ROLL IMPLIED SPREAD per (instrument, day): Roll's 1984
  // estimator — spread = 2·sqrt(−cov(Δp_t, Δp_{t−1})) — which reads
  // the effective bid-ask spread OUT OF the trade prices alone: the
  // bid-ask bounce makes consecutive price changes negatively
  // autocorrelated, and the magnitude of that first-order serial
  // covariance is (spread/2)². cov >= 0 (trending/no-bounce regime)
  // → null, the estimator's documented undefined region. Exactness:
  // prices quantize ONCE to integer ten-thousandths, so diffs and
  // their lag-pairs are exact integers; the pair products stay in
  // long range ((5e6)² < 2^63) and their SUMS ride decimal (a long
  // sum overflows at ~67k ticks/day × 100x), closed by one double
  // formula (population covariance (n·sxy − sx·sy)/n²). Scale shape:
  // two span-bounded (instrument, day) lags + one partial-agg
  // shuffle to the day grid — the q125/q158 precedent.
  private def q169(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"), col("day")).orderBy(col("ts"), col("event_id"))
    def d(c: Column) = c.cast("double")
    val base = ev(s, dir)
      .withColumn("day", to_date(col("ts")))
      .withColumn("p_fp", floor(col("value") * lit(1e4) + lit(0.5)).cast("long"))
      .withColumn("dp", col("p_fp") - lag(col("p_fp"), 1).over(w))
      .filter(col("dp").isNotNull)
      .withColumn("dprev", lag(col("dp"), 1).over(w))
      .filter(col("dprev").isNotNull)
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("dp").cast("decimal(38,0)")).as("sx"),
        sum(col("dprev").cast("decimal(38,0)")).as("sy"),
        sum((col("dp") * col("dprev")).cast("decimal(38,0)")).as("sxy"))
    val n = d(col("n_pairs"))
    val cov = (n * d(col("sxy")) - d(col("sx")) * d(col("sy"))) / (n * n)
    base.select(col("event_type"), col("day"), col("n_pairs"),
      r4(cov / lit(1e8)).as("cov_px2"),
      when(cov < 0, r4(lit(2d) * sqrt(-cov) / lit(1e4))).as("roll_spread"))
  }

  // q170 — VARIANCE RATIO TEST (Lo & MacKinlay 1988, q = 5) per
  // instrument: Var(5-day return)/(5·Var(1-day return)) — the classic
  // random-walk diagnostic (VR ≈ 1 under a random walk; < 1 mean
  // reversion, > 1 momentum). Daily close-to-close returns in exact
  // micro-log2 integers (the q159 construction); the 5-day return is
  // the exact integer sum of 5 consecutive dailies (overlapping, the
  // paper's variant); both variances close from exact integer sums in
  // one double formula (population form (n·sxx − sx²)/n²). Scale
  // shape: everything after the one (instrument, day) partial agg
  // runs on the volume-independent day grid (the q159 argument).
  private def q170(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"), col("day")).orderBy(col("ts"), col("event_id"))
    val closes = ev(s, dir)
      .filter(col("value") > 0)
      .withColumn("day", to_date(col("ts")))
      .withColumn("lv", qlog2(col("value")))
      .withColumn("rn", row_number().over(w))
      .groupBy(col("event_type"), col("day"))
      .agg(max_by(col("lv"), col("rn")).as("close_lv"))
    val wd = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val rets = closes
      .withColumn("r1", col("close_lv") - lag(col("close_lv"), 1).over(wd))
      .filter(col("r1").isNotNull)
      .withColumn("n_in5", count(lit(1)).over(wd.rowsBetween(-4, Window.currentRow)))
      .withColumn("r5", sum(col("r1")).over(wd.rowsBetween(-4, Window.currentRow)))
    def d(c: Column) = c.cast("double")
    def popVar(sx: Column, sxx: Column, n: Column): Column =
      (d(n) * d(sxx) - d(sx) * d(sx)) / (d(n) * d(n))
    val agg = rets.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n1"),
        sum(col("r1")).as("s1x"), sum(col("r1") * col("r1")).as("s1xx"),
        sum(when(col("n_in5") === 5, col("r5"))).as("s5x"),
        sum(when(col("n_in5") === 5, col("r5") * col("r5"))).as("s5xx"),
        sum(when(col("n_in5") === 5, 1L).otherwise(0L)).as("n5"))
    val v1 = popVar(col("s1x"), col("s1xx"), col("n1"))
    val v5 = popVar(col("s5x"), col("s5xx"), col("n5"))
    agg.select(col("event_type"), col("n1"), col("n5"),
      r4(v1 / lit(1e12)).as("var_1"),
      r4(v5 / lit(1e12)).as("var_5"),
      when(v1 > 0, r4(v5 / (lit(5d) * v1))).as("vr5"))
  }

  // q172 — THE DAILY MARKET PANEL: the nightly per-(instrument, day)
  // report every market-data platform materializes — OHLC, VWAP,
  // intraday log return, realized volatility (q153), Parkinson and
  // Garman-Klass range estimators (q157/q165), tick-rule order-flow
  // imbalance (q167) and traded volume — composed as ONE Catalyst
  // plan: a single span-bounded (instrument, day) window pass derives
  // rn / lagged-price / lagged-log / inherited tick sign together,
  // and a single partial-agg shuffle produces every panel column —
  // where running the six member queries separately pays six window
  // sorts and six aggregations over the same 100 TB of ticks, the
  // panel pays ONE of each (the q152 composed-training-build argument
  // in the market domain). Each column keeps its member query's exact
  // construction (micro-log2 integers, decimal dollar volume, integer
  // flow), so the oracle replays the whole panel and every value
  // agrees with its standalone query by construction.
  private def q172(s: SparkSession, dir: String): DataFrame =
    graft.operators.DailyPanel.compute(ev(s, dir))

  /** Deterministic daily close in micro-log2 units per (instrument,
    * day) — the q159/q170 construction's first half, shared by the
    * day-grid statistics and the level-series queries (q198/q199).
    * Routed through operators.DailyCloses (round 10): the close is an
    * arg-max over the (ts, event_id) tick order, so ONE max_by
    * partial aggregation replaces the old row_number window — a full
    * exchange+sort removed from EVERY day-grid consumer (same winning
    * row, so every oracle's arg_max(lv, rn) replay is unchanged) —
    * and the same state merges order-insensitively for the streaming
    * serves (closesMaintain). The ONLY volume-sized work in every
    * consumer. */
  private def dailyCloses(s: SparkSession, dir: String): DataFrame =
    graft.operators.DailyCloses.closes(graft.operators.DailyCloses.state(ev(s, dir)))

  /** Daily close-to-close micro-log2 returns per instrument — the
    * q159/q170 construction, shared by the day-grid statistics
    * (q175/q176/q179): [[dailyCloses]] + one day-grain lag. */
  private[graft] def dailyReturns(s: SparkSession, dir: String): DataFrame =
    returnsFromCloses(dailyCloses(s, dir))

  /** The same day-grain lag over ANY (event_type, day, close_lv)
    * frame — the closes-store serves (StreamPipeline.jbServe et al.)
    * re-derive returns from the maintained grid through THIS exact
    * code path, so serve ≡ declared is structural. */
  private[graft] def returnsFromCloses(cl: DataFrame): DataFrame = {
    val wd = Window.partitionBy(col("event_type")).orderBy(col("day"))
    cl.withColumn("prev", lag(col("close_lv"), 1).over(wd))
      .filter(col("prev").isNotNull)
      .withColumn("r_fp", col("close_lv") - col("prev"))
      .select(col("event_type"), col("day"), col("r_fp"))
  }

  // q175 — REALIZED HIGHER MOMENTS (skewness / excess kurtosis of
  // daily returns) per instrument: the tail-risk readout next to
  // q153's second moment — crash asymmetry (skew < 0) and fat tails
  // (kurt > 0) are what a variance number alone cannot see. Returns
  // are exact micro-log2 integers (the q159 construction), so the
  // four raw power sums are exact: s1/s2 fit long on the day grid
  // (|r| <~ 2^24, grid is volume-independent), s3/s4 ride decimal —
  // r³ exceeds long at |r| ~ 2^21 (DuckDB mirrors with HUGEINT).
  // Skew and kurtosis are scale-invariant, so the 1e-6 quantization
  // scale cancels algebraically; the closing formulas are ONE shared
  // IEEE sequence (raw→central moments), guarded on mu2 > 0 (a
  // constant-return series has no shape to measure). Scale shape:
  // the only volume-sized work is the (instrument, day) close
  // partial-agg; everything after runs on the fixed day grid.
  private def q175(s: SparkSession, dir: String): DataFrame = {
    val r1 = col("r_fp")
    val r2 = r1 * r1 // exact long: |r| <= ~2^24 on this feed
    val agg = dailyReturns(s, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        sum(r1).as("s1"), sum(r2).as("s2"),
        sum(r2.cast("decimal(19,0)") * r1).as("s3"),
        sum(r2.cast("decimal(19,0)") * r2).as("s4"))
    def d(c: Column) = c.cast("double")
    val n   = d(col("n_days"))
    val rm1 = d(col("s1")) / n
    val rm2 = d(col("s2")) / n
    val rm3 = d(col("s3")) / n
    val rm4 = d(col("s4")) / n
    val mu2 = rm2 - rm1 * rm1
    val mu3 = rm3 - lit(3d) * rm1 * rm2 + lit(2d) * rm1 * rm1 * rm1
    val mu4 = rm4 - lit(4d) * rm1 * rm3 + lit(6d) * rm1 * rm1 * rm2 -
      lit(3d) * rm1 * rm1 * rm1 * rm1
    agg.select(col("event_type"), col("n_days"),
      when(mu2 > 0, r4(sqrt(mu2) / lit(1e6))).as("vol_d"),
      when(mu2 > 0, r4(mu3 / (sqrt(mu2) * mu2))).as("skew_d"),
      when(mu2 > 0, r4(mu4 / (mu2 * mu2) - lit(3d))).as("kurt_x"))
  }

  // q176 — RETURN AUTOCORRELATION FUNCTION (lags 1–3) per instrument:
  // the serial-dependence profile (momentum vs mean reversion per
  // horizon) that q170's variance ratio summarizes — here read
  // directly as Pearson(r_t, r_{t−k}) for k = 1..3, all three lags
  // from ONE day-grid window pass (lag 1/2/3 computed together, then
  // unpivoted — not three window sorts). Exact integer sums feed the
  // q110 correlation formula; pair counts differ per lag (the grid
  // loses k rows at lag k), so each lag carries its own n. Scale
  // shape: the one volume-sized pass is the shared (instrument, day)
  // close aggregation inside dailyReturns; lags/explode/aggregate all
  // run on the volume-independent day grid.
  private def q176(s: SparkSession, dir: String): DataFrame = {
    val wd = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val lagged = dailyReturns(s, dir)
      .withColumn("lags", array(
        struct(lit(1).as("lag_k"), lag(col("r_fp"), 1).over(wd).as("y")),
        struct(lit(2).as("lag_k"), lag(col("r_fp"), 2).over(wd).as("y")),
        struct(lit(3).as("lag_k"), lag(col("r_fp"), 3).over(wd).as("y"))))
      .select(col("event_type"), col("r_fp"), explode(col("lags")).as("l"))
      .select(col("event_type"), col("l.lag_k").as("lag_k"),
        col("r_fp").as("x"), col("l.y").as("y"))
      .filter(col("y").isNotNull)
    val agg = lagged.groupBy(col("event_type"), col("lag_k"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
    def d(c: Column) = c.cast("double")
    val n   = d(col("n_pairs"))
    val num = n * d(col("sxy")) - d(col("sx")) * d(col("sy"))
    val den = sqrt(n * d(col("sxx")) - d(col("sx")) * d(col("sx"))) *
      sqrt(n * d(col("syy")) - d(col("sy")) * d(col("sy")))
    agg.select(col("event_type"), col("lag_k"), col("n_pairs"),
      when(den > 0, r4(num / den)).as("acf"))
  }

  // q177 — KYLE'S LAMBDA per (instrument, day): the price-impact
  // coefficient (Kyle 1985) — the OLS slope of the tick price change
  // on the SIGNED tick volume, the standard "how many dollars does it
  // cost to move the price" liquidity number (complements q158's
  // Amihud ratio, which has no direction, and q169's Roll spread,
  // which has no size). Composition: q169's integer ten-thousandth
  // price diffs (y) × q167's inherited-zero-tick trade signing ×
  // the props volume (x = sgn·k, via graft's json_long_field byte
  // scan) — three already-pinned constructions closed by one OLS
  // formula over exact integer sums (decimal at the shuffle: the
  // products fit long per tick but not their 100x daily sums). r²
  // rides along: a lambda from a flat fit is noise, and the r² column
  // is what a desk gates on. Scale shape: one span-bounded
  // (instrument, day) window pass (diff + sign share it), one
  // partial-agg shuffle to the day grid.
  private def q177(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"), col("day")).orderBy(col("ts"), col("event_id"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ticks = ev(s, dir)
      .withColumn("day", to_date(col("ts")))
      .withColumn("k", graft.functions.JsonField.longField(col("props"), "k"))
      .withColumn("p_fp", floor(col("value") * lit(1e4) + lit(0.5)).cast("long"))
      .withColumn("dp", col("p_fp") - lag(col("p_fp"), 1).over(w))
      .withColumn("chg", col("value") - lag(col("value"), 1).over(w))
      .withColumn("sgn_raw",
        when(col("chg") > 0, 1).when(col("chg") < 0, -1).otherwise(lit(null).cast("int")))
      .withColumn("sgn", last(col("sgn_raw"), ignoreNulls = true).over(wRun))
      .filter(col("dp").isNotNull && col("sgn").isNotNull)
      .withColumn("x", col("sgn") * col("k"))
    val agg = ticks.groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n_ticks"),
        sum(col("x").cast("decimal(38,0)")).as("sx"),
        sum(col("dp").cast("decimal(38,0)")).as("sy"),
        sum((col("x") * col("dp")).cast("decimal(38,0)")).as("sxy"),
        sum((col("x") * col("x")).cast("decimal(38,0)")).as("sxx"),
        sum((col("dp") * col("dp")).cast("decimal(38,0)")).as("syy"))
    def d(c: Column) = c.cast("double")
    val n    = d(col("n_ticks"))
    val num  = n * d(col("sxy")) - d(col("sx")) * d(col("sy"))
    val denB = n * d(col("sxx")) - d(col("sx")) * d(col("sx"))
    val denC = (n * d(col("sxx")) - d(col("sx")) * d(col("sx"))) *
      (n * d(col("syy")) - d(col("sy")) * d(col("sy")))
    agg.select(col("event_type"), col("day"), col("n_ticks"),
      when(denB =!= 0, r4(num / denB / lit(1e4))).as("lambda_px"),
      when(denC > 0, r4(num * num / denC)).as("r2_fit"))
  }

  // q178 — VPIN (volume-synchronized probability of informed trading,
  // Easley/López de Prado/O'Hara 2012), aligned-bucket variant: trade
  // flow is re-clocked in VOLUME time — every V = 2000 shares starts
  // a new bucket — and toxicity is the volume-weighted order-flow
  // imbalance across buckets, Σ|buy−sell| / Σvol. The volume clock is
  // a corpus-wide running sum per instrument, and it evaluates
  // through ChunkedFrame.withRunningSum (day chunks): a bare
  // Window.partitionBy(event_type) would serialize each instrument's
  // ENTIRE month in one task — the q109/q156 five-key ceiling.
  // Deviation from the paper, documented: ticks are assigned whole to
  // the bucket where they START (no intra-tick volume splitting), so
  // bucket boundaries land on tick edges — at 100-share ticks vs
  // V = 2000 the misalignment is <5% per bucket and the estimator is
  // unchanged in expectation. Signing is q167's inherited-zero-tick
  // rule. All sums are exact integers; ONE closing division. Scale
  // shape: one (instrument, day) sign window + the chunked running
  // sum + two partial aggs; bucket count grows with volume/V, so
  // per-bucket work is constant and the final per-instrument table is
  // |instruments| rows.
  private def q178(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"), col("day")).orderBy(col("ts"), col("event_id"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val signed = ev(s, dir)
      .withColumn("day", to_date(col("ts")))
      .withColumn("k", graft.functions.JsonField.longField(col("props"), "k"))
      .withColumn("chg", col("value") - lag(col("value"), 1).over(w))
      .withColumn("sgn_raw",
        when(col("chg") > 0, 1).when(col("chg") < 0, -1).otherwise(lit(null).cast("int")))
      .withColumn("sgn", last(col("sgn_raw"), ignoreNulls = true).over(wRun))
      .select(col("event_type"), col("ts"), col("event_id"), col("k"), col("sgn"))
    val clocked = graft.operators.ChunkedFrame.withRunningSum(
      signed, keyCol = "event_type", chunk = date_trunc("day", col("ts")),
      orderCols = Seq("ts", "event_id"), valCol = "k", outCol = "cum")
      .withColumn("bucket", expr("(cum - k) DIV 2000"))
    val buckets = clocked.groupBy(col("event_type"), col("bucket"))
      .agg(sum(col("k")).as("vol"),
        sum(when(col("sgn") === 1, col("k")).otherwise(0L)).as("buy_vol"),
        sum(when(col("sgn") === -1, col("k")).otherwise(0L)).as("sell_vol"))
    buckets.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_buckets"),
        sum(col("vol")).as("total_vol"),
        sum(abs(col("buy_vol") - col("sell_vol"))).as("imb_vol"))
      .select(col("event_type"), col("n_buckets"), col("total_vol"),
        when(col("total_vol") > 0,
          r4(col("imb_vol").cast("double") / col("total_vol").cast("double"))).as("vpin"))
  }

  // q179 — CROSS-SECTIONAL MOMENTUM (daily winner/loser spread): each
  // day, instruments are ranked by their trailing 5-day return (days
  // t−5..t−1 — the signal EXCLUDES the day being traded, the
  // look-ahead rule every backtest must honor), and the portfolio
  // return is winner-minus-loser on day t — the Jegadeesh-Titman
  // momentum construction at daily horizon. Returns are exact
  // micro-log2 integers; the trailing signal is an exact integer
  // window sum; ranks tiebreak on (signal desc, instrument) so the
  // portfolio is deterministic on both engines; the spread stays an
  // integer until the final 1e-6 descale. Scale shape: everything
  // after dailyReturns' one partial-agg pass runs on the
  // volume-independent (day × |instruments|) grid.
  private def q179(s: SparkSession, dir: String): DataFrame = {
    val wd = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val sig = dailyReturns(s, dir)
      .withColumn("mom", sum(col("r_fp")).over(wd.rowsBetween(-5, -1)))
      .withColumn("n_m", count(col("r_fp")).over(wd.rowsBetween(-5, -1)))
      .filter(col("n_m") === 5)
    val wday = Window.partitionBy(col("day")).orderBy(col("mom").desc, col("event_type"))
    val ranked = sig
      .withColumn("rn", row_number().over(wday))
      .withColumn("n_day", count(lit(1)).over(Window.partitionBy(col("day"))))
    val winner = ranked.filter(col("rn") === 1)
      .select(col("day"), col("event_type").as("win_type"), col("r_fp").as("win_fp"))
    val loser = ranked.filter(col("rn") === col("n_day"))
      .select(col("day"), col("event_type").as("lose_type"), col("r_fp").as("lose_fp"))
    winner.join(loser, Seq("day"))
      .select(col("day"), col("win_type"), col("lose_type"),
        r4(col("win_fp").cast("double") / lit(1e6)).as("win_ret"),
        r4(col("lose_fp").cast("double") / lit(1e6)).as("lose_ret"),
        r4((col("win_fp") - col("lose_fp")).cast("double") / lit(1e6)).as("spread"))
  }

  // q192 — LEAD-LAG CROSS-CORRELATION MATRIX: Pearson(r_a(t−1),
  // r_b(t)) for every ORDERED instrument pair — the price-discovery
  // readout (does A's move today predict B's tomorrow?) that
  // complements q110's contemporaneous matrix and q176's own-lag
  // ACF; the asymmetry between (a, b) and (b, a) IS the signal.
  // Pairs align on CALENDAR day (b's day = a's day + 1), so a
  // missing day for either side drops the pair instead of silently
  // shifting the alignment. Exact integer sums into the q110 formula.
  // Scale shape: dailyReturns' one volume-sized partial agg; the
  // self-join and aggregation run on the volume-independent day grid
  // (|types|·|days| rows), output |types|² − |types| rows.
  private def q192(s: SparkSession, dir: String): DataFrame = {
    val rets = dailyReturns(s, dir)
    val lead = rets.select(col("event_type").as("lead_type"),
      date_add(col("day"), 1).as("day"), col("r_fp").as("x"))
    val lagf = rets.select(col("event_type").as("lag_type"),
      col("day"), col("r_fp").as("y"))
    val agg = lead.join(lagf, Seq("day"))
      .filter(col("lead_type") =!= col("lag_type"))
      .groupBy(col("lead_type"), col("lag_type"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
    def d(c: Column) = c.cast("double")
    val n   = d(col("n_pairs"))
    val num = n * d(col("sxy")) - d(col("sx")) * d(col("sy"))
    val den = sqrt(n * d(col("sxx")) - d(col("sx")) * d(col("sx"))) *
      sqrt(n * d(col("syy")) - d(col("sy")) * d(col("sy")))
    agg.select(col("lead_type"), col("lag_type"), col("n_pairs"),
      when(den > 0, r4(num / den)).as("xcorr"))
  }

  // q198 — PAIRS-TRADING SPREAD SCREEN: for every unordered
  // instrument pair (a < b), the full-sample OLS hedge ratio of a's
  // daily close log-price on b's (the Engle-Granger first stage at
  // the screening horizon), the level correlation, the residual
  // spread's dispersion, and the LAST common day's spread z-score —
  // the stat-arb candidate table (|z| large = stretched pair). The
  // trick that keeps this ONE pass: every output is a closed form of
  // the SAME six exact integer sums (n, Σx, Σy, Σxy, Σx², Σy²) plus
  // the arg-max-by-day levels — β, the residual mean
  // (Σy − βΣx)/n, the residual second moment
  // (Σy² − 2βΣxy + β²Σx²)/n, and z_last all algebraic, so no second
  // pass over the spread series is ever materialized. Levels are
  // micro-log2 integers (qlog2 once), so the sums are exact on the
  // day grid and both engines close with ONE shared IEEE sequence.
  // Scale shape: dailyCloses' one volume-sized partial agg; the
  // pair join and aggregate run on the volume-independent day grid
  // (|types|·|days| rows), output |types|·(|types|−1)/2 rows.
  private def q198(s: SparkSession, dir: String): DataFrame =
    pairsFromCloses(dailyCloses(s, dir))

  /** q198's closing over any (event_type, day, close_lv) day grid —
    * ONE code path with the streaming serve
    * (StreamPipeline.pairsServe over the closes store). */
  private[graft] def pairsFromCloses(cl: DataFrame): DataFrame = {
    val a = cl.select(col("event_type").as("type_a"), col("day"), col("close_lv").as("y"))
    val b = cl.select(col("event_type").as("type_b"), col("day"), col("close_lv").as("x"))
    val agg = a.join(b, Seq("day"))
      .filter(col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        max_by(col("x"), col("day")).as("x_last"),
        max_by(col("y"), col("day")).as("y_last"),
        max(col("day")).as("last_day"))
    def d(c: Column) = c.cast("double")
    val n     = d(col("n_days"))
    val denB  = n * d(col("sxx")) - d(col("sx")) * d(col("sx"))
    val beta  = (n * d(col("sxy")) - d(col("sx")) * d(col("sy"))) / denB
    val denC  = sqrt(n * d(col("sxx")) - d(col("sx")) * d(col("sx"))) *
      sqrt(n * d(col("syy")) - d(col("sy")) * d(col("sy")))
    val corr  = (n * d(col("sxy")) - d(col("sx")) * d(col("sy"))) / denC
    val meanE = (d(col("sy")) - beta * d(col("sx"))) / n
    val me2   = (d(col("syy")) - lit(2d) * beta * d(col("sxy")) +
      beta * beta * d(col("sxx"))) / n
    val sdE   = sqrt(greatest(lit(0d), me2 - meanE * meanE))
    val eLast = d(col("y_last")) - beta * d(col("x_last"))
    agg.select(col("type_a"), col("type_b"), col("n_days"), col("last_day"),
      when(denB =!= 0, r4(beta)).as("beta"),
      when(denC > 0, r4(corr)).as("corr_px"),
      when(denB =!= 0, r4(sdE / lit(1e6))).as("spread_sd"),
      when(denB =!= 0 && sdE > 0, r4((eLast - meanE) / sdE)).as("z_last"))
  }

  // q199 — RISK-ADJUSTED PERFORMANCE SUMMARY (Sharpe / Sortino /
  // Calmar) per instrument: the portfolio-grade report card over the
  // daily series — annualized return and volatility, Sharpe
  // (mean/sd), Sortino (mean over DOWNSIDE deviation — half the
  // formula, twice the information when returns are skewed, q175's
  // point), max drawdown from the running close-level peak (the q109
  // metric at daily grain), and Calmar (return per unit of worst
  // pain). Everything stays in micro-log2 units end to end — ratios
  // (Sharpe/Sortino/Calmar) are unit-free so the quantization scale
  // cancels, and the unit columns are labeled _log2 — which keeps
  // the whole query transcendental-free after the one shared qlog2
  // (no pow/exp whose last-ulp rounding differs between libm
  // implementations — the q81 fixed-point rule's corollary). Sums
  // are exact integers on the day grid: r², downside r², and the
  // running-peak drawdown (max of integer differences). ONE day-grid
  // window pass (lag + running max share the (instrument, day)
  // sort), ONE aggregate. Scale shape: dailyCloses' partial agg is
  // the only volume-sized work; the day-grid window is
  // volume-independent (the q176/q179 precedent).
  private def q199(s: SparkSession, dir: String): DataFrame =
    riskFromCloses(dailyCloses(s, dir))

  /** q199's closing over any (event_type, day, close_lv) day grid —
    * ONE code path with the streaming serve
    * (StreamPipeline.riskServe over the closes store). */
  private[graft] def riskFromCloses(cl: DataFrame): DataFrame = {
    val wd = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val base = cl
      .withColumn("prev", lag(col("close_lv"), 1).over(wd))
      .withColumn("peak", max(col("close_lv"))
        .over(wd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("dd_fp", col("peak") - col("close_lv"))
      .withColumn("r_fp", col("close_lv") - col("prev"))
    val agg = base.groupBy(col("event_type"))
      .agg(count(col("r_fp")).as("n_days"),
        sum(col("r_fp")).as("s1"),
        sum(col("r_fp") * col("r_fp")).as("s2"),
        sum(when(col("r_fp") < 0, col("r_fp") * col("r_fp")).otherwise(0L)).as("sn2"),
        max(col("dd_fp")).as("mdd_fp"))
    def d(c: Column) = c.cast("double")
    val n    = d(col("n_days"))
    val mean = d(col("s1")) / n
    val sd   = sqrt(greatest(lit(0d), d(col("s2")) / n - mean * mean))
    val ddv  = sqrt(d(col("sn2")) / n)
    val ann  = sqrt(lit(252d))
    agg.select(col("event_type"), col("n_days"),
      r4(mean * lit(252d) / lit(1e6)).as("ann_ret_log2"),
      r4(sd * ann / lit(1e6)).as("ann_vol_log2"),
      when(sd > 0, r4(mean / sd * ann)).as("sharpe"),
      when(ddv > 0, r4(mean / ddv * ann)).as("sortino"),
      r4(d(col("mdd_fp")) / lit(1e6)).as("max_dd_log2"),
      when(col("mdd_fp") > 0, r4(mean * lit(252d) / d(col("mdd_fp")))).as("calmar"))
  }

  // q203 — EWMA FORECAST BACKTEST: one-step-ahead forecast quality of
  // the q82 exponential smoother (α = 0.2) on the daily close series —
  // forecast for day t is the EWMA through day t−1, scored as MAE and
  // RMSE against the realized close, next to the NAIVE random-walk
  // baseline (forecast = previous close, the bar every market
  // forecaster must beat; skill = mae_ewma/mae_naive, < 1 means the
  // smoother helps). The recursion and both error folds run over
  // per-instrument day-grid ARRAYS (the q82 collect shape — ~|days|
  // elements, volume-independent after dailyCloses' one partial agg);
  // every fold is a SEQUENTIAL left fold in array order on both
  // engines (Spark `aggregate`, DuckDB list_reduce with a prepended
  // 0.0 seed), so sums agree bitwise before r4 — list_sum would not
  // (unspecified summation order, the q108 frame-evaluation lesson).
  private def q203(s: SparkSession, dir: String): DataFrame =
    ewmaFromCloses(dailyCloses(s, dir))

  /** q203's closing over any (event_type, day, close_lv) day grid —
    * ONE code path with the streaming serve
    * (StreamPipeline.ewmaServe over the closes store). */
  private[graft] def ewmaFromCloses(
      cl: DataFrame,
      maxLen: Int = graft.operators.DayGrid.MaxSeriesLen): DataFrame = {
    // Day-grid array via the SHARED guarded entry point (round-14
    // Next #2): a wrong-grain (tick-level) feed dies with the grain-
    // contract message before the fold builds a volume-sized array.
    // The fold itself is O(n), so the hazard here is task-memory, not
    // an n² burn — but the guard is the same contract either way.
    val base = graft.operators.DayGrid
      .series(cl, "event_type", "day", "close_lv", "ewmaFromCloses", maxLen)
      .withColumn("xs", expr("transform(xs, x -> CAST(x AS DOUBLE))"))
      .withColumn("ys", graft.functions.Ewma.column(col("xs"), 0.2))
      // k = 1..n-1 (0-based array reads): e_k = x[k] − forecast y[k−1].
      // The size(xs) > 1 guard matters: Spark's sequence(1, 0) DESCENDS
      // ([1, 0]) instead of being empty, so a one-day instrument would
      // fabricate two out-of-bounds error rows without it.
      .withColumn("es", expr("IF(size(xs) > 1, " +
        "transform(sequence(1, size(xs) - 1), k -> xs[k] - ys[k - 1]), " +
        "CAST(array() AS array<double>))"))
      .withColumn("en", expr("IF(size(xs) > 1, " +
        "transform(sequence(1, size(xs) - 1), k -> xs[k] - xs[k - 1]), " +
        "CAST(array() AS array<double>))"))
      .withColumn("sae", expr("aggregate(es, CAST(0.0 AS DOUBLE), (a, e) -> a + abs(e))"))
      .withColumn("sse", expr("aggregate(es, CAST(0.0 AS DOUBLE), (a, e) -> a + e * e)"))
      .withColumn("san", expr("aggregate(en, CAST(0.0 AS DOUBLE), (a, e) -> a + abs(e))"))
    // n_fc reads DayGrid's GUARDED n, so the grain guard sits on the
    // output's evaluation path (the DayGridSpec wiring contract).
    val nf = col("n") - lit(1L)
    val n = nf.cast("double")
    base.select(col("event_type"), nf.as("n_fc"),
      when(nf > 0, r4(col("sae") / n / lit(1e6))).as("mae_ewma"),
      when(nf > 0, r4(sqrt(col("sse") / n) / lit(1e6))).as("rmse_ewma"),
      when(nf > 0, r4(col("san") / n / lit(1e6))).as("mae_naive"),
      when(col("san") > 0, r4(col("sae") / col("san"))).as("skill"))
  }

  // q208 — SMA-CROSSOVER STRATEGY BACKTEST (5/20): the simplest
  // systematic trading rule — long when the fast trailing mean sits
  // above the slow one, short when below, flat on the exact tie —
  // scored per instrument as an event-driven backtest over the daily
  // close grid. The signal for day t reads ONLY days ≤ t−1 (frames
  // `ROWS BETWEEN k PRECEDING AND 1 PRECEDING` — the q179 look-ahead
  // rule made structural: the traded day cannot be in its own
  // signal), and the mean comparison s5/5 vs s20/20 cross-multiplies
  // to the EXACT integer test 4·s5 vs s20 — no division, no float,
  // no tie ambiguity between engines. Strategy return = position ×
  // close-to-close micro-log2 diff (exact integers end to end);
  // buy-and-hold over the SAME day set is the baseline column, hit
  // rate and position-flip count (round-trips = flips/2) read the
  // trade quality, and the Sharpe closes from the q199 integer-sum
  // formula. Scale shape: dailyCloses' one volume-sized partial agg,
  // then ONE day-grid window pass (both frames + the lag share the
  // (instrument, day) sort; the second pass for lag(pos) rides the
  // same ordering, no re-sort) and ONE aggregate — day-grid work is
  // volume-independent (the q176/q199 precedent).
  private def q208(s: SparkSession, dir: String): DataFrame =
    crossoverFromCloses(dailyCloses(s, dir))

  /** q208's closing over any (event_type, day, close_lv) day grid —
    * the q199 `riskFromCloses` sharing pattern, so a streaming serve
    * over the closes store is the same code path.
    *
    * Grain note (round-14 Next #2 audit): this is the ONE closes
    * backtest with NO per-key array — the signal is bounded-frame
    * window functions (`ROWS BETWEEN 20 PRECEDING`) plus one partial
    * agg, so a wrong-grain feed degrades to a linear windowed scan,
    * never a task-memory array. Nothing for DayGrid to guard. */
  private[graft] def crossoverFromCloses(cl: DataFrame): DataFrame = {
    val wd = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val sig = cl
      .withColumn("s5", sum(col("close_lv")).over(wd.rowsBetween(-5, -1)))
      .withColumn("s20", sum(col("close_lv")).over(wd.rowsBetween(-20, -1)))
      .withColumn("n20", count(col("close_lv")).over(wd.rowsBetween(-20, -1)))
      .withColumn("r_fp", col("close_lv") - lag(col("close_lv"), 1).over(wd))
      // full slow history only: n20 = 20 implies the fast window and
      // the lag row exist too, but the r_fp guard keeps the filter's
      // intent explicit.
      .filter(col("n20") === 20 && col("r_fp").isNotNull)
      .withColumn("pos",
        when(lit(4L) * col("s5") > col("s20"), lit(1))
          .when(lit(4L) * col("s5") < col("s20"), lit(-1))
          .otherwise(lit(0)))
    // lag(pos) over the FILTERED signal-complete day set: a flip is a
    // change between consecutive traded days. Same partition order as
    // wd, so the sort is reused.
    val tr = sig
      .withColumn("prev_pos", lag(col("pos"), 1).over(wd))
      .withColumn("strat_fp", col("pos").cast("long") * col("r_fp"))
    val agg = tr.groupBy(col("event_type")).agg(
      count(lit(1)).as("n_days"),
      sum(when(col("pos") =!= 0, 1L).otherwise(0L)).as("n_active"),
      sum(when(col("prev_pos").isNotNull && col("pos") =!= col("prev_pos"), 1L)
        .otherwise(0L)).as("n_flips"),
      sum(col("strat_fp")).as("ss1"),
      sum(col("strat_fp") * col("strat_fp")).as("ss2"),
      sum(when(col("strat_fp") > 0, 1L).otherwise(0L)).as("n_hit"),
      sum(col("r_fp")).as("bh1"))
    def d(c: Column) = c.cast("double")
    val n    = d(col("n_days"))
    val mean = d(col("ss1")) / n
    val sd   = sqrt(greatest(lit(0d), d(col("ss2")) / n - mean * mean))
    agg.select(col("event_type"), col("n_days"), col("n_active"), col("n_flips"),
      r4(d(col("ss1")) / lit(1e6)).as("strat_ret_log2"),
      r4(d(col("bh1")) / lit(1e6)).as("bh_ret_log2"),
      when(col("n_active") > 0, r4(d(col("n_hit")) / d(col("n_active")))).as("hit_rate"),
      when(sd > 0, r4(mean / sd * sqrt(lit(252d)))).as("sharpe"))
  }

  // q210 — HOLT LINEAR-TREND FORECAST BACKTEST: the trend-aware
  // sibling of q203 — Holt's double exponential smoother (level
  // l_t = α·x_t + (1−α)·(l_{t−1}+b_{t−1}), trend b_t = β·(l_t−l_{t−1})
  // + (1−β)·b_{t−1}; α=0.2 matching q203's EWMA for comparability,
  // β=0.1; init l₁=x₁, b₁=0) scored one-step-ahead on the daily
  // closes against BOTH baselines: the naive walk (the bar) and the
  // q203 EWMA (the model it claims to improve on — a trending market
  // is exactly where the level-only smoother lags). The whole
  // recursion + error accumulation is ONE sequential 4-field-struct
  // fold in array order (level, trend, Σ|e|, Σe²) — both engines run
  // the SAME fold (Spark `aggregate` with a named_struct accumulator;
  // DuckDB list_reduce over 4-element LIST states with a prepended
  // seed, the q203 same-type trick), and every arithmetic step is
  // written as the identical IEEE expression on both sides, so sums
  // agree bitwise before r4. Scale shape: q203's — day-grid arrays
  // after dailyCloses' one partial agg, volume-independent folds.
  private def q210(s: SparkSession, dir: String): DataFrame =
    holtFromCloses(dailyCloses(s, dir))

  /** q210's closing over any (event_type, day, close_lv) day grid —
    * ONE code path with the streaming serve
    * (StreamPipeline.holtServe over the closes store). */
  private[graft] def holtFromCloses(cl: DataFrame): DataFrame = {
    // Guarded day-grid array (round-14 Next #2) — see ewmaFromCloses.
    val base = graft.operators.DayGrid
      .series(cl, "event_type", "day", "close_lv", "holtFromCloses")
      .withColumn("xs", expr("transform(xs, x -> CAST(x AS DOUBLE))"))
      // Holt fold over x_2..x_n: forecast f = l + b, error BEFORE the
      // update, then level/trend updates. The repeated (a.l + a.b) /
      // level' subexpressions are the same IEEE value each time.
      .withColumn("h", expr(
        "IF(size(xs) > 1, aggregate(slice(xs, 2, size(xs) - 1), " +
          "named_struct('l', xs[0], 'b', CAST(0.0 AS DOUBLE), " +
          "'sae', CAST(0.0 AS DOUBLE), 'sse', CAST(0.0 AS DOUBLE)), " +
          "(a, x) -> named_struct(" +
          "'l', 0.2 * x + 0.8 * (a.l + a.b), " +
          "'b', 0.1 * ((0.2 * x + 0.8 * (a.l + a.b)) - a.l) + 0.9 * a.b, " +
          "'sae', a.sae + abs(x - (a.l + a.b)), " +
          "'sse', a.sse + (x - (a.l + a.b)) * (x - (a.l + a.b)))), NULL)"))
      // q203's EWMA + naive error folds on the SAME day set (t >= 2)
      // for the three-way comparison.
      .withColumn("ys", graft.functions.Ewma.column(col("xs"), 0.2))
      .withColumn("es", expr("IF(size(xs) > 1, " +
        "transform(sequence(1, size(xs) - 1), k -> xs[k] - ys[k - 1]), " +
        "CAST(array() AS array<double>))"))
      .withColumn("en", expr("IF(size(xs) > 1, " +
        "transform(sequence(1, size(xs) - 1), k -> xs[k] - xs[k - 1]), " +
        "CAST(array() AS array<double>))"))
      .withColumn("sae_e", expr("aggregate(es, CAST(0.0 AS DOUBLE), (a, e) -> a + abs(e))"))
      .withColumn("san", expr("aggregate(en, CAST(0.0 AS DOUBLE), (a, e) -> a + abs(e))"))
    // n_fc reads DayGrid's GUARDED n (the ewmaFromCloses wiring).
    val nf = col("n") - lit(1L)
    val n = nf.cast("double")
    base.select(col("event_type"), nf.as("n_fc"),
      when(nf > 0, r4(col("h.sae") / n / lit(1e6))).as("mae_holt"),
      when(nf > 0, r4(sqrt(col("h.sse") / n) / lit(1e6))).as("rmse_holt"),
      when(nf > 0, r4(col("sae_e") / n / lit(1e6))).as("mae_ewma"),
      when(nf > 0, r4(col("san") / n / lit(1e6))).as("mae_naive"),
      when(col("san") > 0, r4(col("h.sae") / col("san"))).as("skill_vs_naive"),
      when(col("sae_e") > 0, r4(col("h.sae") / col("sae_e"))).as("skill_vs_ewma"))
  }

  // q209 — CORRELATION RISK CLUSTERS: partition the instrument
  // universe into co-movement groups — the connected components of
  // the graph whose edges are instrument pairs with |Pearson ρ| of
  // contemporaneous daily returns ≥ 0.6 (|ρ|, not ρ: a perfectly
  // anti-correlated pair is ONE risk bet hedged, not two independent
  // ones — the designed-feed spec pins exactly this). The readout
  // every diversification/limits desk wants from the correlation
  // matrix that q110/q198 only display. Construction: the q192
  // day-aligned pair grid over [[dailyReturns]] (exact integer sums
  // into the q110 Pearson formula, ONE shared IEEE closing sequence
  // so both engines make the SAME edge decisions at the 0.6
  // boundary); zero-variance instruments have no defined ρ and
  // become singletons (den > 0 guard — pinned). Components close
  // driver-side by union-find over the collected ≤|types|² edge
  // list with min-member cluster ids — volume-independent, the
  // q186/q196/q200 collected-bounded-matrix discipline; DuckDB
  // replays with a recursive-CTE transitive closure. Scale shape:
  // dailyCloses' one volume-sized partial agg, the day-keyed pair
  // join on the volume-independent day grid, one |types|²-row agg.
  private def q209(s: SparkSession, dir: String): DataFrame = {
    val r = dailyReturns(s, dir)
    val a = r.select(col("event_type").as("type_a"), col("day"), col("r_fp").as("x"))
    val b = r.select(col("event_type").as("type_b"), col("day"), col("r_fp").as("y"))
    val g = a.join(b, Seq("day")).filter(col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
    def d(c: Column) = c.cast("double")
    val num = d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy"))
    val den = sqrt(d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx"))) *
      sqrt(d(col("n")) * d(col("syy")) - d(col("sy")) * d(col("sy")))
    val edges = g.filter(den > 0 && abs(num / den) >= lit(0.6))
      .select(col("type_a"), col("type_b"))
      .collect().map(r0 => (r0.getString(0), r0.getString(1))).sorted
    val nodes = r.select(col("event_type")).distinct()
      .collect().map(_.getString(0)).sorted
    // union-find over the bounded node set (deterministic: sorted
    // edges, min-member representative).
    val parent = scala.collection.mutable.Map(nodes.map(t => t -> t): _*)
    def find(t: String): String = {
      var x = t; while (parent(x) != x) x = parent(x); x
    }
    edges.foreach { case (u, v) =>
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) { val (lo, hi) = if (ru < rv) (ru, rv) else (rv, ru); parent(hi) = lo }
    }
    val cluster = nodes.map(t => t -> find(t)).toMap
    val size = cluster.groupBy(_._2).map { case (c, m) => c -> m.size.toLong }
    val rows = nodes.map(t => (t, cluster(t), size(cluster(t))))
    s.createDataFrame(rows.toSeq)
      .toDF("event_type", "cluster_id", "cluster_size")
  }

  // q221 — HISTORICAL VaR / CVaR (95%) per instrument: the
  // order-statistic risk pair every desk reports — VaR is the k-th
  // worst daily return (k = max(1, ⌈0.05·n⌉), the empirical 5%
  // quantile, NO interpolation — an interpolated quantile would be
  // one more engine-specific float path), CVaR (expected shortfall)
  // the mean of those k worst days. Exactness: returns are exact
  // micro-log2 integers, the sorted day-grid array is
  // volume-independent, the tail sum is an exact integer fold, and
  // the only IEEE ops are k's shared ceil(n·0.05) and the two final
  // divisions — identical sequences on both engines. Scale shape:
  // dailyCloses' one volume-sized partial agg; sort/slice run on
  // |days|-element arrays per instrument.
  private def q221(s: SparkSession, dir: String): DataFrame =
    varCvarFromCloses(dailyCloses(s, dir))

  /** q221's closing over any (event_type, day, close_lv) day grid
    * (the q199/q203 sharing pattern). */
  private[graft] def varCvarFromCloses(cl: DataFrame): DataFrame = {
    val wd = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val rets = cl
      .withColumn("prev", lag(col("close_lv"), 1).over(wd))
      .filter(col("prev").isNotNull)
      .withColumn("r_fp", col("close_lv") - col("prev"))
      .select(col("event_type"), col("day"), col("r_fp"))
    val base = rets
      .groupBy(col("event_type"))
      .agg(sort_array(collect_list(col("r_fp"))).as("xs"))
    // VALUE-sorted array (order statistics), so DayGrid.series' day-
    // sorted shape doesn't fit — but the grain guard does: n is the
    // guarded size (round-14 Next #2), read by k_tail and n_days, so
    // a tick-grain feed dies loudly before the tail fold.
    val n = graft.operators.DayGrid
      .guardedSize("varCvarFromCloses", col("event_type"), col("xs"))
    base
      .withColumn("k_tail",
        greatest(lit(1L), ceil(n.cast("double") * lit(0.05))))
      .withColumn("var_fp", element_at(col("xs"), col("k_tail").cast("int")))
      .withColumn("tail_sum", expr(
        "aggregate(slice(xs, 1, CAST(k_tail AS INT)), CAST(0 AS BIGINT), (a, e) -> a + e)"))
      .select(col("event_type"), n.as("n_days"), col("k_tail"),
        r4(-col("var_fp").cast("double") / lit(1e6)).as("var95_r4"),
        r4(-(col("tail_sum").cast("double") / col("k_tail").cast("double")) / lit(1e6))
          .as("cvar95_r4"))
  }

  // q222 — LOCAL-LEVEL KALMAN FILTER BACKTEST: the optimal recursive
  // estimator for a random-walk-plus-noise series (Q = 1e9 process
  // variance, R = 1e10 observation variance in micro-log2² units,
  // P₀ = R) scored one-step-ahead against the naive walk — the
  // adaptive sibling of q203's fixed-α EWMA: the gain K_t =
  // P⁻/(P⁻+R) starts high and anneals to the steady state
  // (`gain_final` reads it out), so early observations correct the
  // state faster. The entire predict-update recursion + error
  // accumulation is ONE sequential 4-field fold in day order —
  // Spark `aggregate` over a named_struct, DuckDB list_reduce over
  // 4-element LISTs with a prepended seed (the q210 replay), every
  // arithmetic step the same IEEE expression (the repeated
  // (a.p + 1e9) / ((a.p + 1e9) + 1e10) subterm is the same double
  // each time), so sums agree bitwise before r4. Scale shape: q203's
  // — day-grid arrays after dailyCloses' one partial agg.
  private def q222(s: SparkSession, dir: String): DataFrame =
    kalmanFromCloses(dailyCloses(s, dir))

  /** q222's closing over any (event_type, day, close_lv) day grid
    * (the q203/q210 sharing pattern). */
  private[graft] def kalmanFromCloses(cl: DataFrame): DataFrame = {
    // Guarded day-grid array (round-14 Next #2) — see ewmaFromCloses.
    val base = graft.operators.DayGrid
      .series(cl, "event_type", "day", "close_lv", "kalmanFromCloses")
      .withColumn("xs", expr("transform(xs, x -> CAST(x AS DOUBLE))"))
      .withColumn("kf", expr(
        "IF(size(xs) > 1, aggregate(slice(xs, 2, size(xs) - 1), " +
          "named_struct('x', xs[0], 'p', CAST(1e10 AS DOUBLE), " +
          "'sae', CAST(0.0 AS DOUBLE), 'sse', CAST(0.0 AS DOUBLE)), " +
          "(a, y) -> named_struct(" +
          "'x', a.x + ((a.p + 1e9) / ((a.p + 1e9) + 1e10)) * (y - a.x), " +
          "'p', (1.0 - ((a.p + 1e9) / ((a.p + 1e9) + 1e10))) * (a.p + 1e9), " +
          "'sae', a.sae + abs(y - a.x), " +
          "'sse', a.sse + (y - a.x) * (y - a.x))), NULL)"))
      .withColumn("en", expr("IF(size(xs) > 1, " +
        "transform(sequence(1, size(xs) - 1), k -> xs[k] - xs[k - 1]), " +
        "CAST(array() AS array<double>))"))
      .withColumn("san", expr("aggregate(en, CAST(0.0 AS DOUBLE), (a, e) -> a + abs(e))"))
    // n_fc reads DayGrid's GUARDED n (the ewmaFromCloses wiring).
    val nf = col("n") - lit(1L)
    val n = nf.cast("double")
    base.select(col("event_type"), nf.as("n_fc"),
      when(nf > 0, r4(col("kf.sae") / n / lit(1e6))).as("mae_kalman"),
      when(nf > 0, r4(sqrt(col("kf.sse") / n) / lit(1e6))).as("rmse_kalman"),
      when(nf > 0, r4(col("san") / n / lit(1e6))).as("mae_naive"),
      when(col("san") > 0, r4(col("kf.sae") / col("san"))).as("skill_vs_naive"),
      when(nf > 0, r4((col("kf.p") + lit(1e9)) / ((col("kf.p") + lit(1e9)) + lit(1e10))))
        .as("gain_final"))
  }

  // q292 — TABULAR CUSUM MEAN-SHIFT MONITOR: WHEN did the return
  // level drift, asked the way a process-control desk asks it (Page
  // 1954): the one-sided cumulative sums S⁺ₜ = max(0, S⁺ₜ₋₁ + (xₜ−μ)
  // − k) and S⁻ₜ (mirrored) with the textbook reference value
  // k = 0.5σ and decision interval h = 4σ — the SEQUENTIAL
  // complement to q271's retrospective Pettitt (Pettitt locates the
  // single best split in hindsight; CUSUM says how quickly an online
  // monitor would have fired, how often, and how hard the drift
  // pushed). μ and σ are the series' own exact-power-sum moments
  // (retrospective calibration, documented — an online desk would
  // freeze them from a reference window). Exactness: the recursion
  // is inherently sequential, so it rides the q210/q222 replay
  // discipline — DayGrid-guarded day-ordered arrays, Spark
  // `aggregate` over a 7-field named_struct vs DuckDB list_reduce
  // over 7-element LISTs with a prepended seed, bitwise-matched op
  // order; outputs quantize r4 and the alarm counts/indices are
  // exact by construction. Scale shape: one volume-sized DailyCloses
  // partial agg, then |types| day-grid array folds (O(n) each).
  // Output: |types| rows.
  private def q292(s: SparkSession, dir: String): DataFrame =
    cusumFromReturns(dailyReturns(s, dir))

  private[graft] def cusumFromReturns(rets: DataFrame): DataFrame = {
    val dd = (c: Column) => c.cast("double")
    val stats = rets.groupBy(col("event_type").as("et2"))
      .agg(count(lit(1)).as("nn"), sum(col("r_fp")).as("s1"),
        sum(col("r_fp") * col("r_fp")).as("s2"))
    val base = graft.operators.DayGrid
      .series(rets, "event_type", "day", "r_fp", "cusumFromReturns")
      .join(broadcast(stats), col("event_type") === col("et2"))
      .withColumn("xs", expr("transform(xs, x -> CAST(x AS DOUBLE))"))
      .withColumn("mu", dd(col("s1")) / dd(col("nn")))
      .withColumn("sg", sqrt((dd(col("s2")) -
        dd(col("s1")) * dd(col("s1")) / dd(col("nn"))) / dd(col("nn"))))
      // state: (S+, S-, max S+, max S-, alarm count, first-alarm
      // 1-based index or 0, position); the updated S± are recomputed
      // where needed — SQL lambdas have no lets, and the repeated
      // subexpression is the same IEEE value by definition
      .withColumn("st", expr(
        "aggregate(xs, " +
          "named_struct('sp', CAST(0.0 AS DOUBLE), 'sn', CAST(0.0 AS DOUBLE), " +
          "'mp', CAST(0.0 AS DOUBLE), 'mn', CAST(0.0 AS DOUBLE), " +
          "'na', CAST(0.0 AS DOUBLE), 'fa', CAST(0.0 AS DOUBLE), " +
          "'i', CAST(0.0 AS DOUBLE)), " +
          "(a, x) -> named_struct(" +
          "'sp', greatest(0.0D, a.sp + (x - mu) - 0.5D * sg), " +
          "'sn', greatest(0.0D, a.sn - (x - mu) - 0.5D * sg), " +
          "'mp', greatest(a.mp, greatest(0.0D, a.sp + (x - mu) - 0.5D * sg)), " +
          "'mn', greatest(a.mn, greatest(0.0D, a.sn - (x - mu) - 0.5D * sg)), " +
          "'na', a.na + IF(greatest(0.0D, a.sp + (x - mu) - 0.5D * sg) > 4.0D * sg " +
          "OR greatest(0.0D, a.sn - (x - mu) - 0.5D * sg) > 4.0D * sg, 1.0D, 0.0D), " +
          "'fa', IF(a.fa > 0.0D, a.fa, " +
          "IF(greatest(0.0D, a.sp + (x - mu) - 0.5D * sg) > 4.0D * sg " +
          "OR greatest(0.0D, a.sn - (x - mu) - 0.5D * sg) > 4.0D * sg, " +
          "a.i + 1.0D, 0.0D)), " +
          "'i', a.i + 1.0D))"))
    val valid = col("n") >= 2 && col("sg") > 0
    base.select(col("event_type"), col("n").as("n_days"),
      when(valid, r4(col("st.mp") / col("sg"))).as("max_pos_r4"),
      when(valid, r4(col("st.mn") / col("sg"))).as("max_neg_r4"),
      when(valid, col("st.na").cast("long")).as("n_alarms"),
      when(valid && col("st.fa") > 0, col("st.fa").cast("long"))
        .as("first_alarm"))
  }

  // q223 — ENGLE-GRANGER COINTEGRATION SCREEN (stage 2): q198 ships
  // the stage-1 hedge ratio; this query asks the question that makes
  // a pair TRADEABLE — is the residual spread mean-reverting? The
  // readout is the residual AR(1) coefficient ρ = Σe_{t−1}e_t /
  // Σe²_{t−1} (no intercept — stage-1 already centered the
  // residuals): ρ near 1 means the spread random-walks (spurious
  // regression), ρ well below 1 means shocks decay — flagged
  // `cointegrated` when the 1e-6-quantized ρ < 0.95, an integer
  // comparison so the boundary can't split engines. Exactness: β/α
  // close from the SAME six exact integer level sums as q198 (one
  // shared IEEE sequence); the residual series and both AR folds run
  // over day-ordered arrays with sequential `aggregate`/list_reduce
  // — bitwise-matched op order throughout. Scale shape: q198's —
  // dailyCloses' one partial agg, the day-keyed pair join on the
  // volume-independent day grid, |types|² output.
  private def q223(s: SparkSession, dir: String): DataFrame =
    cointFromCloses(dailyCloses(s, dir))

  /** q223's closing over any (event_type, day, close_lv) day grid
    * (the q198 sharing pattern). */
  private[graft] def cointFromCloses(cl: DataFrame): DataFrame = {
    val a = cl.select(col("event_type").as("type_a"), col("day"), col("close_lv").as("y"))
    val b = cl.select(col("event_type").as("type_b"), col("day"), col("close_lv").as("x"))
    val agg = a.join(b, Seq("day")).filter(col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sort_array(collect_list(struct(col("day"), col("x"), col("y")))).as("ps"))
    def d(c: Column) = c.cast("double")
    val n = d(col("n_days"))
    val denB = n * d(col("sxx")) - d(col("sx")) * d(col("sx"))
    val betaE = (n * d(col("sxy")) - d(col("sx")) * d(col("sy"))) / denB
    val wr = agg
      .withColumn("beta", when(denB =!= 0, betaE))
      .withColumn("alpha", (d(col("sy")) - col("beta") * d(col("sx"))) / n)
      .withColumn("es", expr(
        "transform(ps, p -> CAST(p.y AS DOUBLE) - (alpha + beta * CAST(p.x AS DOUBLE)))"))
      .withColumn("num", expr("IF(size(es) > 1, " +
        "aggregate(sequence(1, size(es) - 1), CAST(0.0 AS DOUBLE), " +
        "(a, k) -> a + es[k - 1] * es[k]), NULL)"))
      .withColumn("den", expr("IF(size(es) > 1, " +
        "aggregate(sequence(1, size(es) - 1), CAST(0.0 AS DOUBLE), " +
        "(a, k) -> a + es[k - 1] * es[k - 1]), NULL)"))
    val rho = col("num") / col("den")
    // n_days is re-read as the GUARDED size of the collected residual
    // series (same value — count and collect_list run over the same
    // group), so a tick-grain pair feed trips the DayGrid grain
    // contract before the AR folds run (round-14 Next #2).
    val guardedDays = graft.operators.DayGrid.guardedSize("cointFromCloses",
      concat(col("type_a"), lit("|"), col("type_b")), col("ps"))
    wr.select(col("type_a"), col("type_b"), guardedDays.as("n_days"),
      when(col("beta").isNotNull, r4(col("beta"))).as("beta_r4"),
      when(col("alpha").isNotNull, r4(col("alpha") / lit(1e6))).as("alpha_r4"),
      when(col("den") > 0, r4(rho)).as("rho_r4"),
      when(col("den") > 0, floor(rho * lit(1e6) + lit(0.5d)) < lit(950000L))
        .as("cointegrated"))
  }

  // q247 — AUTOCORRELATION FUNCTION + LJUNG-BOX PORTMANTEAU: the
  // time-series diagnostic every forecast in this battery implicitly
  // assumes — are daily returns serially correlated at lags 1..5,
  // and does the joint Ljung-Box Q statistic reject white noise
  // (Box & Pierce 1970, Ljung & Box 1978)? Exactness: returns are
  // exact micro-log2 integers; every ACF is an EXACT INTEGER ratio —
  // multiplying the demeaned covariance through by n² clears the
  // rational mean x̄ = s1/n, so ρ_k = B_k / (n·A) with
  // B_k = n²·Σx_t·x_{t−k} − n·s1·(head_k + tail_k) + (n−k)·s1² and
  // A = n·Σx² − s1², all in decimal(38,0) (HUGEINT oracle — the
  // q175 s3/s4 discipline: n²·Σxx wraps LONG at day-grid scale), and
  // the ONLY IEEE op per lag is the closing divide. Ljung-Box runs
  // on the QUANTIZED ρ6 integers — each term (ρ6²·1000) DIV (n−k)
  // is exact integer, so Q needs no float sum across lags. Scale
  // shape: q221's — one volume-sized DailyCloses partial agg, then
  // |types| day-grid array folds. Output: |types| rows.
  private def q247(s: SparkSession, dir: String): DataFrame =
    acfLjungBox(dailyReturns(s, dir))

  /** q247's closing over any (event_type, day, r_fp) return grid. */
  private[graft] def acfLjungBox(rets: DataFrame): DataFrame = {
    val maxLag = 5
    val withLags = acfLagFrame(rets, maxLag)
    val lbS = (1 to maxLag)
      .map(k => s"(rho$k * rho$k * 1000L) DIV (n - $k)").mkString(" + ")
    withLags
      .withColumn("lb_s", expr(s"IF(n > $maxLag AND a_den > 0, $lbS, NULL)"))
      .select(
        (Seq(col("event_type"), col("n").as("n_days")) ++
          (1 to maxLag).map(k =>
            (col(s"rho$k").cast("double") / lit(1e6)).as(s"acf${k}_r6")) :+
          (floor(col("n").cast("double") * (col("n").cast("double") + lit(2.0))
            * col("lb_s").cast("double") / lit(1e15) * lit(1e4) + lit(0.5))
            / lit(1e4)).as("lb_q_r4")): _*)
  }

  // ---------------------------------------------------------------
  // q281 — ARCH EFFECT (McLeod-Li): does VOLATILITY cluster — the
  // Ljung-Box portmanteau of q247 applied to SQUARED daily returns
  // at lags 1..5 (McLeod & Li 1983), the standard pre-test before
  // any conditional-variance fit: returns can be serially flat while
  // their squares are strongly autocorrelated — the ARCH signature
  // (Engle 1982). Machinery: EXACTLY q247's exact-integer lag frame
  // fed r² (|r| ≲ 2²⁴ on a day grid, so r² ≲ 2⁴⁸ fits the long
  // element; the frame's SUMS ride decimal since this round — the
  // widen-before-multiply rule applied at the sum), so every ρ is an
  // exact integer ratio quantized at 1e-6 and the LB fold is
  // integer. The one new motion vs q247: an α = 0.05 decision — the
  // df is STRUCTURAL (always 5 lags), so the χ²(0.95) boundary is
  // the FIXED literal 11.0705 (the q270 fixed-boundary style, no
  // table join) against the quantized LB integer. Scale shape:
  // q247's — one volume-sized DailyCloses partial agg, then |types|
  // day-grid array folds. Output: |types| rows.
  private def q281(s: SparkSession, dir: String): DataFrame =
    archLm(dailyReturns(s, dir))

  /** q281's closing over any (event_type, day, r_fp) return grid —
    * ONE code path with the streaming serve
    * (StreamPipeline.archServe over the closes store). */
  private[graft] def archLm(rets: DataFrame): DataFrame =
    acfLjungBox(rets.select(col("event_type"), col("day"),
      (col("r_fp") * col("r_fp")).as("r_fp")))
      .withColumn("reject_arch",
        when(col("lb_q_r4").isNotNull,
          floor(col("lb_q_r4") * lit(1e4) + lit(0.5d)).cast("long") > lit(110705L)))

  // ---------------------------------------------------------------
  // q282 — WEEKDAY (DAY-OF-WEEK) EFFECT: do daily returns differ by
  // calendar weekday — the classic "Monday effect" seasonality screen
  // (French 1980), asked distribution-free: Kruskal-Wallis across the
  // seven weekday groups, POOLED across instruments (micro-log2
  // returns are unit-comparable by construction). gk is the exact
  // integer epoch-day mod 7 — identical arithmetic on both engines
  // (no locale-dependent weekday function crosses the oracle
  // boundary). Machinery: ONE code path with q263 — the shared
  // [[InsightQueries.kruskalWallis]] closing (global midranks via
  // chunk-banded running counts, per-group terms quantized before
  // the k-row sum, χ² table join on df = k−1). Scale shape: the
  // day-grid RETURNS feed is volume-independent after dailyCloses'
  // one partial agg, and the KW grid is (weekday × cents)-bounded.
  // Output: 1 row.
  private def q282(s: SparkSession, dir: String): DataFrame = {
    val obs = dailyReturns(s, dir).select(
      (datediff(col("day"), lit("1970-01-01")) % 7).cast("long").as("gk"),
      col("r_fp").as("vc"))
    InsightQueries.kruskalWallis(obs, "returns~weekday")
  }

  // ---------------------------------------------------------------
  // q284 — INTRADAY MOMENTUM (Wilcoxon signed-rank, AM vs PM): does
  // the afternoon move systematically differ from the morning move —
  // the paired, distribution-free sibling of q250's two-sample test
  // (Wilcoxon 1945), asked per instrument over the natural intraday
  // pairing: for each (type, day), d = PM move − AM move =
  // (close − mid) − (mid − open) = close + open − 2·mid, with open
  // the day's first tick, close its last, and mid the last PRE-NOON
  // tick (all by the deterministic (ts, event_id) total order —
  // days with no AM tick drop, zero-d days drop per the standard
  // zero-exclusion). |d| midranks come DOUBLED off the per-type
  // (|d|) value grid's running counts (2R = 2·prev + t + 1 — the
  // q250 exact-integer move), so 2W⁺ is an exact integer; the
  // tie-corrected normal approximation closes in ONE IEEE sequence:
  // z = (2W⁺ − n(n+1)/2) / √(v12/12) with v12 = 2n(n+1)(2n+1) −
  // Σ(t³−t) EXACT in decimal (HUGEINT oracle — n³ wraps long at
  // minute-grain day counts), two-sided α = 0.05 on the quantized
  // z₄ (|z₄| > 19600). Scale shape: ONE volume-sized partial agg to
  // (type, day) triples, then |types|×|days|-bounded grids and
  // per-type windows. Output: |types| rows.
  private def q284(s: SparkSession, dir: String): DataFrame =
    wilcoxonAmPm(Tables.events(s, dir).filter(col("value").isNotNull))

  private[graft] def wilcoxonAmPm(ev: DataFrame): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val dd = (c: Column) => c.cast("double")
    val t = ev
      .withColumn("day", to_date(col("ts")))
      .withColumn("vc", floor(col("value") * lit(100d) + lit(0.5d)).cast("long"))
      .withColumn("am", hour(col("ts")) < 12)
    val per = t.groupBy(col("event_type"), col("day")).agg(
      min(struct(col("ts"), col("event_id"), col("vc"))).getField("vc").as("open_lv"),
      max(struct(col("ts"), col("event_id"), col("vc"))).getField("vc").as("close_lv"),
      max(when(col("am"), struct(col("ts"), col("event_id"), col("vc"))))
        .getField("vc").as("mid_lv"))
      .filter(col("mid_lv").isNotNull)
      .withColumn("d", col("close_lv") + col("open_lv") - lit(2L) * col("mid_lv"))
      .filter(col("d") =!= 0)
      .withColumn("ad", abs(col("d")))
    val cells = per.groupBy(col("event_type"), col("ad")).agg(
      count(lit(1)).as("t"),
      sum(when(col("d") > 0, 1L).otherwise(0L)).as("tp"))
    val wv = Window.partitionBy(col("event_type")).orderBy(col("ad"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = cells.withColumn("ct", sum(col("t")).over(wv))
      .withColumn("prev", col("ct") - col("t"))
      // doubled midrank per positive-d member of the tie cell; the
      // factors stay ≤ 3n so the long product is day-grid safe
      .withColumn("w2c", col("tp") * (lit(2L) * col("prev") + col("t") + lit(1L)))
      .withColumn("tie3", d38(col("t")) * d38(col("t")) * d38(col("t")) - d38(col("t")))
    val agg = cum.groupBy(col("event_type")).agg(
      sum(col("t")).as("n"), sum(col("tp")).as("n_pos"),
      sum(col("w2c")).as("w2"), sum(col("tie3")).as("ties3"))
      .filter(col("n") >= 2)
    val nd = d38(col("n"))
    val v12 = lit(2).cast("decimal(38,0)") * nd * (nd + lit(1)) *
      (lit(2).cast("decimal(38,0)") * nd + lit(1)) - col("ties3")
    val mu2 = expr("(n * (n + 1)) DIV 2")
    val z = (dd(col("w2")) - dd(mu2)) / sqrt(dd(v12) / lit(12.0))
    val z4 = floor(z * lit(1e4) + lit(0.5)).cast("long")
    agg.withColumn("v12", v12)
      .select(col("event_type"), col("n").as("n_eff"), col("n_pos"),
        when(dd(col("v12")) > 0, z4.cast("double") / lit(1e4)).as("z_r4"),
        when(dd(col("v12")) > 0, abs(z4) > lit(19600L)).as("reject_sym"))
  }

  /** q247/q256's shared per-type lag frame: n, a_den and the
    * quantized ρ6 integers rho1..rho{maxLag} off exact-integer
    * n²-cleared covariances.
    *
    * GRAIN CONTRACT: the input must be DAY-GRID (or coarser) — one
    * row per (event_type, day), the q221/DailyCloses argument, so the
    * per-type `collect_list` is |days|-bounded (30 years of days is
    * ~11k longs ≈ 88 KB; even minute-grain decades stay ≤ ~42 MB). A
    * caller feeding TICK-grain rows would build per-type arrays the
    * size of the volume; the guard below fails any per-type series
    * longer than [[AcfMaxSeriesLen]] with a grain-contract message
    * before the O(n·lag) folds run (a wrong-grain feed dies loudly,
    * not as an inscrutable executor OOM). Per-factor decimal widening
    * in cross_k mirrors sxx and
    * the oracle's HUGEINT discipline (micro-log2 products sit just
    * under Long.Max — correct today, but only by ~2×; widen-before-
    * multiply is the battery's rule, not a per-site judgement call). */
  private[graft] val AcfMaxSeriesLen = graft.operators.DayGrid.MaxSeriesLen

  private[graft] def acfLagFrame(rets: DataFrame, maxLag: Int): DataFrame = {
    val base = graft.operators.DayGrid
      .series(rets, "event_type", "day", "r_fp", "acfLagFrame")
      // exact integer power sums; s1 rides decimal since round 15 —
      // q281 feeds SQUARED returns through this frame (elements up to
      // ~2^48), where a BIGINT day-grid sum keeps only ~3x headroom;
      // same exact values, wider carrier (the widen-before-multiply
      // rule applied to the sum). Σx² rides decimal like q175's s3/s4
      .withColumn("s1", expr(
        "aggregate(xs, CAST(0 AS DECIMAL(38,0)), (a, e) -> a + CAST(e AS DECIMAL(38,0)))"))
      .withColumn("sxx", expr(
        "aggregate(xs, CAST(0 AS DECIMAL(38,0)), (a, e) -> a + CAST(e AS DECIMAL(38,0)) * CAST(e AS DECIMAL(38,0)))"))
      .withColumn("a_den", expr(
        "CAST(n AS DECIMAL(38,0)) * sxx - CAST(s1 AS DECIMAL(38,0)) * CAST(s1 AS DECIMAL(38,0))"))
    val withLags = (1 to maxLag).foldLeft(base) { (df, k) =>
      df
        .withColumn(s"cross$k", expr(
          s"IF(n > $k, aggregate(transform(sequence($k, CAST(n - 1 AS INT)), " +
            s"i -> CAST(xs[i] AS DECIMAL(38,0)) * CAST(xs[i - $k] AS DECIMAL(38,0))), " +
            s"CAST(0 AS DECIMAL(38,0)), (a, e) -> a + e), NULL)"))
        .withColumn(s"head$k", expr(
          s"IF(n > $k, aggregate(slice(xs, 1, CAST(n - $k AS INT)), CAST(0 AS DECIMAL(38,0)), (a, e) -> a + CAST(e AS DECIMAL(38,0))), NULL)"))
        .withColumn(s"tail$k", expr(
          s"IF(n > $k, aggregate(slice(xs, $k + 1, CAST(n - $k AS INT)), CAST(0 AS DECIMAL(38,0)), (a, e) -> a + CAST(e AS DECIMAL(38,0))), NULL)"))
        .withColumn(s"b$k", expr(
          s"CAST(n AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0)) * cross$k " +
            s"- CAST(n AS DECIMAL(38,0)) * CAST(s1 AS DECIMAL(38,0)) * CAST(head$k + tail$k AS DECIMAL(38,0)) " +
            s"+ CAST(n - $k AS DECIMAL(38,0)) * CAST(s1 AS DECIMAL(38,0)) * CAST(s1 AS DECIMAL(38,0))"))
        .withColumn(s"rho$k", expr(
          s"IF(n > $k AND a_den > 0, CAST(floor(CAST(b$k AS DOUBLE) " +
            s"/ CAST(CAST(n AS DECIMAL(38,0)) * a_den AS DOUBLE) * 1e6 + 0.5D) AS BIGINT), NULL)"))
    }
    withLags
  }

  // q256 — PARTIAL AUTOCORRELATION (Durbin-Levinson): q247's ACF
  // answers "is there serial correlation"; the PACF answers WHICH AR
  // ORDER explains it — the lag-k coefficient with lags 1..k−1
  // partialled out, THE readout an analyst boxes against the ACF to
  // pick AR vs MA signatures (Box & Jenkins 1970). Exactness: the
  // recursion's INPUTS are the QUANTIZED ρ6 integers (identical on
  // both engines by q247's exact-integer construction), and
  // Durbin-Levinson is then pure PER-ROW IEEE arithmetic unrolled in
  // one fixed expression order (each φ_{k,j} is its own column,
  // mirrored textually in the oracle) — nothing float ever sums
  // across rows, so rows match bitwise before the final r6. Scale
  // shape: q247's — one DailyCloses partial agg, |types| rows of
  // day-grid folds.
  private def q256(s: SparkSession, dir: String): DataFrame =
    pacf(dailyReturns(s, dir))

  private[graft] def pacf(rets: DataFrame): DataFrame = {
    val base = acfLagFrame(rets, 5)
    val withR = (1 to 5).foldLeft(base)((df, k) =>
      df.withColumn(s"r$k", col(s"rho$k").cast("double") / lit(1e6)))
    // Durbin-Levinson unrolled; every intermediate is a named column
    // so the evaluation order is pinned on both engines
    val dl = withR
      .withColumn("p11", col("r1"))
      .withColumn("den2", lit(1.0) - col("p11") * col("r1"))
      .withColumn("p22",
        when(col("den2") =!= 0.0, (col("r2") - col("p11") * col("r1")) / col("den2")))
      .withColumn("p21", col("p11") - col("p22") * col("p11"))
      .withColumn("den3",
        lit(1.0) - (col("p21") * col("r1") + col("p22") * col("r2")))
      .withColumn("p33", when(col("den3") =!= 0.0,
        (col("r3") - (col("p21") * col("r2") + col("p22") * col("r1"))) / col("den3")))
      .withColumn("p31", col("p21") - col("p33") * col("p22"))
      .withColumn("p32", col("p22") - col("p33") * col("p21"))
      .withColumn("den4",
        lit(1.0) - (col("p31") * col("r1") + col("p32") * col("r2")
          + col("p33") * col("r3")))
      .withColumn("p44", when(col("den4") =!= 0.0,
        (col("r4") - (col("p31") * col("r3") + col("p32") * col("r2")
          + col("p33") * col("r1"))) / col("den4")))
      .withColumn("p41", col("p31") - col("p44") * col("p33"))
      .withColumn("p42", col("p32") - col("p44") * col("p32"))
      .withColumn("p43", col("p33") - col("p44") * col("p31"))
      .withColumn("den5",
        lit(1.0) - (col("p41") * col("r1") + col("p42") * col("r2")
          + col("p43") * col("r3") + col("p44") * col("r4")))
      .withColumn("p55", when(col("den5") =!= 0.0,
        (col("r5") - (col("p41") * col("r4") + col("p42") * col("r3")
          + col("p43") * col("r2") + col("p44") * col("r1"))) / col("den5")))
    val r6 = (c: Column) => floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
    dl.select(col("event_type"), col("n").as("n_days"),
      r6(col("p11")).as("pacf1_r6"), r6(col("p22")).as("pacf2_r6"),
      r6(col("p33")).as("pacf3_r6"), r6(col("p44")).as("pacf4_r6"),
      r6(col("p55")).as("pacf5_r6"))
  }

  // ---------------------------------------------------------------
  // q257 — JARQUE-BERA NORMALITY TEST: the joint skewness/kurtosis
  // normality check (Jarque & Bera 1980) on daily returns — the
  // formal decision q175's higher moments only describe; every
  // parametric risk number downstream (q199's Sharpe, q221's
  // variance-based bands) silently assumes it. Exactness: the raw
  // power sums are q175's EXACT integers (s1/s2 long, s3/s4 decimal
  // / HUGEINT); skew g1 and excess kurtosis g2 close in q175's
  // EXACT IEEE sequence and quantize to 1e4 fixed point; JB then
  // needs NO float at all — jb_fp = n·(4·g1₄² + g2₄²) is exact
  // integer (decimal-widened per factor), jb = jb_fp / 24e8, and the
  // α = 0.05 decision compares jb_fp against the exact integer
  // boundary 14379516000 (= χ²₂(0.95) = 5.991465 cleared of both
  // denominators), never a float boundary. Scale shape: q175's — one
  // volume-sized DailyCloses partial agg, then |types| day-grid
  // rows. Output: |types| rows.
  private def q257(s: SparkSession, dir: String): DataFrame =
    jarqueBera(dailyReturns(s, dir))

  private[graft] def jarqueBera(rets: DataFrame): DataFrame = {
    val r1c = col("r_fp")
    val r2c = r1c * r1c // exact long: |r| <= ~2^24 on a day grid
    val agg = rets
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        sum(r1c).as("s1"), sum(r2c).as("s2"),
        sum(r2c.cast("decimal(19,0)") * r1c).as("s3"),
        sum(r2c.cast("decimal(19,0)") * r2c).as("s4"))
    def d(c: Column) = c.cast("double")
    val n   = d(col("n_days"))
    val rm1 = d(col("s1")) / n
    val rm2 = d(col("s2")) / n
    val rm3 = d(col("s3")) / n
    val rm4 = d(col("s4")) / n
    val mu2 = rm2 - rm1 * rm1
    val mu3 = rm3 - lit(3d) * rm1 * rm2 + lit(2d) * rm1 * rm1 * rm1
    val mu4 = rm4 - lit(4d) * rm1 * rm3 + lit(6d) * rm1 * rm1 * rm2 -
      lit(3d) * rm1 * rm1 * rm1 * rm1
    val g1q = floor(mu3 / (sqrt(mu2) * mu2) * lit(1e4) + lit(0.5)).cast("long")
    val g2q = floor((mu4 / (mu2 * mu2) - lit(3d)) * lit(1e4) + lit(0.5)).cast("long")
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val jbFp = d38(col("n_days")) *
      (lit(4L).cast("decimal(38,0)") * d38(col("g1q")) * d38(col("g1q")) +
        d38(col("g2q")) * d38(col("g2q")))
    agg
      .withColumn("g1q", when(mu2 > 0, g1q))
      .withColumn("g2q", when(mu2 > 0, g2q))
      .withColumn("jb_fp", jbFp)
      .select(col("event_type"), col("n_days"),
        (col("g1q").cast("double") / lit(1e4)).as("skew_r4"),
        (col("g2q").cast("double") / lit(1e4)).as("kurt_x_r4"),
        (floor(col("jb_fp").cast("double") / lit(24e8) * lit(1e4) + lit(0.5))
          / lit(1e4)).as("jb_r4"),
        (col("jb_fp") > lit(14379516000L)).as("reject"))
  }

  // ---------------------------------------------------------------
  // q289 — D'AGOSTINO K² NORMALITY TEST: the finite-sample companion
  // to q257's Jarque-Bera — JB's χ²₂ approximation is notoriously
  // oversized below a few thousand observations, so the standard
  // omnibus alternative (D'Agostino 1970 skewness transform;
  // Anscombe & Glynn 1983 kurtosis transform; D'Agostino, Belanger &
  // D'Agostino 1990) normalizes g1 and b2 SEPARATELY with their
  // exact finite-n null moments before squaring: K² = Z(g1)² +
  // Z(b2)² ~ χ²₂ holds at the n a day grid actually has. Exactness:
  // the moment base is q257's — exact integer/decimal power sums
  // s1..s4, the SAME IEEE central-moment sequence — then both
  // transforms are ONE shared IEEE sequence (sqrt/ln/cbrt exist with
  // identical IEEE semantics on both engines), each z quantized to
  // 1e4 fixed point, and K²·1e8 = z1q² + z2q² is an EXACT integer
  // (decimal-widened per factor: z·1e4 can pass 2³¹·√n at extreme
  // drift) compared against the exact integer boundary 599150000
  // (= χ²₂(0.95) in the shared table's 1e4 grain, cleared of the
  // quantizers — the q257 fixed-boundary style, df structural at 2).
  // Validity: n ≥ 20 (Anscombe's own floor; it also guarantees
  // W² > 1 so ln W > 0 — below it the transform itself is
  // undefined) and mu2 > 0. Scale shape: q257's — one volume-sized
  // DailyCloses partial agg, |types| day-grid rows. Output: |types|
  // rows.
  private def q289(s: SparkSession, dir: String): DataFrame =
    dagostinoK2(dailyReturns(s, dir))

  private[graft] def dagostinoK2(rets: DataFrame): DataFrame = {
    val r1c = col("r_fp")
    val r2c = r1c * r1c
    val agg = rets.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        sum(r1c).as("s1"), sum(r2c).as("s2"),
        sum(r2c.cast("decimal(19,0)") * r1c).as("s3"),
        sum(r2c.cast("decimal(19,0)") * r2c).as("s4"))
    def d(c: Column) = c.cast("double")
    val n   = d(col("n_days"))
    val rm1 = d(col("s1")) / n
    val rm2 = d(col("s2")) / n
    val rm3 = d(col("s3")) / n
    val rm4 = d(col("s4")) / n
    val mu2 = rm2 - rm1 * rm1
    val mu3 = rm3 - lit(3d) * rm1 * rm2 + lit(2d) * rm1 * rm1 * rm1
    val mu4 = rm4 - lit(4d) * rm1 * rm3 + lit(6d) * rm1 * rm1 * rm2 -
      lit(3d) * rm1 * rm1 * rm1 * rm1
    val g1 = mu3 / (sqrt(mu2) * mu2)
    val b2 = mu4 / (mu2 * mu2)
    // D'Agostino (1970): Z(g1) via the Johnson SU fit
    val y = g1 * sqrt((n + lit(1d)) * (n + lit(3d)) / (lit(6d) * (n - lit(2d))))
    val beta2 = lit(3d) * (n * n + lit(27d) * n - lit(70d)) * (n + lit(1d)) *
      (n + lit(3d)) /
      ((n - lit(2d)) * (n + lit(5d)) * (n + lit(7d)) * (n + lit(9d)))
    val w2 = sqrt(lit(2d) * (beta2 - lit(1d))) - lit(1d)
    val dlt = lit(1d) / sqrt(log(sqrt(w2)))
    val ya = y / sqrt(lit(2d) / (w2 - lit(1d)))
    val z1 = dlt * log(ya + sqrt(ya * ya + lit(1d)))
    // Anscombe & Glynn (1983): Z(b2) via the Wilson-Hilferty cube root
    val eb2 = lit(3d) * (n - lit(1d)) / (n + lit(1d))
    val vb2 = lit(24d) * n * (n - lit(2d)) * (n - lit(3d)) /
      ((n + lit(1d)) * (n + lit(1d)) * (n + lit(3d)) * (n + lit(5d)))
    val x = (b2 - eb2) / sqrt(vb2)
    val sb1 = lit(6d) * (n * n - lit(5d) * n + lit(2d)) /
      ((n + lit(7d)) * (n + lit(9d))) *
      sqrt(lit(6d) * (n + lit(3d)) * (n + lit(5d)) /
        (n * (n - lit(2d)) * (n - lit(3d))))
    val aA = lit(6d) + lit(8d) / sb1 *
      (lit(2d) / sb1 + sqrt(lit(1d) + lit(4d) / (sb1 * sb1)))
    val z2 = ((lit(1d) - lit(2d) / (lit(9d) * aA)) -
      cbrt((lit(1d) - lit(2d) / aA) /
        (lit(1d) + x * sqrt(lit(2d) / (aA - lit(4d)))))) /
      sqrt(lit(2d) / (lit(9d) * aA))
    val valid = col("n_days") >= 20 && mu2 > 0
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val k2fp = d38(col("z1q")) * d38(col("z1q")) +
      d38(col("z2q")) * d38(col("z2q"))
    agg
      .withColumn("z1q", when(valid,
        floor(z1 * lit(1e4) + lit(0.5)).cast("long")))
      .withColumn("z2q", when(valid,
        floor(z2 * lit(1e4) + lit(0.5)).cast("long")))
      .select(col("event_type"), col("n_days"),
        (col("z1q").cast("double") / lit(1e4)).as("z_skew_r4"),
        (col("z2q").cast("double") / lit(1e4)).as("z_kurt_r4"),
        (floor(k2fp.cast("double") / lit(1e4) + lit(0.5)).cast("long")
          .cast("double") / lit(1e4)).as("k2_r4"),
        (k2fp > lit(599150000L)).as("reject"))
  }

  // ---------------------------------------------------------------
  // q258 — WALD-WOLFOWITZ RUNS TEST: are the SIGNS of daily returns
  // randomly ordered (Wald & Wolfowitz 1940)? Too few runs means
  // sign momentum, too many means flip-flopping mean reversion — the
  // nonparametric companion to q176's magnitude-weighted ACF (a
  // handful of huge days can hide sign structure from Pearson;
  // the runs count cannot be dragged). Exactness: signs and the run
  // count are exact integers off the micro-log2 return grid
  // (zero-return days drop, the textbook convention); n₊, n₋, R are
  // exact; the normal z closes in ONE shared IEEE sequence and the
  // α = 0.05 decision tests the QUANTIZED |z₄| > 19600. Scale
  // shape: one DailyCloses partial agg, a day-grid lag per type,
  // |types| output rows.
  private def q258(s: SparkSession, dir: String): DataFrame =
    runsTest(dailyReturns(s, dir))

  private[graft] def runsTest(rets: DataFrame): DataFrame = {
    val wd = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val per = rets
      .filter(col("r_fp") =!= 0L)
      .withColumn("sgn", when(col("r_fp") > 0, lit(1)).otherwise(lit(-1)))
      .withColumn("prev", lag(col("sgn"), 1).over(wd))
      .groupBy(col("event_type"))
      .agg(sum(when(col("sgn") === 1, lit(1L)).otherwise(lit(0L))).as("n_pos"),
        sum(when(col("sgn") === -1, lit(1L)).otherwise(lit(0L))).as("n_neg"),
        sum(when(col("prev").isNull || col("sgn") =!= col("prev"), lit(1L))
          .otherwise(lit(0L))).as("n_runs"))
    def d(c: Column) = c.cast("double")
    val nT = d(col("n_pos")) + d(col("n_neg"))
    val m2 = lit(2d) * d(col("n_pos")) * d(col("n_neg"))
    val mu = m2 / nT + lit(1d)
    val vr = m2 * (m2 - nT) / (nT * nT * (nT - lit(1d)))
    val z4 = floor((d(col("n_runs")) - mu) / sqrt(vr) * lit(1e4) + lit(0.5))
      .cast("long")
    // nT > 1 guards the 0/0 = NaN case explicitly: Spark orders NaN
    // ABOVE every number, so a bare vr > 0 would pass it
    val ok = (nT > lit(1d)) && (vr > 0)
    per.select(col("event_type"), col("n_pos"), col("n_neg"), col("n_runs"),
      when(ok, z4.cast("double") / lit(1e4)).as("z_r4"),
      when(ok, abs(z4) > 19600L).as("reject"))
  }

  // ---------------------------------------------------------------
  // q259 — MANN-KENDALL TREND TEST: is there ANY monotone trend in
  // each instrument's daily closes (Mann 1945, Kendall 1975) — the
  // nonparametric decision next to q252's Theil-Sen slope ESTIMATE
  // (the pair every hydrology/quality handbook ships together: MK
  // says whether, Theil-Sen says how steep). Exactness: S =
  // Σ_{i<j} sgn(x_j − x_i) is an exact integer fold over the sorted
  // day-grid close array (q252's C(n,2) enumeration — sgn terms,
  // not slopes); the tie-corrected variance numerator
  // n(n−1)(2n+5) − Σ_t t(t−1)(2t+5) is exact decimal (HUGEINT
  // oracle — n³-order at day-grid scale); the normal z (with the
  // ±1 continuity correction) closes in ONE shared IEEE sequence
  // and the decision tests the QUANTIZED |z₄| > 19600. Scale shape:
  // q252's — the day grid is volume-independent, so the C(n,2) fold
  // is per-type array work over bounded n (the acfLagFrame grain
  // argument); tie counts come from a (type, close) grid agg, never
  // a window. Output: |types| rows.
  private def q259(s: SparkSession, dir: String): DataFrame =
    mannKendall(graft.operators.DailyCloses.closes(
      graft.operators.DailyCloses.state(Tables.events(s, dir))))

  private[graft] def mannKendall(cl: DataFrame): DataFrame = {
    val base = graft.operators.DayGrid
      .series(cl, "event_type", "day", "close_lv", "mannKendall")
      .withColumnRenamed("n", "m")
      .filter(col("m") >= 2)
      .withColumn("s_stat", expr(
        "aggregate(flatten(transform(sequence(0, CAST(m - 2 AS INT)), " +
          "i -> transform(sequence(i + 1, CAST(m - 1 AS INT)), " +
          "j -> CAST(CASE WHEN xs[j] > xs[i] THEN 1 " +
          "WHEN xs[j] < xs[i] THEN -1 ELSE 0 END AS BIGINT)))), " +
          "CAST(0 AS BIGINT), (a, e) -> a + e)"))
    val ties = cl
      .groupBy(col("event_type"), col("close_lv"))
      .agg(count(lit(1)).as("t"))
      .groupBy(col("event_type"))
      .agg(sum(col("t").cast("decimal(38,0)") * (col("t") - lit(1L)) *
        (lit(2L) * col("t") + lit(5L))).as("tie_term"))
    val joined = base.join(ties, Seq("event_type"))
      .withColumn("var_num", expr(
        "CAST(m AS DECIMAL(38,0)) * CAST(m - 1 AS DECIMAL(38,0)) " +
          "* CAST(2 * m + 5 AS DECIMAL(38,0)) - tie_term"))
    def d(c: Column) = c.cast("double")
    val varS = d(col("var_num")) / lit(18d)
    val zNum = when(col("s_stat") > 0, d(col("s_stat")) - lit(1d))
      .when(col("s_stat") < 0, d(col("s_stat")) + lit(1d))
      .otherwise(lit(0d))
    val z4 = floor(zNum / sqrt(varS) * lit(1e4) + lit(0.5)).cast("long")
    joined.select(col("event_type"), col("m").as("n_days"), col("s_stat"),
      when(varS > 0, z4.cast("double") / lit(1e4)).as("z_r4"),
      when(varS > 0, abs(z4) > 19600L).as("reject"))
  }

  // ---------------------------------------------------------------
  // q276 — KPSS LEVEL-STATIONARITY TEST: is each instrument's close
  // LEVEL stationary around a constant (Kwiatkowski, Phillips,
  // Schmidt & Shin 1992) — the stationarity decision completing the
  // day-grid ladder (q259 trend, q271 change point, q261 long
  // memory): η = n⁻² Σ S_t² / σ̂²_lr with S_t the partial sums of the
  // demeaned series and σ̂²_lr the Bartlett-kernel long-run variance
  // at lag l = min(n−1, ⌊4(n/100)^¼⌋); reject level stationarity at
  // 5% when η > 0.4630 (the paper's Table 1 critical value — a FIXED
  // literal boundary, no table join). Exactness: the n-multiply
  // demeaning trick makes EVERYTHING exact until one closing divide —
  // y_t = n·x_t − Σx is exact decimal, the partial-sum square sum
  // ΣS'² rides ONE O(n) fold carrying (cum, Σcum²), γ'_j = Σ y_t
  // y_{t−j} are exact decimal lag folds, and the Bartlett weights
  // (1 − j/(l+1)) clear their denominator into the SINGLE rational
  // D' = (l+1)γ'₀ + 2Σ_j (l+1−j)γ'_j, so η = ΣS'²·(l+1)/(n·D') is
  // ONE IEEE division of exact integers (the powers of n cancel:
  // ΣS_t²/n² = ΣS'²/n⁴, σ̂² = D'/((l+1)n³)); the decision tests the
  // QUANTIZED η₄ > 4630. The lag rule's (n/100)^¼ computes as
  // sqrt(sqrt(·)) — two correctly-rounded IEEE ops, identical in
  // both engines. A constant series (D' = 0) yields NULL. Scale
  // shape: one DailyCloses partial agg, then |types| day-grid array
  // folds (O(n·l) — the hurstRs class, DayGrid-guarded, volume-
  // independent). Output: |types| rows.
  private def q276(s: SparkSession, dir: String): DataFrame =
    kpss(dailyCloses(s, dir))

  private[graft] def kpss(cl: DataFrame): DataFrame = {
    val dd = (c: Column) => c.cast("double")
    val base = graft.operators.DayGrid
      .series(cl, "event_type", "day", "close_lv", "kpss")
      .filter(col("n") >= 2)
      .withColumn("sx", expr(
        "aggregate(xs, CAST(0 AS BIGINT), (a, e) -> a + e)"))
      .withColumn("ys", expr(
        "transform(xs, x -> CAST(n AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0)) " +
          "- CAST(sx AS DECIMAL(38,0)))"))
      .withColumn("ssq", expr(
        "aggregate(ys, named_struct('c', CAST(0 AS DECIMAL(38,0)), " +
          "'s', CAST(0 AS DECIMAL(38,0))), " +
          "(a, y) -> named_struct('c', a.c + y, 's', a.s + (a.c + y) * (a.c + y)), " +
          "a -> a.s)"))
      .withColumn("l", least(
        expr("CAST(floor(4.0 * sqrt(sqrt(CAST(n AS DOUBLE) / 100.0))) AS INT)"),
        (col("n") - lit(1L)).cast("int")))
      .withColumn("g0", expr(
        "aggregate(ys, CAST(0 AS DECIMAL(38,0)), (a, y) -> a + y * y)"))
      .withColumn("dsum", expr(
        "IF(l >= 1, aggregate(sequence(1, l), CAST(0 AS DECIMAL(38,0)), " +
          "(a, j) -> a + CAST(l + 1 - j AS DECIMAL(38,0)) * " +
          "aggregate(sequence(j + 1, CAST(n AS INT)), CAST(0 AS DECIMAL(38,0)), " +
          "(b, t) -> b + ys[t - 1] * ys[t - 1 - j])), CAST(0 AS DECIMAL(38,0)))"))
      .withColumn("dprime", expr(
        "CAST(l + 1 AS DECIMAL(38,0)) * g0 + CAST(2 AS DECIMAL(38,0)) * dsum"))
    val eta = dd(col("ssq")) * (dd(col("l")) + lit(1.0)) /
      (dd(col("n")) * dd(col("dprime")))
    val eta4 = floor(eta * lit(1e4) + lit(0.5)).cast("long")
    base.select(col("event_type"), col("n").as("n_days"), col("l").as("lag_l"),
      when(dd(col("dprime")) > 0, eta4.cast("double") / lit(1e4)).as("eta_r4"),
      when(dd(col("dprime")) > 0, eta4 > 4630L).as("reject"))
  }

  // ---------------------------------------------------------------
  // q277 — DICKEY-FULLER UNIT-ROOT TEST: does each instrument's close
  // level carry a unit root (Dickey & Fuller 1979, the τ_μ
  // constant-only form) — the classic COMPLEMENT to q276 KPSS (DF's
  // null is "unit root", KPSS's null is "stationary"; read together
  // they split series into stationary / unit-root / inconclusive —
  // the pairing every unit-root survey prescribes): regress
  // Δx_t = α + ρ·x_{t−1} + ε over the m = n−1 day pairs and test
  // τ = ρ̂/se(ρ̂) against the asymptotic 5% τ_μ critical value −2.86.
  // Exactness: the five regression sums are EXACT decimals off
  // micro-log2 integer closes (every product widened per factor), the
  // centered forms Sxx = mΣx²−(Σx)², Syy, Sxy are exact decimals, and
  // the whole statistic collapses to ONE IEEE expression
  // τ = Sxy·√(m−2)/√(Sxx·Syy − Sxy²) (the intercept and residual
  // variance algebra cancel into the Cauchy-Schwarz gap — no ρ̂
  // round-trip); the decision tests the QUANTIZED τ₄ < −28600. A
  // perfect fit (Sxy² = Sxx·Syy) or constant series NULLs. Scale
  // shape: one DailyCloses partial agg, per-type day-grid lag window,
  // one grid-grain agg (the q274 shape). Output: |types| rows.
  private def q277(s: SparkSession, dir: String): DataFrame =
    dickeyFuller(dailyCloses(s, dir))

  private[graft] def dickeyFuller(cl: DataFrame): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val dd = (c: Column) => c.cast("double")
    val wd = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val pairs = cl
      .withColumn("xp", lag(col("close_lv"), 1).over(wd))
      .filter(col("xp").isNotNull)
      .withColumn("dy", col("close_lv") - col("xp"))
    val per = pairs.groupBy(col("event_type")).agg(
        count(lit(1)).as("m"),
        sum(d38(col("xp"))).as("sx"),
        sum(d38(col("xp")) * d38(col("xp"))).as("sxx0"),
        sum(d38(col("dy"))).as("sy"),
        sum(d38(col("dy")) * d38(col("dy"))).as("syy0"),
        sum(d38(col("xp")) * d38(col("dy"))).as("sxy0"))
      .filter(col("m") >= 3)
    val sxx = d38(col("m")) * col("sxx0") - col("sx") * col("sx")
    val syy = d38(col("m")) * col("syy0") - col("sy") * col("sy")
    val sxy = d38(col("m")) * col("sxy0") - col("sx") * col("sy")
    val gap = dd(sxx) * dd(syy) - dd(sxy) * dd(sxy)
    val tau = dd(sxy) * sqrt(dd(col("m")) - lit(2.0)) / sqrt(gap)
    val rho = dd(sxy) / dd(sxx)
    val tau4 = floor(tau * lit(1e4) + lit(0.5)).cast("long")
    per.select(col("event_type"), (col("m") + lit(1L)).as("n_days"),
      when(dd(sxx) > 0, floor(rho * lit(1e6) + lit(0.5)) / lit(1e6))
        .as("rho_r6"),
      when(gap > 0, tau4.cast("double") / lit(1e4)).as("tau_r4"),
      when(gap > 0, tau4 < -28600L).as("reject_unit_root"))
  }

  // ---------------------------------------------------------------
  // q274 — VON NEUMANN RATIO TEST: is each instrument's daily return
  // series serially independent — the mean-square-successive-
  // difference test (von Neumann 1941), the OTHER classical
  // randomness check next to q258's runs test (runs sees only SIGNS;
  // VN sees magnitudes — a series alternating +1/−100 passes runs
  // and fails VN) and the decision q176's lag-1 ACF only describes:
  // VN = Σ(x_{t+1}−x_t)² / Σ(x−x̄)², E[VN] → 2 under independence
  // (VN < 2 ⇒ positive autocorrelation, > 2 ⇒ alternation), z =
  // (VN−2)/√(4(n−2)/(n²−1)). Exactness: the successive-difference
  // sum and the variance numerator n·Σx² − (Σx)² are EXACT decimals
  // off micro-log2 integer returns (every product widened per
  // factor); VN = n·num/den is ONE IEEE sequence shared by both
  // engines, the α = 0.05 decision tests the QUANTIZED |z₄| > 19600.
  // Scale shape: one DailyCloses partial agg, then per-type day-grid
  // lag window + one grid-grain agg (volume-independent — the q221
  // argument). Output: |types| rows.
  private def q274(s: SparkSession, dir: String): DataFrame =
    vonNeumann(dailyReturns(s, dir))

  private[graft] def vonNeumann(rets: DataFrame): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val dd = (c: Column) => c.cast("double")
    val wd = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val withDiff = rets
      .withColumn("prev", lag(col("r_fp"), 1).over(wd))
      .withColumn("dsq", when(col("prev").isNotNull,
        d38(col("r_fp") - col("prev")) * d38(col("r_fp") - col("prev"))))
    val per = withDiff.groupBy(col("event_type")).agg(
        count(lit(1)).as("n"), sum(d38(col("r_fp"))).as("s1"),
        sum(d38(col("r_fp")) * d38(col("r_fp"))).as("s2"),
        sum(col("dsq")).as("num"))
      .filter(col("n") >= 3)
    val den = d38(col("n")) * col("s2") - col("s1") * col("s1")
    val vn = dd(col("n")) * dd(col("num")) / dd(den)
    val z = (vn - lit(2.0)) / sqrt(lit(4.0) * (dd(col("n")) - lit(2.0)) /
      (dd(col("n")) * dd(col("n")) - lit(1.0)))
    val vn4 = floor(vn * lit(1e4) + lit(0.5)).cast("long")
    val z4 = floor(z * lit(1e4) + lit(0.5)).cast("long")
    per.select(col("event_type"), col("n").as("n_days"),
      when(dd(den) > 0, vn4.cast("double") / lit(1e4)).as("vn_r4"),
      when(dd(den) > 0, z4.cast("double") / lit(1e4)).as("z_r4"),
      when(dd(den) > 0, abs(z4) > 19600L).as("reject"))
  }

  // ---------------------------------------------------------------
  // q275 — TURNING-POINTS TEST: does each instrument's daily close
  // series have the LOCAL-EXTREMUM density of a random sequence
  // (Kendall's turning-points / peaks-and-troughs test — Kendall &
  // Stuart; Bienaymé 1874 expectation): an interior day is a turning
  // point when it is a STRICT local max or min, T counts them,
  // E[T] = 2(n−2)/3, Var[T] = (16n−29)/90, z = (T−E)/√Var. The
  // sequence-shape companion to q258 (runs: signs of CHANGES) and
  // q274 (magnitudes of changes) — a smooth trend has too FEW
  // turning points, over-differenced noise too MANY. Exactness: T is
  // an exact integer off lag/lead compares (ties are NOT turning
  // points — the strict-product convention, identical in both
  // engines); E, Var, z close in ONE IEEE sequence; decision on the
  // QUANTIZED |z₄| > 19600. Scale shape: one DailyCloses partial
  // agg, per-type day-grid lag/lead window, one grid-grain agg.
  // Output: |types| rows.
  private def q275(s: SparkSession, dir: String): DataFrame =
    turningPoints(dailyCloses(s, dir))

  private[graft] def turningPoints(cl: DataFrame): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val dd = (c: Column) => c.cast("double")
    val wd = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val t = cl
      .withColumn("p", lag(col("close_lv"), 1).over(wd))
      .withColumn("f", lead(col("close_lv"), 1).over(wd))
      .withColumn("tp", when(col("p").isNotNull && col("f").isNotNull &&
        d38(col("close_lv") - col("p")) * d38(col("close_lv") - col("f")) > 0,
        lit(1L)).otherwise(lit(0L)))
    val per = t.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("tp")).as("tt"))
      .filter(col("n") >= 3)
    val nd = dd(col("n"))
    val e = lit(2.0) * (nd - lit(2.0)) / lit(3.0)
    val v = (lit(16.0) * nd - lit(29.0)) / lit(90.0)
    val z = (dd(col("tt")) - e) / sqrt(v)
    val z4 = floor(z * lit(1e4) + lit(0.5)).cast("long")
    per.select(col("event_type"), col("n").as("n_days"),
      col("tt").as("t_stat"), (z4.cast("double") / lit(1e4)).as("z_r4"),
      (abs(z4) > 19600L).as("reject"))
  }

  // ---------------------------------------------------------------
  // q271 — PETTITT CHANGE-POINT TEST: WHERE did each instrument's
  // close level shift — the rank-based single-change-point locator
  // (Pettitt 1979) every hydrology handbook ships NEXT to
  // Mann-Kendall (q259 says whether there's a monotone trend; Pettitt
  // says where the level broke): U_t = Σ_{i≤t, j>t} sgn(x_j − x_i),
  // K = max_t |U_t| over t = 1..n−1, change day = the FIRST day
  // attaining K, p ≈ min(1, 2·exp(−6K²/(n³+n²))). Exactness: U_t is
  // exact integer via the RANK-COUNT identity — U_t = U_{t−1} + s_t
  // with s_t = #{j: x_j > x_t} − #{j: x_j < x_t}, and s_t reads off
  // the (type, close) value grid's running counts (gt = n − ct,
  // lt = prev), so there is NO O(n²) sign fold at all (sharper than
  // q259's C(n,2) enumeration — the same statistic family at
  // O(grid + n) per type); K and n close into p in ONE IEEE sequence,
  // the α = 0.05 decision tests the QUANTIZED p₄ < 500, and the
  // argmax day is the deterministic (max |U|, min day) order — a
  // join-back, not an engine-local arg_max. Scale shape: one
  // volume-sized DailyCloses partial agg, then value-grid + day-grid
  // windows both partitioned per type over |days|-bounded rows
  // (volume-independent — the q221 argument). Output: |types| rows.
  private def q271(s: SparkSession, dir: String): DataFrame =
    pettitt(dailyCloses(s, dir))

  private[graft] def pettitt(cl: DataFrame): DataFrame = {
    val dd = (c: Column) => c.cast("double")
    val nDf = cl.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2)
    val grid = cl.groupBy(col("event_type"), col("close_lv"))
      .agg(count(lit(1)).as("t"))
    val wv = Window.partitionBy(col("event_type")).orderBy(col("close_lv"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = grid.withColumn("ct", sum(col("t")).over(wv))
      .withColumn("prev", col("ct") - col("t"))
    val wd = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wrn = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val ut = cl
      .join(cum.select(col("event_type"), col("close_lv"), col("ct"), col("prev")),
        Seq("event_type", "close_lv"))
      .join(nDf, Seq("event_type"))
      .withColumn("s", (col("n") - col("ct")) - col("prev"))
      .withColumn("u", sum(col("s")).over(wd))
      .withColumn("rn", row_number().over(wrn))
      .filter(col("rn") < col("n"))
    val per = ut.groupBy(col("event_type"), col("n"))
      .agg(max(abs(col("u"))).as("k_stat"))
    val cd = ut.join(per.select(col("event_type"), col("k_stat")),
        Seq("event_type"))
      .filter(abs(col("u")) === col("k_stat"))
      .groupBy(col("event_type")).agg(min(col("day")).as("change_day"))
    val nd = dd(col("n"))
    val p = least(lit(1.0), lit(2.0) * exp(lit(-6.0) * dd(col("k_stat")) *
      dd(col("k_stat")) / (nd * nd * nd + nd * nd)))
    val p4 = floor(p * lit(1e4) + lit(0.5)).cast("long")
    per.join(cd, Seq("event_type"))
      .select(col("event_type"), col("n").as("n_days"), col("k_stat"),
        col("change_day"),
        (p4.cast("double") / lit(1e4)).as("p_r4"),
        (p4 < 500L).as("reject"))
  }

  // ---------------------------------------------------------------
  // q261 — HURST EXPONENT (rescaled-range): is each instrument's
  // return series trending (H > 0.5), mean-reverting (H < 0.5), or a
  // random walk (H ≈ 0.5) — Hurst's R/S analysis (Hurst 1951,
  // Mandelbrot & Wallis 1969): chop the day-grid series into blocks
  // of m ∈ {4, 8, 16, 32}, per block take the range of cumulative
  // mean-deviations over the standard deviation, average per size,
  // and read H as the log2(R/S)-vs-log2(m) regression slope.
  // Exactness: per block, the deviation range and variance clear the
  // rational mean by the m²-multiply trick — dev_i = m·prefix_i −
  // i·sum and snum = m·Σx² − sum² are EXACT integers (decimal-
  // widened; block sums fit long at |r| ≲ 2²⁴ but the discipline is
  // widen-before-multiply) — so R/S = rnum/√snum is one sqrt+divide
  // of exact ints PER BLOCK, quantized to 1e6 fixed point BEFORE the
  // cross-block mean (integer (2Σ+nb) DIV 2nb — no float ever sums
  // across blocks); log2 of the quantized mean re-quantizes (the
  // q81 fixed-point-transcendental rule), and the closing slope is
  // ONE IEEE divide of exact integer regression sums over the exact
  // u-grid {2,3,4,5}. Degenerate blocks (zero variance) drop;
  // sizes need ≥1 surviving block and the slope ≥2 surviving sizes.
  // Scale shape: q247's — one volume-sized DailyCloses partial agg,
  // then |types| day-grid array folds (AcfMaxSeriesLen-class bound:
  // the O(n·m) prefix recomputation is day-grid work, volume-
  // independent). Output: |types| rows.
  private def q261(s: SparkSession, dir: String): DataFrame =
    hurstRs(dailyReturns(s, dir))

  private[graft] val HurstSizes = Seq(4, 8, 16, 32)

  private[graft] def hurstRs(rets: DataFrame): DataFrame = {
    // per-block rs6 list for size m, built from inlined exact-integer
    // folds (prefix sums recomputed per index — O(n·m) total over the
    // volume-independent day grid)
    def rs6List(m: Int): String = {
      val blk = s"slice(xs, b * $m + 1, $m)"
      val s0 = s"aggregate($blk, CAST(0 AS BIGINT), (a, e) -> a + e)"
      val sxx = s"aggregate($blk, CAST(0 AS DECIMAL(38,0)), " +
        s"(a, e) -> a + CAST(e AS DECIMAL(38,0)) * CAST(e AS DECIMAL(38,0)))"
      val devs = s"transform(sequence(1, $m), i -> " +
        s"CAST($m AS BIGINT) * aggregate(slice(xs, b * $m + 1, i), " +
        s"CAST(0 AS BIGINT), (a, e) -> a + e) - CAST(i AS BIGINT) * ($s0))"
      val rnum = s"(array_max($devs) - array_min($devs))"
      val snum = s"(CAST($m AS DECIMAL(38,0)) * ($sxx) " +
        s"- CAST($s0 AS DECIMAL(38,0)) * CAST($s0 AS DECIMAL(38,0)))"
      s"IF(n >= $m, filter(transform(sequence(0, CAST(n DIV $m - 1 AS INT)), " +
        s"b -> IF($snum > 0, CAST(floor(CAST($rnum AS DOUBLE) " +
        s"/ sqrt(CAST($snum AS DOUBLE)) * 1e6 + 0.5) AS BIGINT), NULL)), " +
        s"x -> x IS NOT NULL), NULL)"
    }
    val base = graft.operators.DayGrid
      .series(rets, "event_type", "day", "r_fp", "hurstRs")
    val withSizes = HurstSizes.foldLeft(base) { (df, m) =>
      df
        .withColumn(s"lst$m", expr(rs6List(m)))
        .withColumn(s"rsm$m", expr(
          s"IF(lst$m IS NOT NULL AND size(lst$m) > 0, " +
            s"(2 * aggregate(lst$m, CAST(0 AS BIGINT), (a, e) -> a + e) " +
            s"+ size(lst$m)) DIV (2 * size(lst$m)), NULL)"))
        .withColumn(s"l6_$m", expr(
          s"IF(rsm$m > 0, CAST(floor(log2(CAST(rsm$m AS DOUBLE) / 1e6) " +
            s"* 1e6 + 0.5) AS BIGINT), NULL)"))
    }
    // regression of v = l6/1e6 on the exact u-grid log2 m = {2,3,4,5}:
    // integer sums over the surviving sizes, ONE closing divide
    val us = HurstSizes.map(m => m -> (31 - Integer.numberOfLeadingZeros(m))).toMap
    def term(f: Int => String): String =
      HurstSizes.map(m => s"IF(l6_$m IS NOT NULL, ${f(m)}, CAST(0 AS BIGINT))")
        .mkString("(", " + ", ")")
    val withSums = withSizes
      .withColumn("kk", expr(term(_ => "CAST(1 AS BIGINT)")))
      .withColumn("su", expr(term(m => s"CAST(${us(m)} AS BIGINT)")))
      .withColumn("suu", expr(term(m => s"CAST(${us(m) * us(m)} AS BIGINT)")))
      .withColumn("sv", expr(term(m => s"l6_$m")))
      .withColumn("suv", expr(term(m => s"CAST(${us(m)} AS BIGINT) * l6_$m")))
      .withColumn("den", col("kk") * col("suu") - col("su") * col("su"))
      .withColumn("num", col("kk") * col("suv") - col("su") * col("sv"))
    withSums.select(
      (Seq(col("event_type"), col("n").as("n_days"), col("kk").as("n_sizes")) ++
        HurstSizes.map(m =>
          (col(s"rsm$m").cast("double") / lit(1e6)).as(s"rs${m}_r6")) :+
        when(col("kk") >= 2 && col("den") > 0,
          r4(col("num").cast("double") / (col("den").cast("double") * lit(1e6))))
          .as("hurst_r4")): _*)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q277_dickey_fuller" -> q277 _,
    "q276_kpss" -> q276 _,
    "q274_von_neumann" -> q274 _,
    "q275_turning_points" -> q275 _,
    "q271_pettitt" -> q271 _,
    "q261_hurst_rs" -> q261 _,
    "q257_jarque_bera" -> q257 _,
    "q258_runs_test" -> q258 _,
    "q289_dagostino_k2" -> q289 _,
    "q292_cusum" -> q292 _,
    "q259_mann_kendall" -> q259 _,
    "q256_pacf" -> q256 _,
    "q247_acf_ljungbox" -> q247 _,
    "q281_arch_lm" -> q281 _,
    "q282_weekday_effect" -> q282 _,
    "q284_wilcoxon_ampm" -> q284 _,
    "q221_var_cvar" -> q221 _,
    "q222_kalman_backtest" -> q222 _,
    "q223_coint_screen" -> q223 _,
    "q210_holt_backtest" -> q210 _,
    "q209_corr_clusters" -> q209 _,
    "q208_sma_crossover" -> q208 _,
    "q203_ewma_backtest" -> q203 _,
    "q198_pairs_spread" -> q198 _,
    "q199_risk_adjusted" -> q199 _,
    "q192_lead_lag" -> q192 _,
    "q175_higher_moments" -> q175 _,
    "q176_return_acf" -> q176 _,
    "q177_kyle_lambda" -> q177 _,
    "q178_vpin" -> q178 _,
    "q179_momentum" -> q179 _,
    "q172_daily_panel" -> q172 _,
    "q169_roll_spread" -> q169 _,
    "q170_variance_ratio" -> q170 _,
    "q167_order_flow" -> q167 _,
    "q165_garman_klass" -> q165 _,
    "q157_parkinson_vol" -> q157 _,
    "q158_amihud_illiq" -> q158 _,
    "q159_rolling_beta" -> q159 _,
    "q156_obv" -> q156 _,
    "q155_intraday_seasonality" -> q155 _,
    "q154_drawdown_episodes" -> q154 _,
    "q153_realized_vol" -> q153 _,
    "q126_vwap" -> q126 _,
    "q128_stochastic_osc" -> q128 _,
    "q129_rsi" -> q129 _,
    "q125_twap" -> q125 _,
    "q108_rolling_bands" -> q108 _,
    "q109_drawdown" -> q109 _,
    "q110_corr_matrix" -> q110 _
  )

  /** Shared WITH-prefix for the day-grid statistics (q175/q176/q179):
    * the q159/q170 daily close-to-close micro-log2 return
    * construction, ending at `r (event_type, day, r_fp)`. */
  private[graft] def dayRetCtes: String =
    """WITH e AS (
      |  SELECT event_type, ts::TIMESTAMP AS ts, event_id, value,
      |    ts::TIMESTAMP::DATE AS day,
      |    floor(log2(value)*1e6 + 0.5)::BIGINT AS lv
      |  FROM events WHERE value > 0
      |), r0 AS (
      |  SELECT *, row_number() OVER (PARTITION BY event_type, day ORDER BY ts, event_id) AS rn
      |  FROM e
      |), c AS (
      |  SELECT event_type, day, arg_max(lv, rn) AS close_lv
      |  FROM r0 GROUP BY 1, 2
      |), r AS (
      |  SELECT event_type, day,
      |    close_lv - lag(close_lv) OVER (PARTITION BY event_type ORDER BY day) AS r_fp
      |  FROM c QUALIFY r_fp IS NOT NULL
      |)""".stripMargin

  /** The q247/q281 shared Ljung-Box oracle: the exact-integer lag
    * CTE chain over `list($listExpr ORDER BY day)` — q247 feeds the
    * returns, q281 the SQUARED returns (McLeod-Li); `extraCols`
    * appends decision columns to the closing SELECT. */
  private def acfLjungBoxOracle(listExpr: String, extraCols: String = ""): String = {
    val lags = 1 to 5
    val crosses = lags.map(k =>
      s"""    CASE WHEN n > $k THEN list_reduce(list_prepend(0::HUGEINT,
         |      list_transform(range(${k + 1}, (n + 1)::INT), t -> l[t]::HUGEINT * l[t - $k]::HUGEINT)),
         |      (a, b) -> a + b) END AS cross$k,
         |    CASE WHEN n > $k THEN list_sum(l[1:(n - $k)::INT])::HUGEINT END AS head$k,
         |    CASE WHEN n > $k THEN list_sum(l[${k + 1}:n::INT])::HUGEINT END AS tail$k""".stripMargin)
      .mkString(",\n")
    val bs = lags.map(k =>
      s"""    n::HUGEINT * n::HUGEINT * cross$k
         |      - n::HUGEINT * s1::HUGEINT * (head$k + tail$k)
         |      + (n - $k)::HUGEINT * s1::HUGEINT * s1::HUGEINT AS b$k""".stripMargin)
      .mkString(",\n")
    val rhos = lags.map(k =>
      s"""    CASE WHEN n > $k AND a_den > 0 THEN
         |      floor(b$k::DOUBLE / (n::HUGEINT * a_den)::DOUBLE * 1e6 + 0.5)::BIGINT END AS rho$k""".stripMargin)
      .mkString(",\n")
    val lbS = lags.map(k => s"(rho$k * rho$k * 1000) // (n - $k)").mkString(" + ")
    val acfCols = lags.map(k => s"  rho$k::DOUBLE / 1e6 AS acf${k}_r6").mkString(",\n")
    dayRetCtes +
      s""", s AS (
         |  SELECT event_type, list($listExpr ORDER BY day) AS l FROM r GROUP BY 1
         |), m AS (
         |  SELECT event_type, l, len(l)::BIGINT AS n,
         |    list_sum(l)::HUGEINT AS s1,
         |    list_reduce(list_prepend(0::HUGEINT,
         |      list_transform(l, e -> e::HUGEINT * e::HUGEINT)), (a, b) -> a + b) AS sxx
         |  FROM s
         |), d AS (
         |  SELECT *, n::HUGEINT * sxx - s1::HUGEINT * s1::HUGEINT AS a_den FROM m
         |), lg AS (
         |  SELECT *,
         |$crosses
         |  FROM d
         |), bb AS (
         |  SELECT *,
         |$bs
         |  FROM lg
         |), rr AS (
         |  SELECT *,
         |$rhos
         |  FROM bb
         |), ss AS (
         |  SELECT *, CASE WHEN n > 5 AND a_den > 0 THEN $lbS END AS lb_s FROM rr
         |)
         |SELECT event_type, n AS n_days,
         |$acfCols,
         |  floor(n::DOUBLE * (n::DOUBLE + 2.0) * lb_s::DOUBLE / 1e15 * 1e4 + 0.5) / 1e4 AS lb_q_r4$extraCols
         |FROM ss""".stripMargin
  }

  /** The q247/q256 shared oracle prefix: dayRetCtes + the exact-
    * integer lag CTE chain ending at `rr` (event_type, n, a_den,
    * rho1..rho5 — quantized ρ6 BIGINTs). */
  private def acfOracleCtes: String = {
    val lags = 1 to 5
    val crosses = lags.map(k =>
      s"""    CASE WHEN n > $k THEN list_reduce(list_prepend(0::HUGEINT,
         |      list_transform(range(${k + 1}, (n + 1)::INT), t -> l[t]::HUGEINT * l[t - $k]::HUGEINT)),
         |      (a, b) -> a + b) END AS cross$k,
         |    CASE WHEN n > $k THEN list_sum(l[1:(n - $k)::INT])::HUGEINT END AS head$k,
         |    CASE WHEN n > $k THEN list_sum(l[${k + 1}:n::INT])::HUGEINT END AS tail$k""".stripMargin)
      .mkString(",\n")
    val bs = lags.map(k =>
      s"""    n::HUGEINT * n::HUGEINT * cross$k
         |      - n::HUGEINT * s1::HUGEINT * (head$k + tail$k)
         |      + (n - $k)::HUGEINT * s1::HUGEINT * s1::HUGEINT AS b$k""".stripMargin)
      .mkString(",\n")
    val rhos = lags.map(k =>
      s"""    CASE WHEN n > $k AND a_den > 0 THEN
         |      floor(b$k::DOUBLE / (n::HUGEINT * a_den)::DOUBLE * 1e6 + 0.5)::BIGINT END AS rho$k""".stripMargin)
      .mkString(",\n")
    dayRetCtes +
      s""", s AS (
         |  SELECT event_type, list(r_fp ORDER BY day) AS l FROM r GROUP BY 1
         |), m AS (
         |  SELECT event_type, l, len(l)::BIGINT AS n,
         |    list_sum(l)::BIGINT AS s1,
         |    list_reduce(list_prepend(0::HUGEINT,
         |      list_transform(l, e -> e::HUGEINT * e::HUGEINT)), (a, b) -> a + b) AS sxx
         |  FROM s
         |), d AS (
         |  SELECT *, n::HUGEINT * sxx - s1::HUGEINT * s1::HUGEINT AS a_den FROM m
         |), lg AS (
         |  SELECT *,
         |$crosses
         |  FROM d
         |), bb AS (
         |  SELECT *,
         |$bs
         |  FROM lg
         |), rr AS (
         |  SELECT *,
         |$rhos
         |  FROM bb
         |)""".stripMargin
  }

  /** q261's oracle: the same exact-integer per-block folds in DuckDB
    * list algebra (1-indexed slices, HUGEINT where Spark widens to
    * decimal), per-block sqrt/divide then fixed-point quantization
    * BEFORE any cross-block mean — textually mirrored IEEE order. */
  private def hurstOracle: String = {
    val sizes = HurstSizes
    def rsCte(m: Int): String = {
      val blk = s"l[(b*$m+1):(b*$m+$m)]"
      val s0 = s"list_sum($blk)::BIGINT"
      val sxx = s"list_sum(list_transform($blk, e -> e::HUGEINT * e))"
      val devs = s"list_transform(range(1, $m + 1), i -> " +
        s"$m::BIGINT * list_sum(l[(b*$m+1):(b*$m+i)])::BIGINT - i::BIGINT * ($s0))"
      val rnum = s"(list_max($devs) - list_min($devs))"
      val snum = s"($m::HUGEINT * ($sxx) - ($s0)::HUGEINT * ($s0))"
      s"CASE WHEN n >= $m THEN list_filter(list_transform(range(0, (n // $m)::INT), " +
        s"b -> CASE WHEN $snum > 0 THEN floor(($rnum)::DOUBLE " +
        s"/ sqrt(($snum)::DOUBLE) * 1e6 + 0.5)::BIGINT END), " +
        s"x -> x IS NOT NULL) END AS lst$m"
    }
    def us(m: Int) = 31 - Integer.numberOfLeadingZeros(m)
    def term(f: Int => String): String =
      sizes.map(m => s"CASE WHEN l6_$m IS NOT NULL THEN ${f(m)} ELSE 0 END")
        .mkString("(", " + ", ")::BIGINT")
    dayRetCtes +
      s""", s AS (
         |  SELECT event_type, list(r_fp ORDER BY day) AS l,
         |    count(*)::BIGINT AS n
         |  FROM r GROUP BY 1
         |), b AS (
         |  SELECT event_type, n,
         |    ${sizes.map(rsCte).mkString(",\n    ")}
         |  FROM s
         |), rm AS (
         |  SELECT event_type, n,
         |    ${sizes.map(m =>
               s"CASE WHEN lst$m IS NOT NULL AND len(lst$m) > 0 THEN " +
                 s"(2 * list_sum(lst$m)::BIGINT + len(lst$m)) // (2 * len(lst$m)) " +
                 s"END AS rsm$m").mkString(",\n    ")}
         |  FROM b
         |), lq AS (
         |  SELECT event_type, n,
         |    ${sizes.map(m => s"rsm$m").mkString(", ")},
         |    ${sizes.map(m =>
               s"CASE WHEN rsm$m > 0 THEN floor(log2(rsm$m::DOUBLE / 1e6) " +
                 s"* 1e6 + 0.5)::BIGINT END AS l6_$m").mkString(",\n    ")}
         |  FROM rm
         |), f AS (
         |  SELECT event_type, n, ${sizes.map(m => s"rsm$m").mkString(", ")},
         |    ${term(_ => "1")} AS kk,
         |    ${term(m => s"${us(m)}")} AS su,
         |    ${term(m => s"${us(m) * us(m)}")} AS suu,
         |    ${term(m => s"l6_$m")} AS sv,
         |    ${term(m => s"${us(m)} * l6_$m")} AS suv
         |  FROM lq
         |)
         |SELECT event_type, n AS n_days, kk AS n_sizes,
         |  ${sizes.map(m => s"rsm$m::DOUBLE / 1e6 AS rs${m}_r6").mkString(",\n  ")},
         |  CASE WHEN kk >= 2 AND kk * suu - su * su > 0 THEN
         |    floor((kk * suv - su * sv)::DOUBLE
         |      / ((kk * suu - su * su)::DOUBLE * 1e6) * 10000 + 0.5)/10000
         |  END AS hurst_r4
         |FROM f""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "q277_dickey_fuller" ->
      (dayRetCtes +
        """, dfp AS (
          |  SELECT event_type, close_lv,
          |    lag(close_lv) OVER (PARTITION BY event_type ORDER BY day) AS xp
          |  FROM c QUALIFY xp IS NOT NULL
          |), per AS (
          |  SELECT event_type, count(*)::BIGINT AS m,
          |    sum(xp::HUGEINT) AS sx,
          |    sum(xp::HUGEINT * xp::HUGEINT) AS sxx0,
          |    sum((close_lv - xp)::HUGEINT) AS sy,
          |    sum((close_lv - xp)::HUGEINT * (close_lv - xp)::HUGEINT) AS syy0,
          |    sum(xp::HUGEINT * (close_lv - xp)::HUGEINT) AS sxy0
          |  FROM dfp GROUP BY 1 HAVING count(*) >= 3
          |), s AS (
          |  SELECT event_type, m,
          |    (m::HUGEINT * sxx0 - sx * sx) AS sxx,
          |    (m::HUGEINT * syy0 - sy * sy) AS syy,
          |    (m::HUGEINT * sxy0 - sx * sy) AS sxy
          |  FROM per
          |), z AS (
          |  SELECT event_type, m, sxx, syy, sxy,
          |    sxx::DOUBLE * syy::DOUBLE - sxy::DOUBLE * sxy::DOUBLE AS gap,
          |    sxy::DOUBLE * sqrt(m::DOUBLE - 2.0)
          |      / sqrt(sxx::DOUBLE * syy::DOUBLE - sxy::DOUBLE * sxy::DOUBLE) AS tau
          |  FROM s
          |)
          |SELECT event_type, m + 1 AS n_days,
          |  CASE WHEN sxx::DOUBLE > 0 THEN
          |    floor(sxy::DOUBLE / sxx::DOUBLE * 1e6 + 0.5) / 1e6 END AS rho_r6,
          |  CASE WHEN gap > 0 THEN
          |    floor(tau * 1e4 + 0.5)::BIGINT::DOUBLE / 1e4 END AS tau_r4,
          |  CASE WHEN gap > 0 THEN
          |    floor(tau * 1e4 + 0.5)::BIGINT < -28600 END AS reject_unit_root
          |FROM z""".stripMargin),
    "q276_kpss" ->
      (dayRetCtes +
        """, nsx AS (
          |  SELECT event_type, count(*)::BIGINT AS n,
          |    list_reduce(list_prepend(0::HUGEINT,
          |      list(close_lv::HUGEINT)), (a, b) -> a + b) AS sx
          |  FROM c GROUP BY 1 HAVING count(*) >= 2
          |), yr AS (
          |  SELECT c.event_type, c.day,
          |    (n::HUGEINT * close_lv::HUGEINT - sx) AS y
          |  FROM c JOIN nsx ON c.event_type = nsx.event_type
          |), sp AS (
          |  SELECT event_type,
          |    (sum(y) OVER (PARTITION BY event_type ORDER BY day
          |      ROWS UNBOUNDED PRECEDING))::HUGEINT AS s
          |  FROM yr
          |), ssqt AS (
          |  SELECT event_type, sum(s * s) AS ssq FROM sp GROUP BY 1
          |), cls AS (
          |  SELECT event_type, list(close_lv ORDER BY day) AS xs,
          |    count(*)::BIGINT AS n
          |  FROM c GROUP BY 1 HAVING count(*) >= 2
          |), a1 AS (
          |  SELECT cls.event_type, cls.n,
          |    list_transform(xs, x -> cls.n::HUGEINT * x::HUGEINT - nsx.sx) AS ys,
          |    least(CAST(floor(4.0 * sqrt(sqrt(cls.n::DOUBLE / 100.0))) AS INT),
          |      (cls.n - 1)::INT) AS l
          |  FROM cls JOIN nsx ON cls.event_type = nsx.event_type
          |), a2 AS (
          |  SELECT event_type, n, ys, l,
          |    list_reduce(list_prepend(0::HUGEINT,
          |      list_transform(ys, y -> y * y)), (a, b) -> a + b) AS g0,
          |    CASE WHEN l >= 1 THEN list_reduce(list_prepend(0::HUGEINT,
          |      list_transform(range(1, (l + 1)::INT), j ->
          |        (l + 1 - j)::HUGEINT * list_reduce(list_prepend(0::HUGEINT,
          |          list_transform(range((j + 1)::INT, (n + 1)::INT),
          |            t -> ys[t] * ys[t - j])), (a, b) -> a + b))),
          |      (a, b) -> a + b) ELSE 0::HUGEINT END AS dsum
          |  FROM a1
          |), a3 AS (
          |  SELECT a2.event_type, n, l,
          |    ((l + 1)::HUGEINT * g0 + 2::HUGEINT * dsum) AS dprime,
          |    ssq
          |  FROM a2 JOIN ssqt ON a2.event_type = ssqt.event_type
          |), z AS (
          |  SELECT event_type, n, l, dprime,
          |    ssq::DOUBLE * (l::DOUBLE + 1.0)
          |      / (n::DOUBLE * dprime::DOUBLE) AS eta
          |  FROM a3
          |)
          |SELECT event_type, n AS n_days, l AS lag_l,
          |  CASE WHEN dprime::DOUBLE > 0 THEN
          |    floor(eta * 1e4 + 0.5)::BIGINT::DOUBLE / 1e4 END AS eta_r4,
          |  CASE WHEN dprime::DOUBLE > 0 THEN
          |    floor(eta * 1e4 + 0.5)::BIGINT > 4630 END AS reject
          |FROM z""".stripMargin),
    "q274_von_neumann" ->
      (dayRetCtes +
        """, d AS (
          |  SELECT event_type, r_fp,
          |    r_fp - lag(r_fp) OVER (PARTITION BY event_type ORDER BY day) AS df
          |  FROM r
          |), per AS (
          |  SELECT event_type, count(*)::BIGINT AS n,
          |    sum(r_fp::HUGEINT) AS s1,
          |    sum(r_fp::HUGEINT * r_fp::HUGEINT) AS s2,
          |    sum(df::HUGEINT * df::HUGEINT) AS num
          |  FROM d GROUP BY 1 HAVING count(*) >= 3
          |), z AS (
          |  SELECT event_type, n,
          |    (n::HUGEINT * s2 - s1 * s1) AS den,
          |    n::DOUBLE * num::DOUBLE / (n::HUGEINT * s2 - s1 * s1)::DOUBLE AS vn
          |  FROM per
          |), q AS (
          |  SELECT event_type, n, den, vn,
          |    (vn - 2.0) / sqrt(4.0 * (n::DOUBLE - 2.0)
          |      / (n::DOUBLE * n::DOUBLE - 1.0)) AS zv
          |  FROM z
          |)
          |SELECT event_type, n AS n_days,
          |  CASE WHEN den::DOUBLE > 0 THEN
          |    floor(vn * 1e4 + 0.5)::BIGINT::DOUBLE / 1e4 END AS vn_r4,
          |  CASE WHEN den::DOUBLE > 0 THEN
          |    floor(zv * 1e4 + 0.5)::BIGINT::DOUBLE / 1e4 END AS z_r4,
          |  CASE WHEN den::DOUBLE > 0 THEN
          |    abs(floor(zv * 1e4 + 0.5)::BIGINT) > 19600 END AS reject
          |FROM q""".stripMargin),
    "q275_turning_points" ->
      (dayRetCtes +
        """, tp AS (
          |  SELECT event_type,
          |    CASE WHEN lag(close_lv) OVER w IS NOT NULL
          |        AND lead(close_lv) OVER w IS NOT NULL
          |        AND (close_lv - lag(close_lv) OVER w)::HUGEINT
          |          * (close_lv - lead(close_lv) OVER w)::HUGEINT > 0
          |      THEN 1 ELSE 0 END::BIGINT AS t
          |  FROM c
          |  WINDOW w AS (PARTITION BY event_type ORDER BY day)
          |), per AS (
          |  SELECT event_type, count(*)::BIGINT AS n, sum(t)::BIGINT AS tt
          |  FROM tp GROUP BY 1 HAVING count(*) >= 3
          |), z AS (
          |  SELECT event_type, n, tt,
          |    (tt::DOUBLE - 2.0 * (n::DOUBLE - 2.0) / 3.0)
          |      / sqrt((16.0 * n::DOUBLE - 29.0) / 90.0) AS zv
          |  FROM per
          |)
          |SELECT event_type, n AS n_days, tt AS t_stat,
          |  floor(zv * 1e4 + 0.5)::BIGINT::DOUBLE / 1e4 AS z_r4,
          |  abs(floor(zv * 1e4 + 0.5)::BIGINT) > 19600 AS reject
          |FROM z""".stripMargin),
    "q271_pettitt" ->
      (dayRetCtes +
        """, nn AS (
          |  SELECT event_type, count(*)::BIGINT AS n FROM c
          |  GROUP BY 1 HAVING count(*) >= 2
          |), vg AS (
          |  SELECT event_type, close_lv, count(*)::BIGINT AS t
          |  FROM c GROUP BY 1, 2
          |), vc AS (
          |  SELECT *, (sum(t) OVER (PARTITION BY event_type ORDER BY close_lv
          |    ROWS UNBOUNDED PRECEDING))::BIGINT AS ct
          |  FROM vg
          |), r1 AS (
          |  SELECT c.event_type, c.day, n, ((n - ct) - (ct - t))::BIGINT AS s
          |  FROM c
          |  JOIN vc ON c.event_type = vc.event_type AND c.close_lv = vc.close_lv
          |  JOIN nn ON c.event_type = nn.event_type
          |), uu AS (
          |  SELECT event_type, day, n,
          |    (sum(s) OVER (PARTITION BY event_type ORDER BY day
          |      ROWS UNBOUNDED PRECEDING))::BIGINT AS u,
          |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
          |  FROM r1
          |), ut AS (SELECT * FROM uu WHERE rn < n),
          |per AS (
          |  SELECT event_type, max(n)::BIGINT AS n, max(abs(u))::BIGINT AS k
          |  FROM ut GROUP BY 1
          |), cd AS (
          |  SELECT ut.event_type, min(day) AS change_day
          |  FROM ut JOIN per ON ut.event_type = per.event_type
          |    AND abs(ut.u) = per.k
          |  GROUP BY 1
          |), z AS (
          |  SELECT per.event_type, n, k, change_day,
          |    least(1.0, 2.0 * exp(-6.0 * k::DOUBLE * k::DOUBLE
          |      / (n::DOUBLE * n::DOUBLE * n::DOUBLE + n::DOUBLE * n::DOUBLE))) AS p
          |  FROM per JOIN cd ON per.event_type = cd.event_type
          |)
          |SELECT event_type, n AS n_days, k AS k_stat, change_day,
          |  floor(p * 1e4 + 0.5)::BIGINT::DOUBLE / 1e4 AS p_r4,
          |  floor(p * 1e4 + 0.5)::BIGINT < 500 AS reject
          |FROM z""".stripMargin),
    "q261_hurst_rs" -> hurstOracle,
    "q257_jarque_bera" ->
      (dayRetCtes +
        """, m AS (
          |  SELECT event_type, count(*)::BIGINT AS n_days,
          |    sum(r_fp)::BIGINT AS s1, sum(r_fp*r_fp)::BIGINT AS s2,
          |    sum((r_fp*r_fp)::HUGEINT * r_fp) AS s3,
          |    sum((r_fp*r_fp)::HUGEINT * (r_fp*r_fp)) AS s4
          |  FROM r GROUP BY 1
          |), f AS (
          |  SELECT event_type, n_days,
          |    s1::DOUBLE / n_days::DOUBLE AS rm1,
          |    s2::DOUBLE / n_days::DOUBLE AS rm2,
          |    s3::DOUBLE / n_days::DOUBLE AS rm3,
          |    s4::DOUBLE / n_days::DOUBLE AS rm4
          |  FROM m
          |), g AS (
          |  SELECT event_type, n_days,
          |    rm2 - rm1*rm1 AS mu2,
          |    rm3 - 3*rm1*rm2 + 2*rm1*rm1*rm1 AS mu3,
          |    rm4 - 4*rm1*rm3 + 6*rm1*rm1*rm2 - 3*rm1*rm1*rm1*rm1 AS mu4
          |  FROM f
          |), q AS (
          |  SELECT event_type, n_days,
          |    CASE WHEN mu2 > 0 THEN
          |      floor(mu3/(sqrt(mu2)*mu2)*1e4 + 0.5)::BIGINT END AS g1q,
          |    CASE WHEN mu2 > 0 THEN
          |      floor((mu4/(mu2*mu2) - 3)*1e4 + 0.5)::BIGINT END AS g2q
          |  FROM g
          |), jb AS (
          |  SELECT event_type, n_days, g1q, g2q,
          |    n_days::HUGEINT * (4::HUGEINT * g1q * g1q + g2q::HUGEINT * g2q) AS jb_fp
          |  FROM q
          |)
          |SELECT event_type, n_days,
          |  g1q::DOUBLE / 1e4 AS skew_r4,
          |  g2q::DOUBLE / 1e4 AS kurt_x_r4,
          |  floor(jb_fp::DOUBLE / 24e8 * 1e4 + 0.5) / 1e4 AS jb_r4,
          |  jb_fp > 14379516000::HUGEINT AS reject
          |FROM jb""".stripMargin),
    "q289_dagostino_k2" ->
      (dayRetCtes +
        """, m AS (
          |  SELECT event_type, count(*)::BIGINT AS n_days,
          |    sum(r_fp)::BIGINT AS s1, sum(r_fp*r_fp)::BIGINT AS s2,
          |    sum((r_fp*r_fp)::HUGEINT * r_fp) AS s3,
          |    sum((r_fp*r_fp)::HUGEINT * (r_fp*r_fp)) AS s4
          |  FROM r GROUP BY 1
          |), f AS (
          |  SELECT event_type, n_days,
          |    s1::DOUBLE / n_days::DOUBLE AS rm1,
          |    s2::DOUBLE / n_days::DOUBLE AS rm2,
          |    s3::DOUBLE / n_days::DOUBLE AS rm3,
          |    s4::DOUBLE / n_days::DOUBLE AS rm4
          |  FROM m
          |), g AS (
          |  SELECT event_type, n_days,
          |    rm2 - rm1*rm1 AS mu2,
          |    rm3 - 3*rm1*rm2 + 2*rm1*rm1*rm1 AS mu3,
          |    rm4 - 4*rm1*rm3 + 6*rm1*rm1*rm2 - 3*rm1*rm1*rm1*rm1 AS mu4
          |  FROM f
          |), t1 AS (
          |  SELECT event_type, n_days, mu2,
          |    mu3 / (sqrt(mu2) * mu2) AS g1, mu4 / (mu2 * mu2) AS b2,
          |    n_days::DOUBLE AS n
          |  FROM g
          |), t2 AS (
          |  SELECT *,
          |    g1 * sqrt((n + 1.0) * (n + 3.0) / (6.0 * (n - 2.0))) AS y,
          |    sqrt(2.0 * (3.0 * (n*n + 27.0*n - 70.0) * (n + 1.0) * (n + 3.0)
          |      / ((n - 2.0) * (n + 5.0) * (n + 7.0) * (n + 9.0)) - 1.0))
          |      - 1.0 AS w2,
          |    3.0 * (n - 1.0) / (n + 1.0) AS eb2,
          |    24.0 * n * (n - 2.0) * (n - 3.0)
          |      / ((n + 1.0) * (n + 1.0) * (n + 3.0) * (n + 5.0)) AS vb2,
          |    6.0 * (n*n - 5.0*n + 2.0) / ((n + 7.0) * (n + 9.0))
          |      * sqrt(6.0 * (n + 3.0) * (n + 5.0)
          |        / (n * (n - 2.0) * (n - 3.0))) AS sb1
          |  FROM t1
          |), t3 AS (
          |  SELECT *,
          |    1.0 / sqrt(ln(sqrt(w2))) AS dlt,
          |    y / sqrt(2.0 / (w2 - 1.0)) AS ya,
          |    (b2 - eb2) / sqrt(vb2) AS x,
          |    6.0 + 8.0 / sb1 * (2.0 / sb1 + sqrt(1.0 + 4.0 / (sb1 * sb1))) AS aa
          |  FROM t2
          |), t4 AS (
          |  SELECT event_type, n_days, mu2,
          |    dlt * ln(ya + sqrt(ya * ya + 1.0)) AS z1,
          |    ((1.0 - 2.0 / (9.0 * aa)) - cbrt((1.0 - 2.0 / aa)
          |      / (1.0 + x * sqrt(2.0 / (aa - 4.0)))))
          |      / sqrt(2.0 / (9.0 * aa)) AS z2
          |  FROM t3
          |), qq AS (
          |  SELECT event_type, n_days,
          |    CASE WHEN n_days >= 20 AND mu2 > 0 THEN
          |      floor(z1 * 1e4 + 0.5)::BIGINT END AS z1q,
          |    CASE WHEN n_days >= 20 AND mu2 > 0 THEN
          |      floor(z2 * 1e4 + 0.5)::BIGINT END AS z2q
          |  FROM t4
          |), kk AS (
          |  SELECT event_type, n_days, z1q, z2q,
          |    z1q::HUGEINT * z1q + z2q::HUGEINT * z2q AS k2fp
          |  FROM qq
          |)
          |SELECT event_type, n_days,
          |  z1q::DOUBLE / 1e4 AS z_skew_r4,
          |  z2q::DOUBLE / 1e4 AS z_kurt_r4,
          |  floor(k2fp::DOUBLE / 1e4 + 0.5)::BIGINT::DOUBLE / 1e4 AS k2_r4,
          |  k2fp > 599150000 AS reject
          |FROM kk""".stripMargin),
    "q292_cusum" ->
      (dayRetCtes +
        """, st AS (
          |  SELECT event_type, count(*)::BIGINT AS nn,
          |    sum(r_fp)::BIGINT AS s1, sum(r_fp*r_fp)::BIGINT AS s2,
          |    list(r_fp::DOUBLE ORDER BY day) AS xs
          |  FROM r GROUP BY 1
          |), ms AS (
          |  SELECT event_type, nn, xs,
          |    s1::DOUBLE / nn::DOUBLE AS mu,
          |    sqrt((s2::DOUBLE - s1::DOUBLE * s1::DOUBLE / nn::DOUBLE)
          |      / nn::DOUBLE) AS sg
          |  FROM st
          |), fd AS (
          |  SELECT event_type, nn, mu, sg,
          |    list_reduce(
          |      list_prepend([0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
          |        list_transform(xs, x -> [x, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0])),
          |      (a, e) -> [
          |        greatest(0.0, a[1] + (e[1] - mu) - 0.5 * sg),
          |        greatest(0.0, a[2] - (e[1] - mu) - 0.5 * sg),
          |        greatest(a[3], greatest(0.0, a[1] + (e[1] - mu) - 0.5 * sg)),
          |        greatest(a[4], greatest(0.0, a[2] - (e[1] - mu) - 0.5 * sg)),
          |        a[5] + CASE WHEN
          |          greatest(0.0, a[1] + (e[1] - mu) - 0.5 * sg) > 4.0 * sg
          |          OR greatest(0.0, a[2] - (e[1] - mu) - 0.5 * sg) > 4.0 * sg
          |          THEN 1.0 ELSE 0.0 END,
          |        CASE WHEN a[6] > 0.0 THEN a[6] ELSE CASE WHEN
          |          greatest(0.0, a[1] + (e[1] - mu) - 0.5 * sg) > 4.0 * sg
          |          OR greatest(0.0, a[2] - (e[1] - mu) - 0.5 * sg) > 4.0 * sg
          |          THEN a[7] + 1.0 ELSE 0.0 END END,
          |        a[7] + 1.0]) AS s
          |  FROM ms
          |)
          |SELECT event_type, nn AS n_days,
          |  CASE WHEN nn >= 2 AND sg > 0 THEN
          |    floor(s[3] / sg * 10000 + 0.5)/10000 END AS max_pos_r4,
          |  CASE WHEN nn >= 2 AND sg > 0 THEN
          |    floor(s[4] / sg * 10000 + 0.5)/10000 END AS max_neg_r4,
          |  CASE WHEN nn >= 2 AND sg > 0 THEN s[5]::BIGINT END AS n_alarms,
          |  CASE WHEN nn >= 2 AND sg > 0 AND s[6] > 0 THEN s[6]::BIGINT
          |  END AS first_alarm
          |FROM fd""".stripMargin),
    "q258_runs_test" ->
      (dayRetCtes +
        """, sg AS (
          |  SELECT event_type, day,
          |    CASE WHEN r_fp > 0 THEN 1 ELSE -1 END AS sgn
          |  FROM r WHERE r_fp <> 0
          |), lgd AS (
          |  SELECT event_type, sgn,
          |    lag(sgn) OVER (PARTITION BY event_type ORDER BY day) AS prev
          |  FROM sg
          |), g AS (
          |  SELECT event_type,
          |    sum(CASE WHEN sgn = 1 THEN 1 ELSE 0 END)::BIGINT AS n_pos,
          |    sum(CASE WHEN sgn = -1 THEN 1 ELSE 0 END)::BIGINT AS n_neg,
          |    sum(CASE WHEN prev IS NULL OR sgn <> prev THEN 1 ELSE 0 END)::BIGINT AS n_runs
          |  FROM lgd GROUP BY 1
          |), f AS (
          |  SELECT event_type, n_pos, n_neg, n_runs,
          |    n_pos::DOUBLE + n_neg::DOUBLE AS nt,
          |    2.0 * n_pos::DOUBLE * n_neg::DOUBLE AS m2
          |  FROM g
          |), v AS (
          |  SELECT *, m2 / nt + 1.0 AS mu,
          |    m2 * (m2 - nt) / (nt * nt * (nt - 1.0)) AS vr
          |  FROM f
          |), z AS (
          |  SELECT *, CASE WHEN nt > 1 AND vr > 0 THEN
          |    floor((n_runs::DOUBLE - mu) / sqrt(vr) * 1e4 + 0.5)::BIGINT END AS z4
          |  FROM v
          |)
          |SELECT event_type, n_pos, n_neg, n_runs,
          |  CASE WHEN nt > 1 AND vr > 0 THEN z4::DOUBLE / 1e4 END AS z_r4,
          |  CASE WHEN nt > 1 AND vr > 0 THEN abs(z4) > 19600 END AS reject
          |FROM z""".stripMargin),
    "q259_mann_kendall" ->
      (dayRetCtes +
        """, cls AS (
          |  SELECT event_type, list(close_lv ORDER BY day) AS l,
          |    count(*)::BIGINT AS m
          |  FROM c GROUP BY 1 HAVING count(*) >= 2
          |), st AS (
          |  SELECT event_type, m,
          |    list_sum(flatten(list_transform(range(1, m::INT),
          |      i -> list_transform(range(i + 1, (m + 1)::INT),
          |        j -> CASE WHEN l[j] > l[i] THEN 1
          |             WHEN l[j] < l[i] THEN -1 ELSE 0 END))))::BIGINT AS s_stat
          |  FROM cls
          |), tt AS (
          |  SELECT event_type, sum(t::HUGEINT * (t - 1) * (2 * t + 5)) AS tie_term
          |  FROM (SELECT event_type, close_lv, count(*)::BIGINT AS t
          |        FROM c GROUP BY 1, 2)
          |  GROUP BY 1
          |), j AS (
          |  SELECT st.event_type, m, s_stat,
          |    m::HUGEINT * (m - 1)::HUGEINT * (2 * m + 5)::HUGEINT - tie_term AS var_num
          |  FROM st JOIN tt ON st.event_type = tt.event_type
          |), z AS (
          |  SELECT event_type, m, s_stat, var_num::DOUBLE / 18.0 AS vars,
          |    CASE WHEN s_stat > 0 THEN s_stat::DOUBLE - 1.0
          |         WHEN s_stat < 0 THEN s_stat::DOUBLE + 1.0 ELSE 0.0 END AS znum
          |  FROM j
          |), q AS (
          |  SELECT *, CASE WHEN vars > 0 THEN
          |    floor(znum / sqrt(vars) * 1e4 + 0.5)::BIGINT END AS z4
          |  FROM z
          |)
          |SELECT event_type, m AS n_days, s_stat,
          |  CASE WHEN vars > 0 THEN z4::DOUBLE / 1e4 END AS z_r4,
          |  CASE WHEN vars > 0 THEN abs(z4) > 19600 END AS reject
          |FROM q""".stripMargin),
    "q256_pacf" ->
      (acfOracleCtes +
        """, rv AS (
          |  SELECT event_type, n,
          |    rho1::DOUBLE / 1e6 AS r1, rho2::DOUBLE / 1e6 AS r2,
          |    rho3::DOUBLE / 1e6 AS r3, rho4::DOUBLE / 1e6 AS r4,
          |    rho5::DOUBLE / 1e6 AS r5
          |  FROM rr
          |), e1 AS (SELECT *, r1 AS p11 FROM rv
          |), e2 AS (SELECT *, 1.0 - p11 * r1 AS den2 FROM e1
          |), e3 AS (SELECT *, CASE WHEN den2 <> 0.0 THEN (r2 - p11 * r1) / den2 END AS p22 FROM e2
          |), e4 AS (SELECT *, p11 - p22 * p11 AS p21 FROM e3
          |), e5 AS (SELECT *, 1.0 - (p21 * r1 + p22 * r2) AS den3 FROM e4
          |), e6 AS (SELECT *, CASE WHEN den3 <> 0.0 THEN (r3 - (p21 * r2 + p22 * r1)) / den3 END AS p33 FROM e5
          |), e7 AS (SELECT *, p21 - p33 * p22 AS p31, p22 - p33 * p21 AS p32 FROM e6
          |), e8 AS (SELECT *, 1.0 - (p31 * r1 + p32 * r2 + p33 * r3) AS den4 FROM e7
          |), e9 AS (SELECT *, CASE WHEN den4 <> 0.0 THEN (r4 - (p31 * r3 + p32 * r2 + p33 * r1)) / den4 END AS p44 FROM e8
          |), e10 AS (SELECT *, p31 - p44 * p33 AS p41, p32 - p44 * p32 AS p42, p33 - p44 * p31 AS p43 FROM e9
          |), e11 AS (SELECT *, 1.0 - (p41 * r1 + p42 * r2 + p43 * r3 + p44 * r4) AS den5 FROM e10
          |), e12 AS (SELECT *, CASE WHEN den5 <> 0.0 THEN (r5 - (p41 * r4 + p42 * r3 + p43 * r2 + p44 * r1)) / den5 END AS p55 FROM e11
          |)
          |SELECT event_type, n AS n_days,
          |  floor(p11 * 1e6 + 0.5) / 1e6 AS pacf1_r6,
          |  floor(p22 * 1e6 + 0.5) / 1e6 AS pacf2_r6,
          |  floor(p33 * 1e6 + 0.5) / 1e6 AS pacf3_r6,
          |  floor(p44 * 1e6 + 0.5) / 1e6 AS pacf4_r6,
          |  floor(p55 * 1e6 + 0.5) / 1e6 AS pacf5_r6
          |FROM e12""".stripMargin),
    "q247_acf_ljungbox" -> acfLjungBoxOracle("r_fp"),
    // q281's oracle = q247's generator fed r², plus the fixed-df=5
    // decision recomputed from the SAME quantized LB integer
    "q281_arch_lm" -> acfLjungBoxOracle("r_fp * r_fp",
      """,
        |  CASE WHEN lb_s IS NOT NULL THEN
        |    floor(n::DOUBLE * (n::DOUBLE + 2.0) * lb_s::DOUBLE / 1e15 * 1e4 + 0.5)::BIGINT > 110705
        |  END AS reject_arch""".stripMargin),
    "q284_wilcoxon_ampm" ->
      """WITH e AS (
        |  SELECT event_type, ts::TIMESTAMP AS ts, event_id,
        |    ts::TIMESTAMP::DATE AS day,
        |    floor(value * 100 + 0.5)::BIGINT AS vc,
        |    extract(hour FROM ts::TIMESTAMP) < 12 AS am
        |  FROM events WHERE value IS NOT NULL
        |), r0 AS (
        |  SELECT *, row_number() OVER (PARTITION BY event_type, day ORDER BY ts, event_id) AS rn
        |  FROM e
        |), p AS (
        |  SELECT event_type, day,
        |    arg_min(vc, rn) AS open_lv,
        |    arg_max(vc, rn) AS close_lv,
        |    arg_max(vc, rn) FILTER (WHERE am) AS mid_lv
        |  FROM r0 GROUP BY 1, 2
        |), dd AS (
        |  SELECT event_type, d, abs(d) AS ad FROM (
        |    SELECT event_type, close_lv + open_lv - 2 * mid_lv AS d
        |    FROM p WHERE mid_lv IS NOT NULL
        |  ) WHERE d != 0
        |), cells AS (
        |  SELECT event_type, ad, count(*)::BIGINT AS t,
        |    sum(CASE WHEN d > 0 THEN 1 ELSE 0 END)::BIGINT AS tp
        |  FROM dd GROUP BY 1, 2
        |), cum AS (
        |  SELECT event_type, ad, t, tp,
        |    sum(t) OVER (PARTITION BY event_type ORDER BY ad
        |      ROWS UNBOUNDED PRECEDING) AS ct
        |  FROM cells
        |), agg AS (
        |  SELECT event_type, sum(t)::BIGINT AS n, sum(tp)::BIGINT AS n_pos,
        |    sum(tp * (2 * (ct - t) + t + 1))::BIGINT AS w2,
        |    sum(t::HUGEINT * t::HUGEINT * t::HUGEINT - t::HUGEINT) AS ties3
        |  FROM cum GROUP BY 1 HAVING sum(t) >= 2
        |), z AS (
        |  SELECT event_type, n, n_pos,
        |    (2::HUGEINT * n::HUGEINT * (n + 1)::HUGEINT
        |      * (2::HUGEINT * n::HUGEINT + 1) - ties3) AS v12,
        |    (w2::DOUBLE - ((n * (n + 1)) // 2)::DOUBLE)
        |      / sqrt((2::HUGEINT * n::HUGEINT * (n + 1)::HUGEINT
        |        * (2::HUGEINT * n::HUGEINT + 1) - ties3)::DOUBLE / 12.0) AS zz
        |  FROM agg
        |)
        |SELECT event_type, n AS n_eff, n_pos,
        |  CASE WHEN v12::DOUBLE > 0 THEN
        |    floor(zz * 1e4 + 0.5)::BIGINT::DOUBLE / 1e4 END AS z_r4,
        |  CASE WHEN v12::DOUBLE > 0 THEN
        |    abs(floor(zz * 1e4 + 0.5)::BIGINT) > 19600 END AS reject_sym
        |FROM z""".stripMargin,
    "q282_weekday_effect" -> {
      // the q263 kruskal closing over the day-grid returns, grouped
      // by the exact integer epoch-day mod 7
      val obs = "SELECT (day - DATE '1970-01-01') % 7 AS gk, r_fp AS vc FROM r"
      dayRetCtes +
        s"""
           |SELECT 'returns~weekday' AS relation, k_groups, n,
           |  CASE WHEN n > 1 AND corr > 0 THEN
           |    floor(h / corr * 1e4 + 0.5)::BIGINT::DOUBLE / 1e4 END AS h_r4,
           |  CASE WHEN n > 1 AND corr > 0 AND q95x1e4 IS NOT NULL THEN
           |    floor(h / corr * 1e4 + 0.5)::BIGINT > q95x1e4 END AS reject
           |FROM (
           |  SELECT k_groups, n,
           |    3.0 * (sfp::DOUBLE / 1e6) / (n::DOUBLE * (n::DOUBLE + 1.0)) AS h,
           |    1.0 - ties::DOUBLE
           |      / (n::DOUBLE * n::DOUBLE * n::DOUBLE - n::DOUBLE) AS corr
           |  FROM (
           |    SELECT count(*)::BIGINT AS k_groups, sum(ng)::BIGINT AS n,
           |      sum(floor(((r2 - ng::HUGEINT * (nn + 1)::HUGEINT)::DOUBLE
           |           * (r2 - ng::HUGEINT * (nn + 1)::HUGEINT)::DOUBLE
           |           / ng::DOUBLE) * 1e6 + 0.5)::HUGEINT) AS sfp
           |    FROM (
           |      SELECT gk, sum(a)::BIGINT AS ng,
           |        sum(a::HUGEINT * (prev * 2 + t::HUGEINT + 1)) AS r2
           |      FROM (
           |        SELECT gk, vc, count(*)::BIGINT AS a FROM ($obs) GROUP BY 1, 2
           |      ) cells
           |      JOIN (
           |        SELECT vc, t, (sum(t) OVER (ORDER BY vc ROWS BETWEEN
           |          UNBOUNDED PRECEDING AND CURRENT ROW) - t)::HUGEINT AS prev
           |        FROM (SELECT vc, count(*)::BIGINT AS t FROM ($obs) GROUP BY 1)
           |      ) cum USING (vc)
           |      GROUP BY 1
           |    ) per
           |    CROSS JOIN (SELECT count(*)::BIGINT AS nn FROM ($obs)) gl
           |  ) s1
           |  CROSS JOIN (
           |    SELECT sum(t::HUGEINT * t::HUGEINT * t::HUGEINT - t::HUGEINT) AS ties
           |    FROM (SELECT vc, count(*)::BIGINT AS t FROM ($obs) GROUP BY 1)
           |  ) tq
           |) z
           |LEFT JOIN ${StatTables.chi2ValuesSql} ON chi2.df = z.k_groups - 1"""
          .stripMargin
    },
    "q221_var_cvar" ->
      (dayRetCtes +
        """, s AS (
          |  SELECT event_type, list(r_fp ORDER BY r_fp) AS xs FROM r GROUP BY 1
          |), f AS (
          |  SELECT event_type, len(xs)::BIGINT AS n_days,
          |    greatest(1, ceil(len(xs)::DOUBLE * 0.05)::BIGINT) AS k_tail, xs
          |  FROM s
          |)
          |SELECT event_type, n_days, k_tail,
          |  floor((-(xs[k_tail::INT]::DOUBLE)) / 1e6 * 10000 + 0.5)/10000 AS var95_r4,
          |  floor((-(list_sum(list_slice(xs, 1, k_tail::INT))::DOUBLE / k_tail::DOUBLE)) / 1e6 * 10000 + 0.5)/10000 AS cvar95_r4
          |FROM f""".stripMargin),
    "q222_kalman_backtest" ->
      (dayRetCtes +
        """, s AS (
          |  SELECT event_type, list(close_lv::DOUBLE ORDER BY day) AS xs
          |  FROM c GROUP BY 1
          |), kk AS (
          |  SELECT event_type, xs,
          |    CASE WHEN len(xs) > 1 THEN list_reduce(
          |      list_prepend([xs[1], 1e10, 0.0, 0.0],
          |        list_transform(xs[2:], x -> [x, 0.0, 0.0, 0.0])),
          |      (a, e) -> [
          |        a[1] + ((a[2] + 1e9) / ((a[2] + 1e9) + 1e10)) * (e[1] - a[1]),
          |        (1.0 - ((a[2] + 1e9) / ((a[2] + 1e9) + 1e10))) * (a[2] + 1e9),
          |        a[3] + abs(e[1] - a[1]),
          |        a[4] + (e[1] - a[1]) * (e[1] - a[1])]) END AS kf
          |  FROM s
          |), ee AS (
          |  SELECT event_type, xs, kf,
          |    list_reduce(list_prepend(0.0,
          |      list_transform(range(1, len(xs)), k -> abs(xs[k + 1] - xs[k]))),
          |      (a, b) -> a + b) AS san,
          |    (len(xs) - 1)::BIGINT AS n_fc
          |  FROM kk
          |)
          |SELECT event_type, n_fc,
          |  CASE WHEN n_fc > 0 THEN
          |    floor(kf[3] / n_fc::DOUBLE / 1e6 * 10000 + 0.5)/10000 END AS mae_kalman,
          |  CASE WHEN n_fc > 0 THEN
          |    floor(sqrt(kf[4] / n_fc::DOUBLE) / 1e6 * 10000 + 0.5)/10000 END AS rmse_kalman,
          |  CASE WHEN n_fc > 0 THEN
          |    floor(san / n_fc::DOUBLE / 1e6 * 10000 + 0.5)/10000 END AS mae_naive,
          |  CASE WHEN san > 0 THEN
          |    floor(kf[3] / san * 10000 + 0.5)/10000 END AS skill_vs_naive,
          |  CASE WHEN n_fc > 0 THEN
          |    floor((kf[2] + 1e9) / ((kf[2] + 1e9) + 1e10) * 10000 + 0.5)/10000 END AS gain_final
          |FROM ee""".stripMargin),
    "q223_coint_screen" ->
      (dayRetCtes +
        """, ca AS (SELECT event_type AS type_a, day, close_lv AS y FROM c),
          |cb AS (SELECT event_type AS type_b, day, close_lv AS x FROM c),
          |j AS (SELECT * FROM ca JOIN cb USING (day) WHERE type_a < type_b),
          |g AS (
          |  SELECT type_a, type_b, count(*)::BIGINT AS n_days,
          |    sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
          |    sum(x * y)::BIGINT AS sxy, sum(x * x)::BIGINT AS sxx,
          |    list(x::DOUBLE ORDER BY day) AS xs,
          |    list(y::DOUBLE ORDER BY day) AS ys
          |  FROM j GROUP BY 1, 2
          |), f AS (
          |  SELECT *, CASE WHEN (n_days::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE) <> 0
          |    THEN (n_days::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
          |       / (n_days::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE) END AS beta
          |  FROM g
          |), f2 AS (
          |  SELECT *, (sy::DOUBLE - beta * sx::DOUBLE) / n_days::DOUBLE AS alpha FROM f
          |), resid AS (
          |  SELECT *, list_transform(range(1, len(xs) + 1),
          |    i -> ys[i] - (alpha + beta * xs[i])) AS es
          |  FROM f2
          |), rr AS (
          |  SELECT *,
          |    CASE WHEN len(es) > 1 THEN list_reduce(list_prepend(0.0,
          |      list_transform(range(1, len(es)), k -> es[k] * es[k + 1])),
          |      (a, b) -> a + b) END AS num,
          |    CASE WHEN len(es) > 1 THEN list_reduce(list_prepend(0.0,
          |      list_transform(range(1, len(es)), k -> es[k] * es[k])),
          |      (a, b) -> a + b) END AS den
          |  FROM resid
          |)
          |SELECT type_a, type_b, n_days,
          |  CASE WHEN beta IS NOT NULL THEN floor(beta * 10000 + 0.5)/10000 END AS beta_r4,
          |  CASE WHEN alpha IS NOT NULL THEN floor(alpha / 1e6 * 10000 + 0.5)/10000 END AS alpha_r4,
          |  CASE WHEN den > 0 THEN floor(num / den * 10000 + 0.5)/10000 END AS rho_r4,
          |  CASE WHEN den > 0 THEN floor(num / den * 1e6 + 0.5) < 950000 END AS cointegrated
          |FROM rr""".stripMargin),
    "q210_holt_backtest" ->
      (dayRetCtes +
        """, s AS (
          |  SELECT event_type, list(close_lv::DOUBLE ORDER BY day) AS xs
          |  FROM c GROUP BY 1
          |), hh AS (
          |  SELECT event_type, xs,
          |    CASE WHEN len(xs) > 1 THEN list_reduce(
          |      list_prepend([xs[1], 0.0, 0.0, 0.0],
          |        list_transform(xs[2:], x -> [x, 0.0, 0.0, 0.0])),
          |      (a, e) -> [
          |        0.2 * e[1] + 0.8 * (a[1] + a[2]),
          |        0.1 * ((0.2 * e[1] + 0.8 * (a[1] + a[2])) - a[1]) + 0.9 * a[2],
          |        a[3] + abs(e[1] - (a[1] + a[2])),
          |        a[4] + (e[1] - (a[1] + a[2])) * (e[1] - (a[1] + a[2]))]) END AS h,
          |    list_transform(range(1, len(xs) + 1),
          |      i -> list_reduce(xs[1:i], (y, x) -> 0.2 * x + 0.8 * y)) AS ys
          |  FROM s
          |), ee AS (
          |  SELECT event_type, xs, h,
          |    list_reduce(list_prepend(0.0,
          |      list_transform(range(1, len(xs)), k -> abs(xs[k + 1] - ys[k]))),
          |      (a, b) -> a + b) AS sae_e,
          |    list_reduce(list_prepend(0.0,
          |      list_transform(range(1, len(xs)), k -> abs(xs[k + 1] - xs[k]))),
          |      (a, b) -> a + b) AS san
          |  FROM hh
          |), f AS (
          |  SELECT event_type, (len(xs) - 1)::BIGINT AS n_fc,
          |    h[3] AS sae_h, h[4] AS sse_h, sae_e, san
          |  FROM ee
          |)
          |SELECT event_type, n_fc,
          |  CASE WHEN n_fc > 0 THEN
          |    floor(sae_h / n_fc::DOUBLE / 1e6 * 10000 + 0.5)/10000 END AS mae_holt,
          |  CASE WHEN n_fc > 0 THEN
          |    floor(sqrt(sse_h / n_fc::DOUBLE) / 1e6 * 10000 + 0.5)/10000 END AS rmse_holt,
          |  CASE WHEN n_fc > 0 THEN
          |    floor(sae_e / n_fc::DOUBLE / 1e6 * 10000 + 0.5)/10000 END AS mae_ewma,
          |  CASE WHEN n_fc > 0 THEN
          |    floor(san / n_fc::DOUBLE / 1e6 * 10000 + 0.5)/10000 END AS mae_naive,
          |  CASE WHEN san > 0 THEN
          |    floor(sae_h / san * 10000 + 0.5)/10000 END AS skill_vs_naive,
          |  CASE WHEN sae_e > 0 THEN
          |    floor(sae_h / sae_e * 10000 + 0.5)/10000 END AS skill_vs_ewma
          |FROM f""".stripMargin),
    // transitive closure needs WITH RECURSIVE up front; DuckDB allows
    // the non-recursive closes CTEs inside the same RECURSIVE list.
    "q209_corr_clusters" ->
      (dayRetCtes.replaceFirst("WITH ", "WITH RECURSIVE ") +
        """, p AS (
          |  SELECT a.event_type AS type_a, b.event_type AS type_b,
          |    a.r_fp AS x2, b.r_fp AS y2
          |  FROM r a JOIN r b USING (day)
          |  WHERE a.event_type < b.event_type
          |), g AS (
          |  SELECT type_a, type_b, count(*)::BIGINT AS n,
          |    sum(x2)::BIGINT AS sx, sum(y2)::BIGINT AS sy,
          |    sum(x2*y2)::BIGINT AS sxy, sum(x2*x2)::BIGINT AS sxx,
          |    sum(y2*y2)::BIGINT AS syy
          |  FROM p GROUP BY 1, 2
          |), ed AS (
          |  SELECT type_a, type_b FROM g
          |  WHERE sqrt(n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
          |      * sqrt(n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE) > 0
          |    AND abs((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
          |      / (sqrt(n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
          |       * sqrt(n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE))) >= 0.6
          |), e2 AS (
          |  SELECT type_a AS s, type_b AS t FROM ed
          |  UNION ALL SELECT type_b, type_a FROM ed
          |), nodes AS (
          |  SELECT DISTINCT event_type FROM r
          |), reach(s, t) AS (
          |  SELECT event_type, event_type FROM nodes
          |  UNION
          |  SELECT rc.s, e2.t FROM reach rc JOIN e2 ON rc.t = e2.s
          |), cl AS (
          |  SELECT s AS event_type, min(t) AS cluster_id FROM reach GROUP BY 1
          |)
          |SELECT event_type, cluster_id,
          |  (count(*) OVER (PARTITION BY cluster_id))::BIGINT AS cluster_size
          |FROM cl""".stripMargin),
    "q208_sma_crossover" ->
      (dayRetCtes +
        """, s AS (
          |  SELECT event_type, day, close_lv,
          |    sum(close_lv) OVER (PARTITION BY event_type ORDER BY day
          |      ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING) AS s5,
          |    sum(close_lv) OVER (PARTITION BY event_type ORDER BY day
          |      ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING) AS s20,
          |    count(close_lv) OVER (PARTITION BY event_type ORDER BY day
          |      ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING) AS n20,
          |    close_lv - lag(close_lv) OVER (PARTITION BY event_type ORDER BY day) AS r_fp
          |  FROM c
          |), t AS (
          |  SELECT event_type, day, r_fp,
          |    CASE WHEN 4 * s5 > s20 THEN 1 WHEN 4 * s5 < s20 THEN -1 ELSE 0 END AS pos
          |  FROM s WHERE n20 = 20 AND r_fp IS NOT NULL
          |), u AS (
          |  SELECT event_type, r_fp, pos,
          |    lag(pos) OVER (PARTITION BY event_type ORDER BY day) AS prev_pos,
          |    pos::BIGINT * r_fp AS strat_fp
          |  FROM t
          |), g AS (
          |  SELECT event_type,
          |    count(*)::BIGINT AS n_days,
          |    sum(CASE WHEN pos <> 0 THEN 1 ELSE 0 END)::BIGINT AS n_active,
          |    sum(CASE WHEN prev_pos IS NOT NULL AND pos <> prev_pos
          |      THEN 1 ELSE 0 END)::BIGINT AS n_flips,
          |    sum(strat_fp)::BIGINT AS ss1,
          |    sum(strat_fp * strat_fp)::BIGINT AS ss2,
          |    sum(CASE WHEN strat_fp > 0 THEN 1 ELSE 0 END)::BIGINT AS n_hit,
          |    sum(r_fp)::BIGINT AS bh1
          |  FROM u GROUP BY 1
          |), f AS (
          |  SELECT *,
          |    ss1::DOUBLE / n_days::DOUBLE AS mean_d,
          |    sqrt(greatest(0.0, ss2::DOUBLE / n_days::DOUBLE
          |      - (ss1::DOUBLE / n_days::DOUBLE) * (ss1::DOUBLE / n_days::DOUBLE))) AS sd_d
          |  FROM g
          |)
          |SELECT event_type, n_days, n_active, n_flips,
          |  floor(ss1::DOUBLE / 1e6 * 10000 + 0.5)/10000 AS strat_ret_log2,
          |  floor(bh1::DOUBLE / 1e6 * 10000 + 0.5)/10000 AS bh_ret_log2,
          |  CASE WHEN n_active > 0 THEN
          |    floor(n_hit::DOUBLE / n_active::DOUBLE * 10000 + 0.5)/10000 END AS hit_rate,
          |  CASE WHEN sd_d > 0 THEN
          |    floor(mean_d / sd_d * sqrt(252.0) * 10000 + 0.5)/10000 END AS sharpe
          |FROM f""".stripMargin),
    "q203_ewma_backtest" ->
      (dayRetCtes +
        """, s AS (
          |  SELECT event_type, list(close_lv::DOUBLE ORDER BY day) AS xs
          |  FROM c GROUP BY 1
          |), yy AS (
          |  SELECT event_type, xs,
          |    list_transform(range(1, len(xs) + 1),
          |      i -> list_reduce(xs[1:i], (y, x) -> 0.2 * x + 0.8 * y)) AS ys
          |  FROM s
          |), ee AS (
          |  SELECT event_type, xs,
          |    list_transform(range(1, len(xs)), k -> xs[k + 1] - ys[k]) AS es,
          |    list_transform(range(1, len(xs)), k -> xs[k + 1] - xs[k]) AS en
          |  FROM yy
          |), f AS (
          |  SELECT event_type, (len(xs) - 1)::BIGINT AS n_fc,
          |    list_reduce(list_prepend(0.0, list_transform(es, e -> abs(e))), (a, b) -> a + b) AS sae,
          |    list_reduce(list_prepend(0.0, list_transform(es, e -> e * e)), (a, b) -> a + b) AS sse,
          |    list_reduce(list_prepend(0.0, list_transform(en, e -> abs(e))), (a, b) -> a + b) AS san
          |  FROM ee
          |)
          |SELECT event_type, n_fc,
          |  CASE WHEN n_fc > 0 THEN
          |    floor(sae / n_fc::DOUBLE / 1e6 * 10000 + 0.5)/10000 END AS mae_ewma,
          |  CASE WHEN n_fc > 0 THEN
          |    floor(sqrt(sse / n_fc::DOUBLE) / 1e6 * 10000 + 0.5)/10000 END AS rmse_ewma,
          |  CASE WHEN n_fc > 0 THEN
          |    floor(san / n_fc::DOUBLE / 1e6 * 10000 + 0.5)/10000 END AS mae_naive,
          |  CASE WHEN san > 0 THEN
          |    floor(sae / san * 10000 + 0.5)/10000 END AS skill
          |FROM f""".stripMargin),
    "q198_pairs_spread" ->
      (dayRetCtes +
        """, p AS (
          |  SELECT a.event_type AS type_a, b.event_type AS type_b, a.day,
          |    b.close_lv AS x, a.close_lv AS y
          |  FROM c a JOIN c b USING (day)
          |  WHERE a.event_type < b.event_type
          |), g AS (
          |  SELECT type_a, type_b, count(*)::BIGINT AS n_days,
          |    sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy, sum(x*y)::BIGINT AS sxy,
          |    sum(x*x)::BIGINT AS sxx, sum(y*y)::BIGINT AS syy,
          |    arg_max(x, day)::BIGINT AS x_last, arg_max(y, day)::BIGINT AS y_last,
          |    max(day) AS last_day
          |  FROM p GROUP BY 1, 2
          |), f AS (
          |  SELECT *,
          |    n_days::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE AS den_b,
          |    (n_days::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
          |      / (n_days::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE) AS beta_d,
          |    sqrt(n_days::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
          |      * sqrt(n_days::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE) AS den_c
          |  FROM g
          |), f2 AS (
          |  SELECT *,
          |    (sy::DOUBLE - beta_d * sx::DOUBLE) / n_days::DOUBLE AS mean_e,
          |    sqrt(greatest(0.0,
          |      (syy::DOUBLE - 2 * beta_d * sxy::DOUBLE + beta_d * beta_d * sxx::DOUBLE)
          |        / n_days::DOUBLE
          |      - ((sy::DOUBLE - beta_d * sx::DOUBLE) / n_days::DOUBLE)
          |        * ((sy::DOUBLE - beta_d * sx::DOUBLE) / n_days::DOUBLE))) AS sd_e
          |  FROM f
          |)
          |SELECT type_a, type_b, n_days, last_day,
          |  CASE WHEN den_b <> 0 THEN floor(beta_d * 10000 + 0.5)/10000 END AS beta,
          |  CASE WHEN den_c > 0 THEN
          |    floor((n_days::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE) / den_c
          |      * 10000 + 0.5)/10000 END AS corr_px,
          |  CASE WHEN den_b <> 0 THEN floor(sd_e / 1e6 * 10000 + 0.5)/10000 END AS spread_sd,
          |  CASE WHEN den_b <> 0 AND sd_e > 0 THEN
          |    floor((y_last::DOUBLE - beta_d * x_last::DOUBLE - mean_e) / sd_e
          |      * 10000 + 0.5)/10000 END AS z_last
          |FROM f2""".stripMargin),
    "q199_risk_adjusted" ->
      (dayRetCtes +
        """, b AS (
          |  SELECT event_type, day, close_lv,
          |    lag(close_lv) OVER w AS prev,
          |    max(close_lv) OVER (PARTITION BY event_type ORDER BY day
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
          |  FROM c WINDOW w AS (PARTITION BY event_type ORDER BY day)
          |), g AS (
          |  SELECT event_type,
          |    count(close_lv - prev)::BIGINT AS n_days,
          |    sum(close_lv - prev)::BIGINT AS s1,
          |    sum((close_lv - prev) * (close_lv - prev))::BIGINT AS s2,
          |    sum(CASE WHEN close_lv - prev < 0
          |      THEN (close_lv - prev) * (close_lv - prev) ELSE 0 END)::BIGINT AS sn2,
          |    max(peak - close_lv)::BIGINT AS mdd_fp
          |  FROM b GROUP BY 1
          |), f AS (
          |  SELECT event_type, n_days, mdd_fp,
          |    s1::DOUBLE / n_days::DOUBLE AS mean_d,
          |    sqrt(greatest(0.0, s2::DOUBLE / n_days::DOUBLE
          |      - (s1::DOUBLE / n_days::DOUBLE) * (s1::DOUBLE / n_days::DOUBLE))) AS sd_d,
          |    sqrt(sn2::DOUBLE / n_days::DOUBLE) AS ddv_d
          |  FROM g
          |)
          |SELECT event_type, n_days,
          |  floor(mean_d * 252 / 1e6 * 10000 + 0.5)/10000 AS ann_ret_log2,
          |  floor(sd_d * sqrt(252.0) / 1e6 * 10000 + 0.5)/10000 AS ann_vol_log2,
          |  CASE WHEN sd_d > 0 THEN
          |    floor(mean_d / sd_d * sqrt(252.0) * 10000 + 0.5)/10000 END AS sharpe,
          |  CASE WHEN ddv_d > 0 THEN
          |    floor(mean_d / ddv_d * sqrt(252.0) * 10000 + 0.5)/10000 END AS sortino,
          |  floor(mdd_fp::DOUBLE / 1e6 * 10000 + 0.5)/10000 AS max_dd_log2,
          |  CASE WHEN mdd_fp > 0 THEN
          |    floor(mean_d * 252 / mdd_fp::DOUBLE * 10000 + 0.5)/10000 END AS calmar
          |FROM f""".stripMargin),
    "q192_lead_lag" ->
      (dayRetCtes +
        """, lead AS (
          |  SELECT event_type AS lead_type, day + INTERVAL 1 DAY AS day, r_fp AS x FROM r
          |), lagf AS (
          |  SELECT event_type AS lag_type, day, r_fp AS y FROM r
          |), g AS (
          |  SELECT lead_type, lag_type, count(*)::BIGINT AS n_pairs,
          |    sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy, sum(x*y)::BIGINT AS sxy,
          |    sum(x*x)::BIGINT AS sxx, sum(y*y)::BIGINT AS syy
          |  FROM lead JOIN lagf USING (day)
          |  WHERE lead_type <> lag_type
          |  GROUP BY 1, 2
          |)
          |SELECT lead_type, lag_type, n_pairs,
          |  CASE WHEN sqrt(n_pairs::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
          |         * sqrt(n_pairs::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE) > 0 THEN
          |    floor((n_pairs::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
          |      / (sqrt(n_pairs::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
          |        * sqrt(n_pairs::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)) * 10000 + 0.5)/10000
          |  END AS xcorr
          |FROM g""".stripMargin),
    "q175_higher_moments" ->
      (dayRetCtes +
        """, m AS (
          |  SELECT event_type, count(*)::BIGINT AS n_days,
          |    sum(r_fp)::BIGINT AS s1, sum(r_fp*r_fp)::BIGINT AS s2,
          |    sum((r_fp*r_fp)::HUGEINT * r_fp) AS s3,
          |    sum((r_fp*r_fp)::HUGEINT * (r_fp*r_fp)) AS s4
          |  FROM r GROUP BY 1
          |), f AS (
          |  SELECT event_type, n_days,
          |    s1::DOUBLE / n_days::DOUBLE AS rm1,
          |    s2::DOUBLE / n_days::DOUBLE AS rm2,
          |    s3::DOUBLE / n_days::DOUBLE AS rm3,
          |    s4::DOUBLE / n_days::DOUBLE AS rm4
          |  FROM m
          |), g AS (
          |  SELECT event_type, n_days,
          |    rm2 - rm1*rm1 AS mu2,
          |    rm3 - 3*rm1*rm2 + 2*rm1*rm1*rm1 AS mu3,
          |    rm4 - 4*rm1*rm3 + 6*rm1*rm1*rm2 - 3*rm1*rm1*rm1*rm1 AS mu4
          |  FROM f
          |)
          |SELECT event_type, n_days,
          |  CASE WHEN mu2 > 0 THEN floor(sqrt(mu2)/1e6*10000 + 0.5)/10000 END AS vol_d,
          |  CASE WHEN mu2 > 0 THEN floor(mu3/(sqrt(mu2)*mu2)*10000 + 0.5)/10000 END AS skew_d,
          |  CASE WHEN mu2 > 0 THEN floor((mu4/(mu2*mu2) - 3)*10000 + 0.5)/10000 END AS kurt_x
          |FROM g""".stripMargin),
    "q176_return_acf" ->
      (dayRetCtes +
        """, b AS (
          |  SELECT event_type, day, r_fp,
          |    lag(r_fp, 1) OVER w AS y1, lag(r_fp, 2) OVER w AS y2, lag(r_fp, 3) OVER w AS y3
          |  FROM r WINDOW w AS (PARTITION BY event_type ORDER BY day)
          |), l AS (
          |  SELECT event_type, 1 AS lag_k, r_fp AS x, y1 AS y FROM b WHERE y1 IS NOT NULL
          |  UNION ALL SELECT event_type, 2, r_fp, y2 FROM b WHERE y2 IS NOT NULL
          |  UNION ALL SELECT event_type, 3, r_fp, y3 FROM b WHERE y3 IS NOT NULL
          |), g AS (
          |  SELECT event_type, lag_k, count(*)::BIGINT AS n_pairs,
          |    sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy, sum(x*y)::BIGINT AS sxy,
          |    sum(x*x)::BIGINT AS sxx, sum(y*y)::BIGINT AS syy
          |  FROM l GROUP BY 1, 2
          |)
          |SELECT event_type, lag_k, n_pairs,
          |  CASE WHEN sqrt(n_pairs::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
          |         * sqrt(n_pairs::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE) > 0 THEN
          |    floor((n_pairs::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
          |      / (sqrt(n_pairs::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
          |        * sqrt(n_pairs::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)) * 10000 + 0.5)/10000
          |  END AS acf
          |FROM g""".stripMargin),
    "q177_kyle_lambda" ->
      """WITH e AS (
        |  SELECT event_type, ts::TIMESTAMP AS ts, event_id, value,
        |    ts::TIMESTAMP::DATE AS day,
        |    floor(value * 1e4 + 0.5)::BIGINT AS p_fp,
        |    json_extract_string(props, '$.k')::BIGINT AS k
        |  FROM events
        |), win AS (
        |  SELECT *,
        |    p_fp - lag(p_fp) OVER w AS dp,
        |    value - lag(value) OVER w AS chg
        |  FROM e WINDOW w AS (PARTITION BY event_type, day ORDER BY ts, event_id)
        |), sg AS (
        |  SELECT *, last_value(CASE WHEN chg > 0 THEN 1 WHEN chg < 0 THEN -1 END IGNORE NULLS)
        |    OVER (PARTITION BY event_type, day ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sgn
        |  FROM win
        |), t AS (
        |  SELECT event_type, day, sgn * k AS x, dp FROM sg
        |  WHERE dp IS NOT NULL AND sgn IS NOT NULL
        |), g AS (
        |  SELECT event_type, day, count(*)::BIGINT AS n_ticks,
        |    sum(x::HUGEINT) AS sx, sum(dp::HUGEINT) AS sy,
        |    sum((x*dp)::HUGEINT) AS sxy, sum((x*x)::HUGEINT) AS sxx, sum((dp*dp)::HUGEINT) AS syy
        |  FROM t GROUP BY 1, 2
        |)
        |SELECT event_type, day, n_ticks,
        |  CASE WHEN n_ticks::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE <> 0 THEN
        |    floor((n_ticks::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
        |      / (n_ticks::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE) / 1e4 * 10000 + 0.5)/10000
        |  END AS lambda_px,
        |  CASE WHEN (n_ticks::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
        |         * (n_ticks::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE) > 0 THEN
        |    floor((n_ticks::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
        |      * (n_ticks::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
        |      / ((n_ticks::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
        |        * (n_ticks::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)) * 10000 + 0.5)/10000
        |  END AS r2_fit
        |FROM g""".stripMargin,
    "q178_vpin" ->
      """WITH e AS (
        |  SELECT event_type, ts::TIMESTAMP AS ts, event_id, value,
        |    ts::TIMESTAMP::DATE AS day,
        |    json_extract_string(props, '$.k')::BIGINT AS k
        |  FROM events
        |), win AS (
        |  SELECT *, value - lag(value) OVER (PARTITION BY event_type, day ORDER BY ts, event_id) AS chg
        |  FROM e
        |), sg AS (
        |  SELECT *, last_value(CASE WHEN chg > 0 THEN 1 WHEN chg < 0 THEN -1 END IGNORE NULLS)
        |    OVER (PARTITION BY event_type, day ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sgn
        |  FROM win
        |), ck AS (
        |  SELECT *, sum(k) OVER (PARTITION BY event_type ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM sg
        |), b AS (
        |  SELECT event_type, (cum - k) // 2000 AS bucket, sum(k)::BIGINT AS vol,
        |    sum(CASE WHEN sgn = 1 THEN k ELSE 0 END)::BIGINT AS buy_vol,
        |    sum(CASE WHEN sgn = -1 THEN k ELSE 0 END)::BIGINT AS sell_vol
        |  FROM ck GROUP BY 1, 2
        |)
        |SELECT event_type, count(*)::BIGINT AS n_buckets, sum(vol)::BIGINT AS total_vol,
        |  CASE WHEN sum(vol) > 0 THEN
        |    floor(sum(abs(buy_vol - sell_vol))::DOUBLE / sum(vol)::DOUBLE * 10000 + 0.5)/10000
        |  END AS vpin
        |FROM b GROUP BY 1""".stripMargin,
    "q179_momentum" ->
      (dayRetCtes +
        """, sgn AS (
          |  SELECT *,
          |    sum(r_fp) OVER (PARTITION BY event_type ORDER BY day
          |      ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING) AS mom,
          |    count(r_fp) OVER (PARTITION BY event_type ORDER BY day
          |      ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING) AS n_m
          |  FROM r
          |), rk AS (
          |  SELECT *, row_number() OVER (PARTITION BY day ORDER BY mom DESC, event_type) AS rn,
          |    count(*) OVER (PARTITION BY day) AS n_day
          |  FROM sgn WHERE n_m = 5
          |)
          |SELECT w.day, w.event_type AS win_type, l.event_type AS lose_type,
          |  floor(w.r_fp::DOUBLE / 1e6 * 10000 + 0.5)/10000 AS win_ret,
          |  floor(l.r_fp::DOUBLE / 1e6 * 10000 + 0.5)/10000 AS lose_ret,
          |  floor((w.r_fp - l.r_fp)::DOUBLE / 1e6 * 10000 + 0.5)/10000 AS spread
          |FROM rk w JOIN rk l ON w.day = l.day AND w.rn = 1 AND l.rn = l.n_day""".stripMargin),
    "q172_daily_panel" ->
      """WITH e AS (
        |  SELECT event_type, ts::TIMESTAMP AS ts, event_id, value,
        |    ts::TIMESTAMP::DATE AS day,
        |    floor(log2(value)*1e6 + 0.5)::BIGINT AS lv,
        |    json_extract_string(props, '$.k')::BIGINT AS k
        |  FROM events WHERE value > 0
        |), win AS (
        |  SELECT *,
        |    row_number() OVER w AS rn,
        |    lag(lv) OVER w AS prev_lv,
        |    value - lag(value) OVER w AS chg
        |  FROM e
        |  WINDOW w AS (PARTITION BY event_type, day ORDER BY ts, event_id)
        |), sg AS (
        |  SELECT *,
        |    last_value(CASE WHEN chg > 0 THEN 1 WHEN chg < 0 THEN -1 END IGNORE NULLS)
        |      OVER (PARTITION BY event_type, day ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sgn
        |  FROM win
        |), g AS (
        |  SELECT event_type, day, count(*)::BIGINT AS n_ticks,
        |    max(value) AS hi, min(value) AS lo,
        |    arg_min(lv, rn) AS open_lv, arg_max(lv, rn) AS close_lv,
        |    sum(value::DECIMAL(18,4) * k) AS pv,
        |    sum(k)::BIGINT AS volume,
        |    sum(CASE WHEN prev_lv IS NOT NULL THEN (lv - prev_lv) * (lv - prev_lv) END)::BIGINT AS rv_fp,
        |    sum(CASE WHEN sgn = 1 THEN k ELSE 0 END)::BIGINT AS buy_vol,
        |    sum(CASE WHEN sgn = -1 THEN k ELSE 0 END)::BIGINT AS sell_vol
        |  FROM sg GROUP BY 1, 2
        |), f AS (
        |  SELECT *,
        |    (floor(log2(hi)*1e6 + 0.5)::BIGINT - floor(log2(lo)*1e6 + 0.5)::BIGINT)::DOUBLE AS dhl,
        |    (close_lv - open_lv)::DOUBLE AS dco
        |  FROM g
        |)
        |SELECT event_type, day, n_ticks, hi, lo, volume,
        |  CASE WHEN volume > 0 THEN
        |    floor(pv::DOUBLE / volume::DOUBLE * 10000 + 0.5)/10000 END AS vwap,
        |  floor(dco / 1e6 * 10000 + 0.5)/10000 AS ret_cc,
        |  floor(sqrt(coalesce(rv_fp, 0)::DOUBLE) / 1e6 * 10000 + 0.5)/10000 AS rv,
        |  floor(dhl / 1e6 * sqrt(0.6931471805599453) / 2 * 10000 + 0.5)/10000 AS park_vol,
        |  floor(0.6931471805599453 * 1e-6 * sqrt(greatest(0,
        |    0.5 * dhl * dhl - (2 * 0.6931471805599453 - 1) * dco * dco)) * 10000 + 0.5)/10000 AS gk_vol,
        |  CASE WHEN buy_vol + sell_vol > 0 THEN
        |    floor((buy_vol - sell_vol)::DOUBLE / (buy_vol + sell_vol)::DOUBLE * 10000 + 0.5)/10000
        |  END AS ofi
        |FROM f""".stripMargin,
    "q169_roll_spread" ->
      """WITH e AS (
        |  SELECT event_type, ts::TIMESTAMP AS ts, event_id,
        |    ts::TIMESTAMP::DATE AS day,
        |    floor(value * 1e4 + 0.5)::BIGINT AS p_fp
        |  FROM events
        |), d1 AS (
        |  SELECT *, p_fp - lag(p_fp) OVER (PARTITION BY event_type, day ORDER BY ts, event_id) AS dp
        |  FROM e QUALIFY dp IS NOT NULL
        |), d2 AS (
        |  SELECT *, lag(dp) OVER (PARTITION BY event_type, day ORDER BY ts, event_id) AS dprev
        |  FROM d1 QUALIFY dprev IS NOT NULL
        |), g AS (
        |  SELECT event_type, day, count(*)::BIGINT AS n_pairs,
        |    sum(dp) AS sx, sum(dprev) AS sy, sum(dp * dprev) AS sxy
        |  FROM d2 GROUP BY 1, 2
        |)
        |SELECT event_type, day, n_pairs,
        |  floor((n_pairs::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
        |    / (n_pairs::DOUBLE * n_pairs::DOUBLE) / 1e8 * 10000 + 0.5)/10000 AS cov_px2,
        |  CASE WHEN (n_pairs::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
        |    / (n_pairs::DOUBLE * n_pairs::DOUBLE) < 0 THEN
        |    floor(2 * sqrt(-((n_pairs::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
        |      / (n_pairs::DOUBLE * n_pairs::DOUBLE))) / 1e4 * 10000 + 0.5)/10000
        |  END AS roll_spread
        |FROM g""".stripMargin,
    "q170_variance_ratio" ->
      """WITH e AS (
        |  SELECT event_type, ts::TIMESTAMP AS ts, event_id,
        |    ts::TIMESTAMP::DATE AS day,
        |    floor(log2(value)*1e6 + 0.5)::BIGINT AS lv
        |  FROM events WHERE value > 0
        |), r0 AS (
        |  SELECT *, row_number() OVER (PARTITION BY event_type, day ORDER BY ts, event_id) AS rn
        |  FROM e
        |), c AS (
        |  SELECT event_type, day, arg_max(lv, rn) AS close_lv
        |  FROM r0 GROUP BY 1, 2
        |), r AS (
        |  SELECT event_type, day,
        |    close_lv - lag(close_lv) OVER (PARTITION BY event_type ORDER BY day) AS r1
        |  FROM c QUALIFY r1 IS NOT NULL
        |), f AS (
        |  SELECT event_type, r1,
        |    count(*) OVER w5 AS n_in5,
        |    (sum(r1) OVER w5)::BIGINT AS r5
        |  FROM r
        |  WINDOW w5 AS (PARTITION BY event_type ORDER BY day
        |                ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        |), g AS (
        |  SELECT event_type, count(*)::BIGINT AS n1,
        |    sum(r1) AS s1x, sum(r1 * r1) AS s1xx,
        |    sum(CASE WHEN n_in5 = 5 THEN r5 END) AS s5x,
        |    sum(CASE WHEN n_in5 = 5 THEN r5 * r5 END) AS s5xx,
        |    sum(CASE WHEN n_in5 = 5 THEN 1 ELSE 0 END)::BIGINT AS n5
        |  FROM f GROUP BY 1
        |)
        |SELECT event_type, n1, n5,
        |  floor((n1::DOUBLE * s1xx::DOUBLE - s1x::DOUBLE * s1x::DOUBLE)
        |    / (n1::DOUBLE * n1::DOUBLE) / 1e12 * 10000 + 0.5)/10000 AS var_1,
        |  floor((n5::DOUBLE * s5xx::DOUBLE - s5x::DOUBLE * s5x::DOUBLE)
        |    / (n5::DOUBLE * n5::DOUBLE) / 1e12 * 10000 + 0.5)/10000 AS var_5,
        |  CASE WHEN (n1::DOUBLE * s1xx::DOUBLE - s1x::DOUBLE * s1x::DOUBLE)
        |    / (n1::DOUBLE * n1::DOUBLE) > 0 THEN
        |    floor(((n5::DOUBLE * s5xx::DOUBLE - s5x::DOUBLE * s5x::DOUBLE)
        |      / (n5::DOUBLE * n5::DOUBLE))
        |      / (5 * ((n1::DOUBLE * s1xx::DOUBLE - s1x::DOUBLE * s1x::DOUBLE)
        |        / (n1::DOUBLE * n1::DOUBLE))) * 10000 + 0.5)/10000
        |  END AS vr5
        |FROM g""".stripMargin,
    "q167_order_flow" ->
      """WITH e AS (
        |  SELECT event_type, ts::TIMESTAMP AS ts, event_id, value,
        |    ts::TIMESTAMP::DATE AS day,
        |    json_extract_string(props, '$.k')::BIGINT AS k
        |  FROM events
        |), c AS (
        |  SELECT *, value - lag(value) OVER (PARTITION BY event_type, day ORDER BY ts, event_id) AS chg
        |  FROM e
        |), s AS (
        |  SELECT event_type, day, k,
        |    last_value(CASE WHEN chg > 0 THEN 1 WHEN chg < 0 THEN -1 END IGNORE NULLS)
        |      OVER (PARTITION BY event_type, day ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sgn
        |  FROM c
        |), g AS (
        |  SELECT event_type, day,
        |    sum(CASE WHEN sgn = 1 THEN k ELSE 0 END)::BIGINT AS buy_vol,
        |    sum(CASE WHEN sgn = -1 THEN k ELSE 0 END)::BIGINT AS sell_vol,
        |    count(*)::BIGINT AS n_ticks
        |  FROM s GROUP BY 1, 2
        |)
        |SELECT event_type, day, buy_vol, sell_vol, n_ticks,
        |  CASE WHEN buy_vol + sell_vol > 0 THEN
        |    floor((buy_vol - sell_vol)::DOUBLE / (buy_vol + sell_vol)::DOUBLE * 10000 + 0.5)/10000
        |  END AS ofi
        |FROM g""".stripMargin,
    "q165_garman_klass" ->
      """WITH e AS (
        |  SELECT event_type, ts::TIMESTAMP AS ts, event_id, value,
        |    ts::TIMESTAMP::DATE AS day,
        |    floor(log2(value)*1e6 + 0.5)::BIGINT AS lv
        |  FROM events WHERE value > 0
        |), r AS (
        |  SELECT *, row_number() OVER (PARTITION BY event_type, day ORDER BY ts, event_id) AS rn
        |  FROM e
        |), d AS (
        |  SELECT event_type, day,
        |    max(value) AS hi, min(value) AS lo,
        |    arg_min(lv, rn) AS open_lv, arg_max(lv, rn) AS close_lv,
        |    count(*)::BIGINT AS n_ticks
        |  FROM r GROUP BY 1, 2
        |), f AS (
        |  SELECT event_type, day, n_ticks,
        |    (floor(log2(hi)*1e6 + 0.5)::BIGINT - floor(log2(lo)*1e6 + 0.5)::BIGINT)::DOUBLE AS dhl,
        |    (close_lv - open_lv)::DOUBLE AS dco
        |  FROM d
        |)
        |SELECT event_type, day, n_ticks,
        |  floor(0.6931471805599453 * 1e-6 * sqrt(greatest(0,
        |    0.5 * dhl * dhl - (2 * 0.6931471805599453 - 1) * dco * dco)) * 10000 + 0.5)/10000 AS gk_vol
        |FROM f""".stripMargin,
    "q157_parkinson_vol" ->
      """WITH d AS (
        |  SELECT event_type, ts::TIMESTAMP::DATE AS day,
        |    max(value) AS hi, min(value) AS lo, count(*)::BIGINT AS n_ticks
        |  FROM events WHERE value > 0 GROUP BY 1, 2
        |)
        |SELECT event_type, day, n_ticks, hi, lo,
        |  floor((floor(log2(hi)*1e6 + 0.5)::BIGINT - floor(log2(lo)*1e6 + 0.5)::BIGINT)::DOUBLE
        |    / 1e6 * sqrt(0.6931471805599453) / 2 * 10000 + 0.5)/10000 AS park_vol
        |FROM d""".stripMargin,
    "q158_amihud_illiq" ->
      """WITH e AS (
        |  SELECT event_type, ts::TIMESTAMP AS ts, event_id,
        |    ts::TIMESTAMP::DATE AS day,
        |    floor(log2(value)*1e6 + 0.5)::BIGINT AS lv,
        |    value::DECIMAL(18,4) AS vd,
        |    json_extract_string(props, '$.k')::BIGINT AS k
        |  FROM events WHERE value > 0
        |), r AS (
        |  SELECT *, row_number() OVER (PARTITION BY event_type, day ORDER BY ts, event_id) AS rn
        |  FROM e
        |), d AS (
        |  SELECT event_type, day,
        |    arg_min(lv, rn) AS open_lv, arg_max(lv, rn) AS close_lv,
        |    sum(vd * k) AS dvol, count(*) AS n_ticks
        |  FROM r GROUP BY 1, 2
        |), q AS (
        |  SELECT event_type,
        |    floor(abs(close_lv - open_lv)::DOUBLE / 1e6 / dvol::DOUBLE * 1e6 * 1e6 + 0.5)::BIGINT AS iq
        |  FROM d WHERE dvol > 0
        |)
        |SELECT event_type, count(*)::BIGINT AS n_days,
        |  floor(sum(iq)::DOUBLE / (count(*)::DOUBLE * 1e6) * 10000 + 0.5)/10000 AS mean_illiq,
        |  floor(max(iq)::DOUBLE / 1e6 * 10000 + 0.5)/10000 AS max_illiq
        |FROM q GROUP BY 1""".stripMargin,
    "q159_rolling_beta" ->
      """WITH e AS (
        |  SELECT event_type, ts::TIMESTAMP AS ts, event_id,
        |    ts::TIMESTAMP::DATE AS day,
        |    floor(log2(value)*1e6 + 0.5)::BIGINT AS lv
        |  FROM events WHERE value > 0
        |), r AS (
        |  SELECT *, row_number() OVER (PARTITION BY event_type, day ORDER BY ts, event_id) AS rn
        |  FROM e
        |), c AS (
        |  SELECT event_type, day, arg_max(lv, rn) AS close_lv
        |  FROM r GROUP BY 1, 2
        |), ret AS (
        |  SELECT event_type, day,
        |    close_lv - lag(close_lv) OVER (PARTITION BY event_type ORDER BY day) AS r_fp
        |  FROM c QUALIFY r_fp IS NOT NULL
        |), mkt AS (
        |  SELECT day, floor(sum(r_fp)::DOUBLE / count(*)::DOUBLE + 0.5)::BIGINT AS m_fp
        |  FROM ret GROUP BY 1
        |), s AS (
        |  SELECT ret.event_type, ret.day,
        |    count(*) OVER fr AS n_w,
        |    (sum(m_fp) OVER fr)::BIGINT AS sx,
        |    (sum(r_fp) OVER fr)::BIGINT AS sy,
        |    (sum(m_fp * m_fp) OVER fr)::BIGINT AS sxx,
        |    (sum(r_fp * r_fp) OVER fr)::BIGINT AS syy,
        |    (sum(m_fp * r_fp) OVER fr)::BIGINT AS sxy
        |  FROM ret JOIN mkt USING (day)
        |  WINDOW fr AS (PARTITION BY ret.event_type ORDER BY ret.day
        |                ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
        |)
        |SELECT event_type, day,
        |  CASE WHEN n_w::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE != 0 THEN
        |    floor((n_w::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
        |      / (n_w::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE) * 10000 + 0.5)/10000
        |  END AS beta,
        |  CASE WHEN sqrt(n_w::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
        |          * sqrt(n_w::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE) > 0 THEN
        |    floor((n_w::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
        |      / (sqrt(n_w::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
        |       * sqrt(n_w::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)) * 10000 + 0.5)/10000
        |  END AS corr_r
        |FROM s WHERE n_w = 20""".stripMargin,
    "q156_obv" ->
      """WITH e AS (
        |  SELECT event_id, ts::TIMESTAMP AS ts, event_type, value,
        |    json_extract_string(props, '$.k')::BIGINT AS vol
        |  FROM events
        |), f AS (
        |  SELECT event_id, ts, event_type,
        |    value - lag(value) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS df,
        |    vol
        |  FROM e
        |), g AS (
        |  SELECT event_id, ts, event_type,
        |    CASE WHEN df > 0 THEN vol WHEN df < 0 THEN -vol ELSE 0 END AS flow
        |  FROM f
        |)
        |SELECT event_id, event_type,
        |  (sum(flow) OVER (PARTITION BY event_type ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS obv
        |FROM g""".stripMargin,
    "q155_intraday_seasonality" ->
      """WITH e AS (
        |  SELECT event_id, ts::TIMESTAMP AS ts, event_type, value
        |  FROM events WHERE value > 0
        |), l AS (
        |  SELECT event_type, ts,
        |    floor(log2(value) * 1e6 + 0.5)::BIGINT AS lv,
        |    lag(floor(log2(value) * 1e6 + 0.5)::BIGINT) OVER (
        |      PARTITION BY event_type, ts::DATE ORDER BY ts, event_id) AS prev
        |  FROM e
        |), r AS (
        |  SELECT event_type, hour(ts) AS hod, abs(lv - prev) AS ar
        |  FROM l WHERE prev IS NOT NULL
        |)
        |SELECT event_type, hod, count(*)::BIGINT AS n_returns,
        |  floor(sum(ar)::DOUBLE / (count(*)::DOUBLE * 1e6) * 10000 + 0.5)/10000 AS mean_abs_ret,
        |  floor(max(ar)::DOUBLE / 1e6 * 10000 + 0.5)/10000 AS max_abs_ret
        |FROM r GROUP BY 1, 2""".stripMargin,
    "q154_drawdown_episodes" ->
      """WITH e AS (
        |  SELECT event_id, ts::TIMESTAMP AS ts, event_type, value FROM events
        |), p AS (
        |  SELECT *,
        |    max(value) OVER (PARTITION BY event_type ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak,
        |    row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS g_all
        |  FROM e
        |), u AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS g_under
        |  FROM p WHERE value < peak
        |)
        |SELECT event_type, min(ts) AS start_ts, max(ts) AS end_ts,
        |  count(*)::BIGINT AS n_rows,
        |  floor(max((peak - value) / peak) * 10000 + 0.5)/10000 AS max_dd
        |FROM u GROUP BY event_type, g_all - g_under""".stripMargin,
    "q153_realized_vol" ->
      """WITH e AS (
        |  SELECT event_id, ts::TIMESTAMP AS ts, event_type, value
        |  FROM events WHERE value > 0
        |), l AS (
        |  SELECT event_type, ts::DATE AS day,
        |    floor(log2(value) * 1e6 + 0.5)::BIGINT AS lv,
        |    lag(floor(log2(value) * 1e6 + 0.5)::BIGINT) OVER (
        |      PARTITION BY event_type, ts::DATE ORDER BY ts, event_id) AS prev
        |  FROM e
        |)
        |SELECT event_type, day, count(*)::BIGINT AS n_returns,
        |  sum((lv - prev) * (lv - prev))::BIGINT AS rv_fp,
        |  floor(sqrt(sum((lv - prev) * (lv - prev))::DOUBLE) / 1e6 * 10000 + 0.5)/10000 AS vol
        |FROM l WHERE prev IS NOT NULL GROUP BY 1, 2""".stripMargin,
    "q126_vwap" ->
      """WITH e AS (
        |  SELECT event_type, date_trunc('day', ts::TIMESTAMP) AS day,
        |    value::DECIMAL(18,4) AS vd,
        |    json_extract_string(props, '$.k')::BIGINT AS k
        |  FROM events
        |)
        |SELECT event_type, day::DATE AS day,
        |  CASE WHEN sum(k) > 0 THEN
        |    floor((sum(vd * k)::DOUBLE / sum(k)::DOUBLE)*10000 + 0.5)/10000
        |  END AS vwap,
        |  sum(k)::BIGINT AS volume, count(*) AS n_rows
        |FROM e GROUP BY 1, 2""".stripMargin,
    "q128_stochastic_osc" ->
      """WITH e AS (
        |  SELECT event_type, ts::TIMESTAMP AS ts, event_id,
        |    ts::TIMESTAMP::DATE AS day,
        |    floor(value * 100.0 + 0.5)::BIGINT AS vc
        |  FROM events WHERE value IS NOT NULL
        |), r0 AS (
        |  SELECT *, row_number() OVER (PARTITION BY event_type, day ORDER BY ts, event_id) AS rn
        |  FROM e
        |), d AS (
        |  SELECT event_type, day, max(vc) AS hi, min(vc) AS lo,
        |    arg_max(vc, rn) AS close_c
        |  FROM r0 GROUP BY 1, 2
        |), w AS (
        |  SELECT event_type, day, close_c,
        |    max(hi) OVER w14 AS h14, min(lo) OVER w14 AS l14,
        |    count(*) OVER w14 AS nw
        |  FROM d WINDOW w14 AS (PARTITION BY event_type ORDER BY day
        |                        ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
        |), k AS (
        |  SELECT event_type, day, close_c, h14, l14,
        |    CASE WHEN h14 > l14 THEN
        |      (2 * (close_c - l14) * 1000000 + (h14 - l14)) // (2 * (h14 - l14))
        |    END AS k_fp
        |  FROM w WHERE nw = 14
        |), s AS (
        |  SELECT *, sum(k_fp) OVER w3 AS sum3,
        |    count(k_fp) OVER w3 AS nk3, count(*) OVER w3 AS nr3
        |  FROM k WINDOW w3 AS (PARTITION BY event_type ORDER BY day
        |                       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |)
        |SELECT event_type, day, close_c, h14 AS h14_c, l14 AS l14_c,
        |  k_fp::DOUBLE / 1e4 AS pct_k_r4,
        |  CASE WHEN nk3 = 3 AND nr3 = 3 THEN
        |    ((2 * sum3 + 3) // 6)::DOUBLE / 1e4
        |  END AS pct_d_r4
        |FROM s""".stripMargin,
    "q129_rsi" ->
      """WITH e AS (
        |  SELECT event_id, event_type, ts::TIMESTAMP AS ts,
        |    value::DECIMAL(18,4) AS vd
        |  FROM events
        |), d AS (
        |  SELECT event_id, event_type, ts,
        |    vd - lag(vd) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS df
        |  FROM e
        |), f AS (
        |  SELECT event_id, event_type,
        |    sum(CASE WHEN df > 0 THEN df ELSE 0 END) OVER fr AS sg,
        |    sum(CASE WHEN df < 0 THEN -df ELSE 0 END) OVER fr AS sl,
        |    count(*) OVER fr AS n14
        |  FROM d WHERE df IS NOT NULL
        |  WINDOW fr AS (PARTITION BY event_type ORDER BY ts, event_id
        |                ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
        |)
        |SELECT event_id, event_type,
        |  CASE WHEN sl > 0 THEN
        |    floor((100 - 100/(1 + sg::DOUBLE/sl::DOUBLE))*10000 + 0.5)/10000
        |  ELSE 100 END AS rsi
        |FROM f WHERE n14 = 14""".stripMargin,
    "q125_twap" ->
      """WITH e AS (
        |  SELECT event_type, event_id, value, ts::TIMESTAMP AS ts,
        |    date_trunc('day', ts::TIMESTAMP) AS day
        |  FROM events
        |), x AS (
        |  SELECT event_type, day, value,
        |    coalesce(lead(epoch_us(ts)) OVER (PARTITION BY event_type, day ORDER BY ts, event_id),
        |             epoch_us(day + INTERVAL 1 DAY)) - epoch_us(ts) AS w_us
        |  FROM e
        |)
        |SELECT event_type, day::DATE AS day,
        |  floor((sum(value::DECIMAL(18,4) * w_us)::DOUBLE / sum(w_us)::DOUBLE)*10000 + 0.5)/10000 AS twap,
        |  count(*) AS n_rows
        |FROM x GROUP BY 1, 2""".stripMargin,
    "q108_rolling_bands" ->
      """WITH e AS (
        |  SELECT event_id, event_type, ts::TIMESTAMP AS ts,
        |    value::DECIMAL(18,4) AS vd
        |  FROM events
        |), w AS (
        |  SELECT event_id, event_type,
        |    count(*) OVER fr AS n_w,
        |    sum(vd) OVER fr AS s1,
        |    sum(vd * vd) OVER fr AS s2
        |  FROM e
        |  WINDOW fr AS (PARTITION BY event_type ORDER BY ts, event_id
        |                ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
        |)
        |SELECT event_id, event_type, n_w::BIGINT AS n_w,
        |  floor((s1::DOUBLE / n_w)*10000 + 0.5)/10000 AS ma,
        |  CASE WHEN n_w > 1 THEN floor(sqrt(greatest(0,
        |    (s2::DOUBLE - (s1::DOUBLE * s1::DOUBLE) / n_w) / (n_w - 1)))*10000 + 0.5)/10000 END AS sd,
        |  CASE WHEN n_w > 1 THEN floor((s1::DOUBLE / n_w - 2 * sqrt(greatest(0,
        |    (s2::DOUBLE - (s1::DOUBLE * s1::DOUBLE) / n_w) / (n_w - 1))))*10000 + 0.5)/10000 END AS lo_band,
        |  CASE WHEN n_w > 1 THEN floor((s1::DOUBLE / n_w + 2 * sqrt(greatest(0,
        |    (s2::DOUBLE - (s1::DOUBLE * s1::DOUBLE) / n_w) / (n_w - 1))))*10000 + 0.5)/10000 END AS hi_band
        |FROM w""".stripMargin,
    "q109_drawdown" ->
      """WITH w AS (
        |  SELECT event_type, value,
        |    max(value) OVER (PARTITION BY event_type ORDER BY ts::TIMESTAMP, event_id
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
        |  FROM events
        |)
        |SELECT event_type,
        |  floor(max(peak)*10000 + 0.5)/10000 AS max_peak,
        |  floor(max(CASE WHEN peak > 0 THEN (peak - value) / peak ELSE 0 END)*10000 + 0.5)/10000 AS max_dd,
        |  count(*)::BIGINT AS n_rows
        |FROM w GROUP BY 1""".stripMargin,
    "q110_corr_matrix" ->
      """WITH b AS (
        |  SELECT event_type, date_trunc('minute', ts::TIMESTAMP) AS bin,
        |    sum(value::DECIMAL(18,4)) AS sv, count(*) AS n
        |  FROM events GROUP BY 1, 2
        |), m AS (
        |  SELECT event_type, bin,
        |    floor(sv::DOUBLE / n * 1000000 + 0.5)::DECIMAL(18,0) AS mu
        |  FROM b
        |), p AS (
        |  SELECT a.event_type AS type_a, c.event_type AS type_b,
        |    count(*) AS n_bins,
        |    sum(a.mu) AS sx, sum(c.mu) AS sy,
        |    sum(a.mu * c.mu) AS sxy,
        |    sum(a.mu * a.mu) AS sxx,
        |    sum(c.mu * c.mu) AS syy
        |  FROM m a JOIN m c ON a.bin = c.bin AND a.event_type < c.event_type
        |  GROUP BY 1, 2
        |)
        |SELECT type_a, type_b, n_bins::BIGINT AS n_bins,
        |  CASE WHEN sqrt(n_bins::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
        |          * sqrt(n_bins::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE) > 0
        |    THEN floor((n_bins::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
        |       / (sqrt(n_bins::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
        |        * sqrt(n_bins::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE))*10000 + 0.5)/10000
        |  END AS corr_r
        |FROM p""".stripMargin
  )
}
