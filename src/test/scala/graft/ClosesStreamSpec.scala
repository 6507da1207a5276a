package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.StreamPipeline

/** closesMaintain: the maintained (instrument, day) close grid must
  * serve BOTH q199's risk summary and q198's pairs screen
  * BIT-IDENTICAL to a batch rebuild. The state reduction (later tick
  * wins, keyed by (ts, event_id)) is associative/commutative/
  * idempotent, so a hash-SHUFFLED split — no arrival order contract
  * at all — must converge too, and a replayed batch is a no-op twice
  * over (marker + idempotent max). */
class ClosesStreamSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toSeq).toSet

  test("3-way interleaved split: riskServe == declared q199, pairsServe == declared q198") {
    val ev = graft.core.Tables.events(spark, dir)
    val p = Files.createTempDirectory("graft_cl3").toString + "/st"
    (0 until 3).foreach { r =>
      StreamPipeline.closesBatch(ev.filter(col("event_id") % 3 === r), p, r.toLong)
    }
    assert(rows(StreamPipeline.riskServe(spark, p)) ==
      rows(SparkEntry.queries("q199_risk_adjusted")(spark, dir)),
      "served risk summary must equal declared q199 bitwise")
    assert(rows(StreamPipeline.pairsServe(spark, p)) ==
      rows(SparkEntry.queries("q198_pairs_spread")(spark, dir)),
      "served pairs screen must equal declared q198 bitwise")
    assert(rows(StreamPipeline.crossoverServe(spark, p)) ==
      rows(SparkEntry.queries("q208_sma_crossover")(spark, dir)),
      "served crossover backtest must equal declared q208 bitwise")
    assert(rows(StreamPipeline.ewmaServe(spark, p)) ==
      rows(SparkEntry.queries("q203_ewma_backtest")(spark, dir)),
      "served EWMA backtest must equal declared q203 bitwise")
    assert(rows(StreamPipeline.holtServe(spark, p)) ==
      rows(SparkEntry.queries("q210_holt_backtest")(spark, dir)),
      "served Holt backtest must equal declared q210 bitwise")
    assert(rows(StreamPipeline.varCvarServe(spark, p)) ==
      rows(SparkEntry.queries("q221_var_cvar")(spark, dir)),
      "served VaR/CVaR must equal declared q221 bitwise")
    assert(rows(StreamPipeline.kalmanServe(spark, p)) ==
      rows(SparkEntry.queries("q222_kalman_backtest")(spark, dir)),
      "served Kalman backtest must equal declared q222 bitwise")
    assert(rows(StreamPipeline.cointServe(spark, p)) ==
      rows(SparkEntry.queries("q223_coint_screen")(spark, dir)),
      "served cointegration screen must equal declared q223 bitwise")
    assert(rows(StreamPipeline.hwServe(spark, p)) ==
      rows(SparkEntry.queries("q233_holt_winters")(spark, dir)),
      "served Holt-Winters backtest must equal declared q233 bitwise")
    assert(rows(StreamPipeline.garchServe(spark, p)) ==
      rows(SparkEntry.queries("q236_garch_backtest")(spark, dir)),
      "served GARCH backtest must equal declared q236 bitwise")
    assert(rows(StreamPipeline.jbServe(spark, p)) ==
      rows(SparkEntry.queries("q257_jarque_bera")(spark, dir)),
      "served Jarque-Bera must equal declared q257 bitwise")
    assert(rows(StreamPipeline.runsServe(spark, p)) ==
      rows(SparkEntry.queries("q258_runs_test")(spark, dir)),
      "served runs test must equal declared q258 bitwise")
    assert(rows(StreamPipeline.mannKendallServe(spark, p)) ==
      rows(SparkEntry.queries("q259_mann_kendall")(spark, dir)),
      "served Mann-Kendall must equal declared q259 bitwise")
    assert(rows(StreamPipeline.hurstServe(spark, p)) ==
      rows(SparkEntry.queries("q261_hurst_rs")(spark, dir)),
      "served Hurst exponent must equal declared q261 bitwise")
    assert(rows(StreamPipeline.pettittServe(spark, p)) ==
      rows(SparkEntry.queries("q271_pettitt")(spark, dir)),
      "served Pettitt change point must equal declared q271 bitwise")
    assert(rows(StreamPipeline.vonNeumannServe(spark, p)) ==
      rows(SparkEntry.queries("q274_von_neumann")(spark, dir)),
      "served von Neumann ratio must equal declared q274 bitwise")
    assert(rows(StreamPipeline.turningPointsServe(spark, p)) ==
      rows(SparkEntry.queries("q275_turning_points")(spark, dir)),
      "served turning points must equal declared q275 bitwise")
    assert(rows(StreamPipeline.kpssServe(spark, p)) ==
      rows(SparkEntry.queries("q276_kpss")(spark, dir)),
      "served KPSS must equal declared q276 bitwise")
    assert(rows(StreamPipeline.dickeyFullerServe(spark, p)) ==
      rows(SparkEntry.queries("q277_dickey_fuller")(spark, dir)),
      "served Dickey-Fuller must equal declared q277 bitwise")
    assert(rows(StreamPipeline.archServe(spark, p)) ==
      rows(SparkEntry.queries("q281_arch_lm")(spark, dir)),
      "served ARCH/McLeod-Li must equal declared q281 bitwise")
  }

  test("5-way hash-shuffled split converges identically; replay is a no-op") {
    val ev = graft.core.Tables.events(spark, dir)
    val p = Files.createTempDirectory("graft_cl5").toString + "/st"
    (0 until 5).foreach { r =>
      StreamPipeline.closesBatch(
        ev.filter(pmod(xxhash64(col("event_id")), lit(5)) === r), p, r.toLong)
    }
    assert(rows(StreamPipeline.riskServe(spark, p)) ==
      rows(SparkEntry.queries("q199_risk_adjusted")(spark, dir)),
      "shuffled split must converge to the same grid (no arrival contract)")
    val before = spark.read.parquet(p).collect().toSet
    StreamPipeline.closesBatch(
      ev.filter(pmod(xxhash64(col("event_id")), lit(5)) === 4), p, 4L)
    assert(spark.read.parquet(p).collect().toSet == before, "marker replay must be a no-op")
    // ...and even WITHOUT the marker the merge is idempotent: replay
    // batch 2's data under a fresh id — the max reduction absorbs it
    StreamPipeline.closesBatch(
      ev.filter(pmod(xxhash64(col("event_id")), lit(5)) === 2), p, 99L)
    assert(spark.read.parquet(p).collect().toSet == before,
      "idempotent max must absorb a duplicate delivery under a new batch id")
  }

  test("store is one row per (instrument, day) and matches the batch state") {
    val ev = graft.core.Tables.events(spark, dir)
    val p = Files.createTempDirectory("graft_cl1").toString + "/st"
    StreamPipeline.closesBatch(ev, p, 0L)
    val store = spark.read.parquet(p)
    assert(store.groupBy(col("event_type"), col("day")).count()
      .filter(col("count") > 1).isEmpty, "one row per (instrument, day)")
    assert(rows(store) == rows(graft.operators.DailyCloses.state(ev)),
      "single-batch store must equal the batch state exactly")
  }
}
