package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Seedable synthetic tick source (S1,
  * stream_data_producer.py:73-110): per-symbol random walk with
  * running daily low/high, emitted in the reference's raw wire shape
  * (string-typed volume/percent_change/timestamp, §1.2 schema quirks
  * included: the producer names the field `percent_change`).
  *
  * Fully deterministic and distributed: the walk is computed
  * closed-form as exp(prefix-sum of hashed log-returns) with window
  * functions — no sequential driver loop, so the same (seed, symbol,
  * tick#) always yields the same tick on any cluster size.
  */
object TickSource {

  val symbols: Seq[String] =
    Seq("AAPL", "GOOGL", "MSFT", "AMZN", "TSLA", "META", "NVDA", "INTC")

  /** `n` ticks per symbol starting at `startEpochSec`, one every
    * `intervalSec`. Raw wire schema: symbol, price, change,
    * percent_change (with trailing %), volume (string), today_low,
    * today_high, timestamp (ISO string). */
  def ticks(spark: SparkSession, nPerSymbol: Int, startEpochSec: Long = 1704067200L,
            intervalSec: Int = 2, seed: Long = 42L): DataFrame = {
    val nSym = symbols.length
    val base = spark.range(nPerSymbol.toLong * nSym)
      .withColumn("sym_idx", (col("id") % nSym).cast("int"))
      .withColumn("i", (col("id") / nSym).cast("long"))
      .withColumn("symbol", element_at(array(symbols.map(lit): _*), col("sym_idx") + 1))
    // pseudo-random in [-0.5%, +0.5%] + a 5%-likely +-2% jump, from the
    // seeded hash of (symbol, tick#)
    val u = (pmod(xxhash64(lit(seed), col("symbol"), col("i")), lit(1000000L)).cast("double") / 1e6)
    val jumpU = (pmod(xxhash64(lit(seed + 1), col("symbol"), col("i")), lit(1000000L)).cast("double") / 1e6)
    val ret = (u - 0.5) * 0.01 + when(jumpU < 0.05, (jumpU * 40 - 1.0) * 0.02).otherwise(0.0)
    val walk = base
      .withColumn("logret", log(lit(1.0) + ret))
      .withColumn("price",
        round(lit(100.0) * exp(sum(col("logret")).over(
          Window.partitionBy(col("symbol")).orderBy(col("i"))
            .rowsBetween(Window.unboundedPreceding, 0))), 2))
    val w = Window.partitionBy(col("symbol")).orderBy(col("i"))
    val wAll = w.rowsBetween(Window.unboundedPreceding, 0)
    walk
      .withColumn("change", coalesce(col("price") - lag(col("price"), 1).over(w), lit(0.0)))
      .withColumn("percent_change",
        concat(round(col("change") / (col("price") - col("change")) * 100, 2).cast("string"), lit("%")))
      .withColumn("volume", (pmod(xxhash64(lit(seed + 2), col("symbol"), col("i")), lit(10000L)) + 100L).cast("string"))
      .withColumn("today_low", min(col("price")).over(wAll))
      .withColumn("today_high", max(col("price")).over(wAll))
      .withColumn("timestamp",
        date_format(timestamp_seconds(lit(startEpochSec) + col("i") * intervalSec), "yyyy-MM-dd'T'HH:mm:ss"))
      .select("symbol", "price", "change", "percent_change", "volume", "today_low", "today_high", "timestamp")
  }
}
