package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-symbol running daily low/high — the tick producer's hidden
  * state (stream_data_producer.py:47-53 keeps last price + running
  * low/high per symbol) re-expressed as an engine operator with
  * `mapGroupsWithState`, so downstream consumers don't have to trust
  * producer-side fields.
  *
  * State is one (low, high, day) triple per symbol — O(keys), reset on
  * day rollover, with a processing-time timeout to drop keys that go
  * quiet. This is the custom-stateful-operator template for the
  * engine: KeyValueGroupedDataset + GroupState, checkpointed by the
  * streaming engine.
  */
object RunningExtrema {

  case class PricePoint(symbol: String, price: Double, day: String)
  case class ExtremaState(day: String, low: Double, high: Double)
  case class Extrema(symbol: String, day: String, today_low: Double, today_high: Double)

  def update(evictAfter: Option[String])(symbol: String, points: Iterator[PricePoint],
                                         state: GroupState[ExtremaState]): Extrema = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      return Extrema(symbol, s.day, s.low, s.high)
    }
    var s = state.getOption.getOrElse(ExtremaState("", Double.MaxValue, Double.MinValue))
    points.foreach { p =>
      s = if (p.day != s.day && s.day.nonEmpty)
        ExtremaState(p.day, p.price, p.price) // day rollover resets
      else
        ExtremaState(p.day, math.min(s.low, p.price), math.max(s.high, p.price))
    }
    state.update(s)
    evictAfter.foreach(state.setTimeoutDuration)
    Extrema(symbol, s.day, s.low, s.high)
  }

  /** Streaming (or batch) running extrema per (symbol, day). Input
    * needs symbol/price/timestamp columns (post-Ingest.clean).
    *
    * `evictAfter` (e.g. Some("1 hour")) enables processing-time state
    * eviction for keys that go quiet — use it in long-running
    * production queries. Note the engine then schedules continuous
    * timeout-check batches, so `processAllAvailable()`-style test
    * drains must use the default (no timeout, state bounded by key
    * cardinality). */
  def stream(spark: SparkSession, cleaned: DataFrame,
             evictAfter: Option[String] = None): Dataset[Extrema] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val timeout =
      if (evictAfter.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    cleaned
      .select(col("symbol"), col("price"),
        date_format(col("timestamp"), "yyyy-MM-dd").as("day"))
      .as[PricePoint]
      .groupByKey(_.symbol)
      .mapGroupsWithState(timeout)(update(evictAfter))
  }
}
