package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.Transitions

/** Transitions' two evaluation strategies must agree BIT FOR BIT:
  * the direct per-user window and the chunked two-level form
  * (lag-via-halo + running-sum-via-prefix) produce identical
  * (prev, prev_type, new_s, sid) on every row — on both testdata
  * corpora and on a planted dominant-bot feed (one user carrying 50%
  * of all events, the skew regime the chunked path exists for). */
class TransitionsChunkedSpec extends SparkSpec {

  private def proj(df: DataFrame): DataFrame =
    df.select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
      col("prev"), col("prev_type"), col("new_s"), col("sid"))

  private def pin(events: DataFrame, label: String): Unit = {
    val a = proj(Transitions.flagsDirect(events))
    val b = proj(Transitions.flagsChunked(events))
    assert(a.count() == b.count() && a.count() > 0, s"$label: row counts")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      s"$label: chunked session flags must be bit-identical to the direct window")
  }

  test("chunked ≡ direct on events sf0.001") {
    pin(Tables.events(spark, "/root/testdata/sf0.001"), "sf0.001")
  }

  test("chunked ≡ direct on events sf0.01") {
    pin(Tables.events(spark, "/root/testdata/sf0.01"), "sf0.01")
  }

  test("dominant bot user (50% of volume) — chunked ≡ direct, and counts agree") {
    // one bot emits every other event for 3 days at ~1/min; 40 normal
    // users fill the rest. Gaps > 30 min occur for the normal users
    // (sparse per-user activity) and at the bot's planted pauses.
    val n = 8000L
    val base = lit(java.sql.Timestamp.valueOf("2024-03-01 00:00:00")).cast("long")
    val ev = spark.range(0, n).select(
      col("id").as("event_id"),
      when(col("id") % 2 === 0, lit("bot"))
        .otherwise(concat(lit("u"), (col("id") % 40).cast("string"))).as("user_id"),
      // ~37 s stride plus an hour-long planted pause every 500 events
      (base + col("id") * 37 + (col("id") / 500) * 3600).cast("timestamp").as("ts"),
      element_at(array(lit("view"), lit("click"), lit("purchase"), lit("error")),
        ((col("id") * 7) % 4 + 1).cast("int")).as("event_type"))
    pin(ev, "bot feed")
    val a = Transitions.counts(ev, chunked = false)
    val b = Transitions.counts(ev, chunked = true)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "transition counts must agree between strategies")
  }
}
