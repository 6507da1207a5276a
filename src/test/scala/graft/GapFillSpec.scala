package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.GapFill

class GapFillSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("locf: grid covers span, gaps carried forward, flags correct") {
    val df = Seq(
      ("A", ts("2024-01-01 00:00:10"), 1L, 10.0),
      ("A", ts("2024-01-01 00:00:50"), 2L, 11.0), // same minute — later wins
      ("A", ts("2024-01-01 00:03:05"), 3L, 14.0), // minutes 1,2 are gaps
      ("B", ts("2024-01-01 00:07:00"), 4L, 7.0)
    ).toDF("k", "t", "id", "v")
    val out = GapFill.locf(df, col("k"), "k", col("t"), col("v"), Seq(col("t"), col("id")))
      .select($"k", date_format($"bin", "HH:mm").as("m"), $"value", $"is_observed")
      .as[(String, String, Double, Boolean)].collect().toSet
    assert(out == Set(
      ("A", "00:00", 11.0, true),  // intra-minute last observation
      ("A", "00:01", 11.0, false), // gap: carried forward
      ("A", "00:02", 11.0, false),
      ("A", "00:03", 14.0, true),
      ("B", "00:07", 7.0, true)    // span is per-key: B has one bin
    ))
  }

  test("locf: null values are not observations") {
    val df = Seq(
      ("A", ts("2024-01-01 00:00:00"), 1L, Some(5.0)),
      ("A", ts("2024-01-01 00:01:30"), 2L, None), // null: minute 1 is a gap
      ("A", ts("2024-01-01 00:02:00"), 3L, Some(6.0))
    ).toDF("k", "t", "id", "v")
    val out = GapFill.locf(df, col("k"), "k", col("t"), col("v"), Seq(col("t"), col("id")))
      .orderBy("bin").select("value", "is_observed").as[(Double, Boolean)].collect().toSeq
    assert(out == Seq((5.0, true), (5.0, false), (6.0, true)))
  }
}
