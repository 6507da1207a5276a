package graft

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("as-of join: latest right at or before left ts, null before first right") {
    val l = Seq((1, 10L, "a"), (1, 20L, "b"), (1, 8L, "early"), (2, 5L, "c"))
      .toDF("k", "t", "v")
    val r = Seq((1, 8L, 100.0), (1, 15L, 200.0), (3, 1L, 999.0))
      .toDF("k", "rt", "q")
    val got = AsOfJoin.asOf(l, r, Seq("k"), "t", "rt")
      .select($"k", $"t", $"v", $"q", $"rt")
      .collect().map(x => (x.getInt(0), x.getLong(1), x.getString(2),
        Option(x.get(3)), Option(x.get(4)))).toSet
    assert(got == Set(
      (1, 8L, "early", Some(100.0), Some(8L)), // ties: <= includes same ts
      (1, 10L, "a", Some(100.0), Some(8L)),
      (1, 20L, "b", Some(200.0), Some(15L)),
      (2, 5L, "c", None, None) // no right row for key 2
    ))
  }

  test("as-of join: atomic payload carry when a right value column is null") {
    val l = Seq((1, 30L)).toDF("k", "t")
    val r = Seq((1, 10L, Some(1.0), Some("x")), (1, 20L, None, Some("y")))
      .toDF("k", "rt", "q", "tag")
    val row = AsOfJoin.asOf(l, r, Seq("k"), "t", "rt").head()
    // the newer right row wins WHOLE, including its null q — not a blend
    assert(row.getAs[String]("tag") == "y" && row.isNullAt(row.fieldIndex("q")))
    assert(row.getAs[Long]("rt") == 20L)
  }

  test("bucketed as-of == plain as-of under a 90% hot key") {
    // HOT holds 90% of left rows and most quotes; sparse keys cross
    // empty buckets (carry-forward), COLD has no quotes at all (nulls)
    val left = spark.range(5000).select(
      when($"id" % 10 === 0, lit("RARE")).otherwise(lit("HOT")).as("k"),
      ($"id" * 7L % 40000L).as("t"),
      $"id".as("ev"))
      .unionByName(Seq(("COLD", 100L, -1L), ("COLD", 39999L, -2L)).toDF("k", "t", "ev"))
    val right = spark.range(300).select(
      when($"id" % 20 === 0, lit("RARE")).otherwise(lit("HOT")).as("k"),
      ($"id" * 131L % 40000L).as("rt"),
      ($"id" + 1000L).as("qid"))
      .groupBy("k", "rt").agg(max("qid").as("qid")) // unique per (k, rt)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select($"k", $"t", $"ev", $"qid", $"rt")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          Option(r.get(3)), Option(r.get(4)))).toSet
    val plain = canon(AsOfJoin.asOf(left, right, Seq("k"), "t", "rt"))
    // bucket width far smaller than the time range -> many buckets,
    // real carry traffic
    val bucketed = canon(AsOfJoin.asOfBucketed(left, right, Seq("k"), "t", "rt", bucketSec = 500L))
    assert(bucketed == plain)
    assert(plain.exists(_._4.isEmpty) && plain.exists(_._4.nonEmpty)) // both regimes exercised
  }
}
