package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, MergeUpsert, Ohlcv, SlidingWindows}

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val bars = Seq(
    // symbol, date, open, high, low, close, volume, seq
    ("A", "2024-01-01", 10.0, 15.0, 9.0, 12.0, 100L, 1),
    ("A", "2024-01-01", 12.0, 18.0, 11.0, 17.0, 200L, 2), // same key, later
    ("A", "2024-01-02", 17.0, 20.0, 16.0, 19.0, 150L, 1),
    ("B", "2024-01-01", 5.0, 6.0, 4.0, 5.5, 50L, 1)
  ).toDF("symbol", "date", "open", "high", "low", "close", "volume", "seq")

  test("dedup keepFirst / keepLast pin the survivor deterministically") {
    val first = Dedup.keepFirst(bars, Seq("symbol", "date"), Seq(col("seq")))
    val last = Dedup.keepLast(bars, Seq("symbol", "date"), Seq(col("seq")))
    assert(first.count() == 3 && last.count() == 3)
    assert(first.filter($"symbol" === "A" && $"date" === "2024-01-01").select("close").as[Double].head() == 12.0)
    assert(last.filter($"symbol" === "A" && $"date" === "2024-01-01").select("close").as[Double].head() == 17.0)
    // strict-parity mode keeps key cardinality too
    assert(Dedup.exact(bars, Seq("symbol", "date")).count() == 3)
  }

  test("OHLCV rollup: multi-row and degenerate cases") {
    val r = Ohlcv.rollup(bars, Seq(col("symbol"), col("date")), Seq("symbol", "date"),
      col("close"), Seq(col("seq")), Some(col("volume")))
    val a1 = r.filter($"symbol" === "A" && $"date" === "2024-01-01").head()
    assert(a1.getAs[Double]("open") == 12.0)   // first close by seq
    assert(a1.getAs[Double]("close") == 17.0)  // last close by seq
    assert(a1.getAs[Double]("high") == 17.0 && a1.getAs[Double]("low") == 12.0)
    assert(a1.getAs[Long]("volume") == 300L && a1.getAs[Long]("n") == 2L)
    // degenerate single-row key: all metrics collapse to the row
    val b = r.filter($"symbol" === "B").head()
    assert(b.getAs[Double]("open") == 5.5 && b.getAs[Double]("close") == 5.5 && b.getAs[Long]("n") == 1L)
  }

  test("OHLCV invariant: low <= open/close <= high; volume preserved") {
    val r = Ohlcv.rollup(bars, Seq(col("symbol"), col("date")), Seq("symbol", "date"),
      col("close"), Seq(col("seq")), Some(col("volume")))
    val bad = r.filter(!($"low" <= $"open" && $"open" <= $"high" && $"low" <= $"close" && $"close" <= $"high"))
    assert(bad.isEmpty)
    assert(r.agg(sum("volume")).as[Long].head() == bars.agg(sum("volume")).as[Long].head())
  }

  test("sliding windows: each event lands in exactly duration/slide windows") {
    val e = Seq(("X", java.sql.Timestamp.valueOf("2024-01-01 00:07:00"), 1.0))
      .toDF("sym", "ts", "v")
    val m = SlidingWindows.metrics(e, col("sym"), "sym", col("ts"), col("v"), "15 minutes", "5 minutes", "_x")
    assert(m.count() == 3) // 900/300
    val starts = m.select("window_start").as[Long].collect().sorted
    // all 3 windows are 300-aligned and contain the event
    val epoch = java.time.Instant.parse("2024-01-01T00:07:00Z").getEpochSecond
    starts.foreach { ws =>
      assert(ws % 300 == 0 && ws <= epoch && epoch < ws + 900)
    }
  }

  test("merge upsert: matched update, unmatched insert, carry-over, idempotency") {
    val target = Seq((1L, 10.0, "old"), (2L, 20.0, "old")).toDF("id", "v", "src")
    val source = Seq((2L, 99.0, "new"), (3L, 30.0, "new")).toDF("id", "v", "src")
    val merged = MergeUpsert.upsert(target, source, Seq("id")).orderBy("id").collect()
    assert(merged.map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq ==
      Seq((1L, 10.0, "old"), (2L, 99.0, "new"), (3L, 30.0, "new")))
    // idempotent under re-application of the same source
    val again = MergeUpsert.upsert(MergeUpsert.upsert(target, source, Seq("id")), source, Seq("id"))
    assert(again.orderBy("id").collect().toSeq == MergeUpsert.upsert(target, source, Seq("id")).orderBy("id").collect().toSeq)
  }

  test("schema evolution: added source column extends the table, target rows read null") {
    val target = Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v")
    val source = Seq((2L, 99.0, "eu"), (3L, 30.0, "us")).toDF("id", "v", "region")
    // strict upsert must refuse the drift outright
    intercept[IllegalArgumentException] { MergeUpsert.upsert(target, source, Seq("id")) }
    val out = MergeUpsert.upsertEvolve(target, source, Seq("id")).orderBy("id").collect()
    assert(out.map(r => (r.getLong(0), r.getDouble(1), Option(r.getString(2)))).toSeq ==
      Seq((1L, 10.0, None), (2L, 99.0, Some("eu")), (3L, 30.0, Some("us"))))
  }

  test("schema evolution: dropped source column keeps target values on match") {
    val target = Seq((1L, 10.0, "keep1"), (2L, 20.0, "keep2")).toDF("id", "v", "note")
    val source = Seq((2L, 99.0), (3L, 30.0)).toDF("id", "v")
    val out = MergeUpsert.upsertEvolve(target, source, Seq("id")).orderBy("id").collect()
    // matched row 2: v updates, note SURVIVES (absent column = no
    // opinion, not an overwrite-with-null); insert row 3: note null
    assert(out.map(r => (r.getLong(0), r.getDouble(1), Option(r.getString(2)))).toSeq ==
      Seq((1L, 10.0, Some("keep1")), (2L, 99.0, Some("keep2")), (3L, 30.0, None)))
  }

  test("schema evolution: retyped column fails fast, naming the drift") {
    val target = Seq((1L, 10.0)).toDF("id", "v")
    val source = Seq((1L, "oops")).toDF("id", "v")
    val e = intercept[IllegalArgumentException] {
      MergeUpsert.upsertEvolve(target, source, Seq("id"))
    }
    assert(e.getMessage.contains("v") && e.getMessage.contains("double") &&
      e.getMessage.contains("string"), s"drift not named: ${e.getMessage}")
  }

  test("merge upsert: null source values still overwrite on match") {
    val target = Seq((1L, Some(10.0), "old")).toDF("id", "v", "src")
    val source = Seq((1L, Option.empty[Double], "new")).toDF("id", "v", "src")
    val m = MergeUpsert.upsert(target, source, Seq("id")).head()
    assert(m.isNullAt(m.fieldIndex("v")) && m.getAs[String]("src") == "new")
  }

  test("semi/anti joins: plans use LeftSemi/LeftAnti and partition the probe side") {
    val dir = sf("sf0.001")
    val semi = graft.SparkEntry.queries("q42_semi_join")(spark, dir)
    val anti = graft.SparkEntry.queries("q43_anti_join")(spark, dir)
    assert(semi.queryExecution.executedPlan.toString.contains("LeftSemi"))
    assert(anti.queryExecution.executedPlan.toString.contains("LeftAnti"))
    // EXISTS + NOT EXISTS over the same predicate partition orders
    val total = graft.core.Tables.orders(spark, dir).count()
    val semiN = semi.agg(sum("order_count")).as[Long].head()
    val antiN = anti.agg(sum("order_count")).as[Long].head()
    assert(semiN + antiN == total && semiN > 0 && antiN > 0)
  }
}
