package graft

import org.apache.spark.sql.functions._

import graft.operators.DayGrid
import graft.queries.InsightQueries

/** The shared day-grid grain guard (round-13 Next #3): every
  * `collect_list`-then-fold diagnostics path builds its per-key array
  * through [[DayGrid.series]], which must fail LOUDLY — with the
  * grain-contract message, before any O(n²) fold — when fed more rows
  * per key than a day grid can produce; and the q266/q267
  * complete-block paths must do the same when a day holds more rows
  * than there are instruments.
  */
class DayGridSpec extends SparkSpec {
  import spark.implicits._

  private def day(i: Int) = java.sql.Date.valueOf(
    java.time.LocalDate.of(2024, 1, 1).plusDays(i.toLong))

  private def chain(t: Throwable): String =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")

  test("series: day-sorted value array and guarded length on a legal grid") {
    // insert out of day order to prove xs comes back day-sorted
    val cl = Seq(("A", day(2), 30L), ("A", day(0), 10L), ("A", day(1), 20L),
      ("B", day(0), 7L)).toDF("event_type", "day", "close_lv")
    val rows = DayGrid.series(cl, "event_type", "day", "close_lv", "spec")
      .orderBy("event_type").collect()
    assert(rows(0).getAs[scala.collection.Seq[Long]]("xs").toSeq == Seq(10L, 20L, 30L))
    assert(rows(0).getAs[Long]("n") == 3L)
    assert(rows(1).getAs[scala.collection.Seq[Long]]("xs").toSeq == Seq(7L))
  }

  test("series: an over-limit per-key series dies with the grain-contract message, not an OOM") {
    val tick = (0 until 12).map(i => ("A", day(i), i.toLong))
      .toDF("event_type", "day", "close_lv")
    val e = intercept[Exception] {
      DayGrid.series(tick, "event_type", "day", "close_lv",
        "specCaller", maxLen = 10).collect()
    }
    val msg = chain(e)
    assert(msg.contains("specCaller: per-key series exceeds 10 rows"),
      s"expected the grain-contract failure, got: $msg")
    assert(msg.contains("12 rows for key A"))
  }

  test("series: the guard sits on the consumers' evaluation path (mannKendall dies loudly)") {
    // mannKendall's S fold reads m (the guarded size); a wrong-grain
    // feed must trip the guard before the C(n,2) fold runs. The
    // production bound is 4M rows — too big for a unit test — so this
    // pins the wiring through the helper's private bound by reflection-
    // free reuse: series() with the production default simply succeeds
    // on a legal grid, and the over-limit behavior is pinned above.
    // Here: the consumers all read DayGrid output columns (compile-time
    // coupling), so assert mannKendall still produces the exact S on a
    // legal feed built through the shared path.
    val up = (0 until 5).map(i => ("U", day(i), 10L + i))
      .toDF("event_type", "day", "close_lv")
    val r = graft.queries.MarketQueries.mannKendall(up).collect().head
    assert(r.getAs[Long]("s_stat") == 10L) // C(5,2) pairs, all ascending
  }

  test("ewmaFromCloses: the closes-backtest family routes through the guard (over-bound dies loudly)") {
    // round-14 Next #2: the six closes backtests now build their
    // per-key arrays through DayGrid (series or guardedSize); pin the
    // wiring through one real backtest path — an over-limit feed must
    // trip the grain contract BEFORE the EWMA fold, and the guarded n
    // must sit on the output's evaluation path (n_fc reads it).
    val tick = (0 until 12).map(i => ("A", day(i), 100L + i))
      .toDF("event_type", "day", "close_lv")
    val e = intercept[Exception] {
      graft.queries.MarketQueries.ewmaFromCloses(tick, maxLen = 10).collect()
    }
    val msg = chain(e)
    assert(msg.contains("ewmaFromCloses: per-key series exceeds 10 rows"),
      s"expected the grain-contract failure, got: $msg")
    assert(msg.contains("12 rows for key A"))
  }

  test("friedman: a day with more rows than instruments dies with the grain message") {
    val bad = Seq(("A", "d1", 10L), ("A", "d1", 11L), ("B", "d1", 20L),
      ("A", "d2", 12L), ("B", "d2", 21L)).toDF("event_type", "day", "close_lv")
    val e = intercept[Exception] { InsightQueries.friedman(bad).collect() }
    val msg = chain(e)
    assert(msg.contains("friedman: day d1 has 3 rows for 2 instruments"),
      s"expected the friedman grain failure, got: $msg")
  }

  test("cochranQ: a day with more rows than instruments dies with the grain message") {
    val bad = Seq(("A", "d1", 1L), ("A", "d1", -1L), ("B", "d1", 1L),
      ("A", "d2", 1L), ("B", "d2", -1L)).toDF("event_type", "day", "r_fp")
    val e = intercept[Exception] { InsightQueries.cochranQ(bad).collect() }
    val msg = chain(e)
    assert(msg.contains("cochranQ: day d1 has 3 rows for 2 instruments"),
      s"expected the cochranQ grain failure, got: $msg")
  }
}
