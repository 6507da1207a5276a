package graft

import org.apache.spark.sql.functions.{col, lit}

import graft.operators.Checks
import graft.operators.Checks._

/** The declarative quality gate on PLANTED dirty data — q119 checks
  * the contract on the (clean) driver tables; this exercises every
  * violation path. */
class ChecksSpec extends SparkSpec {
  import spark.implicits._

  test("each check counts exactly its own violations") {
    val df = Seq(
      (Some(1L), "A", 10.0),   // clean
      (Some(1L), "A", 10.0),   // duplicate key
      (None,     "A", 10.0),   // null id
      (Some(2L), "",  10.0),   // empty flag
      (Some(3L), "X", 10.0),   // bad set value
      (Some(4L), "N", 99.0)    // out of range
    ).toDF("id", "flag", "qty")
    val rep = Checks.report(df, Seq(
      NotNull("id"), NotNull("flag"), Unique(Seq("id")),
      InRange("qty", 0.0, 50.0), InSet("flag", Seq("A", "N", "R"))))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(3))).toMap
    assert(rep("not_null(id)") == (1L, false))
    assert(rep("not_null(flag)") == (1L, false))
    // keys: 1 appears twice (1 extra), null key appears once (its own group)
    assert(rep("unique(id)") == (1L, false))
    assert(rep("in_range(qty,0.0,50.0)") == (1L, false))
    // '' is not in the set and not null -> counted; 'X' counted
    assert(rep("in_set(flag)") == (2L, false))
  }

  test("a clean frame passes everything") {
    val df = Seq((1L, "A"), (2L, "N")).toDF("id", "flag")
    val rep = Checks.report(df, Seq(NotNull("id"), Unique(Seq("id")), InSet("flag", Seq("A", "N"))))
    assert(rep.filter(!$"pass").count() == 0)
    assert(rep.count() == 3)
  }

  // a symmetric series around 100: mean 100, median 100, sd ~ fixed
  private def series(scaleDev: Double, shift: Double) =
    spark.range(0, 2100).select(
      (lit(100.0) + (col("id") % 21 - 10).cast("double") * scaleDev + lit(shift)).as("v"))

  test("drift checks: an unchanged distribution passes against its own snapshot") {
    val df = series(1.0, 0.0)
    val checks = Checks.driftChecks(Checks.snapshot(df, Seq("v")), tol = 0.05)
    assert(checks.size == 3)
    val rep = Checks.report(df, checks)
    assert(rep.count() == 3 && rep.filter(!$"pass").count() == 0,
      "no-change frame must pass mean/sd/median drift")
  }

  test("drift checks flag each statistic independently") {
    val checks = Checks.driftChecks(Checks.snapshot(series(1.0, 0.0), Seq("v")), tol = 0.05)
    def verdicts(df: org.apache.spark.sql.DataFrame) =
      Checks.report(df, checks).collect()
        .map(r => r.getString(0) -> r.getBoolean(3)).toMap
    // +50 shift: mean and median drift, deviations unchanged -> sd passes
    val shifted = verdicts(series(1.0, 50.0))
    assert(!shifted("mean_within(v)") && !shifted("quantile_within(v,0.5)")
      && shifted("stddev_within(v)"), s"shift: $shifted")
    // 3x deviations around the same center: ONLY sd drifts
    val widened = verdicts(series(3.0, 0.0))
    assert(widened("mean_within(v)") && widened("quantile_within(v,0.5)")
      && !widened("stddev_within(v)"), s"widen: $widened")
    // a wiggle inside tolerance passes everything
    val wiggle = verdicts(series(1.02, 0.5))
    assert(wiggle.values.forall(identity), s"wiggle: $wiggle")
  }

  test("drift checks compose with row checks in one report") {
    val df = series(1.0, 0.0)
    val rep = Checks.report(df,
      Checks.driftChecks(Checks.snapshot(df, Seq("v")), tol = 0.05)
        :+ NotNull("v") :+ InRange("v", 0.0, 1000.0))
    assert(rep.count() == 5 && rep.filter(!$"pass").count() == 0)
  }
}
