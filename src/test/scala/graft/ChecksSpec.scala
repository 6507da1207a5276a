package graft

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
}
