package graft

import org.apache.spark.sql.functions._

import graft.functions.Ewma

class EwmaSpec extends SparkSpec {
  import spark.implicits._

  test("ewma expression matches the reference fold; null gap-carry semantics") {
    val got = Seq(
      Seq[java.lang.Double](1.0, 2.0, 3.0, 4.0),
      Seq[java.lang.Double](),
      Seq[java.lang.Double](5.0),
      Seq[java.lang.Double](null, 10.0, null, 20.0)
    ).toDF("xs").select(Ewma.column($"xs", 0.25).as("ys")).as[Seq[Option[Double]]].collect()
    def ref(xs: Seq[Option[Double]]): Seq[Option[Double]] = {
      var y: Option[Double] = None
      xs.map { x =>
        y = x match {
          case Some(v) => Some(y.fold(v)(p => 0.25 * v + 0.75 * p))
          case None => y
        }
        y
      }
    }
    val inputs = Seq(
      Seq(Some(1.0), Some(2.0), Some(3.0), Some(4.0)),
      Seq.empty[Option[Double]],
      Seq(Some(5.0)),
      Seq(None, Some(10.0), None, Some(20.0)))
    inputs.zip(got).foreach { case (in, out) =>
      assert(out == ref(in), s"mismatch for $in: got $out")
    }
  }

  test("q82 per-user EWMA: one row per event, first ewma equals first value") {
    val out = SparkEntry.queries("q82_ewma")(spark, sf())
    val ev = graft.core.Tables.events(spark, sf())
    assert(out.count() == ev.count(), "EWMA must emit one row per event")
    // per user, the earliest event (by the query's ts,event_id order)
    // seeds the recursion: its ewma == its value
    val firstIds = ev.groupBy($"user_id")
      .agg(min(struct($"ts", $"event_id")).as("m"))
      .select($"user_id", $"m.event_id".as("event_id"))
    val first = out.join(firstIds, Seq("user_id", "event_id"))
    assert(first.filter($"ewma" =!= $"value").count() == 0,
      "seed element must equal its own value")
  }
}
