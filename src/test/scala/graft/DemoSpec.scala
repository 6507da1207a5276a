package graft

import java.nio.file.Files

/** The end-to-end chain (produce -> wire -> ingest -> stream ->
  * bucket store -> windowed metrics -> warehouse merge) must run in
  * one process with the streaming result bit-equal to batch — Demo.run
  * throws on any divergence. */
class DemoSpec extends SparkSpec {
  test("Demo: full pipeline, stream==batch bitwise, idempotent merge") {
    val dir = Files.createTempDirectory("graft_demo_spec").toString
    val (nMetrics, nSnap) = Demo.run(spark, dir, nPerSymbol = 250)
    assert(nMetrics > 0 && nSnap == nMetrics)
  }
}
