// quick single-query timing, canary-stamped (one query per JVM — the
// round-14 Next #1 adjudication harness for quiet-bench outliers)
package graft

object QBench {
  def main(args: Array[String]): Unit = {
    val spark = core.GraftSession("qbench", 32)
    val name = args(0); val dir = args(1)
    // optional third arg: iteration count (default 3). The r15
    // adjudication's >=1 s members settle in 3 runs; sub-second
    // queries are still descending the JIT curve at run3 (r16
    // q257: 11.1 -> 2.0 -> 1.3 s), so their honest isolated floor
    // needs a longer tail — pass 10.
    val iters = args.lift(2).map(_.toInt).getOrElse(3)
    val fn = SparkEntry.queries(name)
    // host calibration BEFORE and AFTER, same as Bench/ScaleProbe —
    // a slow-clock window shows up in the stamp, not as a mystery
    println("[qbench] " + HostCanary.line("QBENCH_HOST_PRE",
      Runtime.getRuntime.availableProcessors))
    // run 1 includes JVM/scan warmup; runs 2-3 are steady state and
    // MIN is the reported figure (the Bench min-of-n discipline);
    // noop sink so pruning can't delete the measured work
    val times = (1 to iters).map { i =>
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[qbench] $name run$i time=$s%.2f s")
      s
    }
    println("[qbench] " + HostCanary.line("QBENCH_HOST_POST",
      Runtime.getRuntime.availableProcessors))
    println(f"[qbench] $name min_steady=${times.drop(1).min}%.2f s")
    spark.stop()
  }
}
