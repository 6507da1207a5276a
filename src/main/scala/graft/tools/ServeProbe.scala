package graft.tools

import org.apache.spark.sql.functions._

import graft.streaming.StreamPipeline

/** Isolated serve-latency probe (round-14 Next #6): build the same
  * bounded closes store shape StreamBench maintains, run ONE named
  * serve N times in an otherwise-idle JVM, and print every latency
  * plus p50/max and the host canary — so a single-leg outlier (like
  * pettitt_serve's 9x max/p50 in STREAMBENCH_r14) can be adjudicated
  * host-vs-plan without re-running the 44-leg battery.
  *
  * Usage: runMain graft.tools.ServeProbe <serveName> [iters]
  */
object ServeProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("pettitt_serve")
    val iters = args.lift(1).map(_.toInt).getOrElse(20)
    val spark = graft.core.GraftSession("serve-probe", 16)
    import spark.implicits._

    // the StreamBench closes-store shape: |types| x |days| bounded
    // day grid (5 instruments x 20 days = the ~100-row store the
    // bench serves read)
    val dir = java.nio.file.Files.createTempDirectory("graft_serveprobe").toString
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 09:00:00")
    val ticks = (0 until 5).flatMap { k =>
      (0 until 20).map { d =>
        (s"type$k", new java.sql.Timestamp(t0.getTime + d * 86400000L),
          (k * 100 + d).toLong, 100.0 + k * 10 + d + 0.7 * ((d * (k + 3)) % 5))
      }
    }.toDF("event_type", "ts", "event_id", "value")
    graft.operators.DailyCloses.state(ticks)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/closes")

    val serves: Map[String, () => org.apache.spark.sql.DataFrame] = Map(
      "pettitt_serve" -> (() => StreamPipeline.pettittServe(spark, s"$dir/closes")),
      "kpss_serve" -> (() => StreamPipeline.kpssServe(spark, s"$dir/closes")),
      "dickey_fuller_serve" -> (() => StreamPipeline.dickeyFullerServe(spark, s"$dir/closes")),
      "von_neumann_serve" -> (() => StreamPipeline.vonNeumannServe(spark, s"$dir/closes")),
      "turning_points_serve" -> (() => StreamPipeline.turningPointsServe(spark, s"$dir/closes")),
      "mann_kendall_serve" -> (() => StreamPipeline.mannKendallServe(spark, s"$dir/closes")),
      // round-15 Next #4: the 4.7x max/p50 outlier of STREAMBENCH_r15
      "garch_serve" -> (() => StreamPipeline.garchServe(spark, s"$dir/closes")),
      "arch_serve" -> (() => StreamPipeline.archServe(spark, s"$dir/closes")))
    val f = serves(name)

    println("[serveprobe] " + graft.HostCanary.line("SERVE_HOST_PRE",
      Runtime.getRuntime.availableProcessors))
    // one untimed warmup (plan compile + codegen), then N timed
    f().collect()
    val lats = (1 to iters).map { i =>
      val t = System.nanoTime()
      f().collect()
      val ms = (System.nanoTime() - t) / 1e6
      println(f"[serveprobe] $name iter$i%02d ${ms}%.1f ms")
      ms
    }.sorted
    println("[serveprobe] " + graft.HostCanary.line("SERVE_HOST_POST",
      Runtime.getRuntime.availableProcessors))
    println(f"[serveprobe] $name p50=${lats(iters / 2)}%.1f ms max=${lats.last}%.1f ms " +
      f"max_over_p50=${lats.last / lats(iters / 2)}%.2f")
    spark.stop()
  }
}
