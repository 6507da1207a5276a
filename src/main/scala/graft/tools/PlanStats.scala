package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Runtime plan-economy readout for one declared query (round-16
  * optimization round): runs the query through the noop sink and
  * prints stages, tasks, INPUT bytes (scan volume — the direct
  * witness of how many times the source parquet is actually read
  * after exchange reuse), shuffle bytes, and spill. The initial
  * `explain` plan shows duplicated subtrees wherever a DataFrame
  * fans out to several consumers; whether those duplicates COST
  * anything is a runtime question (AQE stage reuse), and this is the
  * tool that answers it.
  *
  *   runMain graft.tools.PlanStats <query> <sfDir> [iters]
  */
object PlanStats {
  def main(args: Array[String]): Unit = {
    val name = args(0); val dir = args(1)
    val iters = args.lift(2).map(_.toInt).getOrElse(2)
    // SPARK_GRAFT_CPUS: core-count override for the 8-vs-32 scaling
    // adjudications (round-17) — same env the Bench contract uses
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").flatMap(_.toIntOption).getOrElse(32)
    val spark = graft.core.GraftSession("planstats", cpus)
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val input = new AtomicLong
    val shufR = new AtomicLong
    val shufW = new AtomicLong
    val spill = new AtomicLong
    val stageLog = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null) {
          stages.incrementAndGet()
          tasks.addAndGet(sc.stageInfo.numTasks)
          input.addAndGet(m.inputMetrics.bytesRead)
          shufR.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          spill.addAndGet(m.diskBytesSpilled)
          val wall = (for {
            s <- sc.stageInfo.submissionTime; c <- sc.stageInfo.completionTime
          } yield c - s).getOrElse(-1L)
          stageLog.add(f"[stage] id=${sc.stageInfo.stageId}%-4d wall=${wall / 1e3}%6.2f s " +
            f"exec=${m.executorRunTime / 1e3}%7.2f s tasks=${sc.stageInfo.numTasks}%-3d " +
            sc.stageInfo.name.take(90))
        }
      }
    })
    val dumpStages = sys.env.contains("PLANSTATS_STAGES")
    val fn = graft.SparkEntry.queries(name)
    for (i <- 1 to iters) {
      stages.set(0); tasks.set(0); input.set(0)
      shufR.set(0); shufW.set(0); spill.set(0)
      val t0 = System.nanoTime()
      val df = fn(spark, dir)
      val tBuild = (System.nanoTime() - t0) / 1e9
      // force analysis + optimization + physical planning WITHOUT
      // executing — isolates driver-side Catalyst cost from cluster
      // work (large fan-out plans can be planning-bound at small SF)
      df.queryExecution.executedPlan
      val tPlan = (System.nanoTime() - t0) / 1e9 - tBuild
      df.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      // listener events drain asynchronously — settle before reading
      Thread.sleep(500)
      println(f"[planstats] $name run$i time=$dt%.2f s (build=$tBuild%.2f plan=$tPlan%.2f) stages=${stages.get} " +
        f"tasks=${tasks.get} input=${input.get / 1e6}%.1f MB " +
        f"shufW=${shufW.get / 1e6}%.1f MB shufR=${shufR.get / 1e6}%.1f MB " +
        f"spill=${spill.get / 1e6}%.1f MB")
      if (dumpStages && i == iters) {
        import scala.jdk.CollectionConverters._
        stageLog.asScala.foreach(println)
      }
      stageLog.clear()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
