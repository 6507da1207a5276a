package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Zero-arg listener injectable via -Dspark.extraListeners= into ANY
  * main (round-17 harness bisection): echoes stages whose task count
  * is small but whose executor time is large — the signature of the
  * AQE-coalesced CPU-bound stage under investigation. */
class StageEcho extends SparkListener {
  override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
    val m = sc.stageInfo.taskMetrics
    if (m != null && m.executorRunTime > 2000) {
      println(f"[echo] stage=${sc.stageInfo.stageId} tasks=${sc.stageInfo.numTasks} " +
        f"exec=${m.executorRunTime / 1e3}%.1f s wall=${(for {
          s <- sc.stageInfo.submissionTime; c <- sc.stageInfo.completionTime
        } yield (c - s) / 1e3).getOrElse(-1.0)}%.1f s")
      sc.stageInfo.rddInfos.sortBy(_.id).foreach(r =>
        println(s"[echo]     rdd ${r.id} ${r.name} ${r.scope.map(_.name).getOrElse("")}"))
    }
  }
}
