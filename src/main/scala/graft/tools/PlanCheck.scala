package graft.tools
import org.apache.spark.sql.functions._
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession("plan-check", 8)
    val name = if (args.nonEmpty) args(0) else "q34_quota_sample"
    val plan = graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.01")
      .queryExecution.executedPlan.toString
    plan.linesIterator.filter(l => l.contains("WindowGroupLimit") || l.contains("Window") || l.contains("Exchange") || l.contains("Sort"))
      .foreach(l => println("[plan] " + l.trim.take(160)))
    spark.stop()
  }
}
