package graft.tools
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.{NearDup, TextAnalysis}
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession("plan-check", 8)
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val df = NearDup.minHashPairs(docs, "doc_id", TextAnalysis.wordTokens(col("text")), 96, 24, 0.8)
    val plan = df.queryExecution.executedPlan.toString
    val ex = plan.linesIterator.filter(l => l.contains("Exchange") || l.contains("Scan parquet")).toSeq
    ex.foreach(l => println("[plan] " + l.trim.take(150)))
    println("[plan] total Exchange lines: " + ex.count(l => l.contains("Exchange") && !l.contains("Reused")))
    println("[plan] ReusedExchange lines: " + ex.count(_.contains("ReusedExchange")))
    println("[plan] parquet scans: " + ex.count(_.contains("Scan parquet")))
    spark.stop()
  }
}
