// quick single-query timing
package graft

object QBench {
  def main(args: Array[String]): Unit = {
    val spark = core.GraftSession("qbench", 32)
    val name = args(0); val dir = args(1)
    val fn = SparkEntry.queries(name)
    val t0 = System.nanoTime()
    val n = fn(spark, dir).count()
    println(f"[qbench] $name rows=$n time=${(System.nanoTime()-t0)/1e9}%.2f s")
    spark.stop()
  }
}
