// quick single-query timing
package graft

object QBench {
  def main(args: Array[String]): Unit = {
    val spark = core.GraftSession("qbench", 32)
    val name = args(0); val dir = args(1)
    val fn = SparkEntry.queries(name)
    // run twice: first includes JVM/scan warmup, second is the steady
    // state; noop sink so pruning can't delete the measured work
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"[qbench] $name run$i time=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
