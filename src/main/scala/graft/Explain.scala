package graft

/** Plan-inspection utility: prints the formatted physical plan of the
  * named queries (default: the bench headliners) against a testdata
  * dir. Used to verify pushdown / broadcast / whole-stage-codegen
  * shape after every operator change.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = core.GraftSession("explain", 8)
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q02_filter_project", "q13_tpch_q1", "q14_join_agg", "q09_windowed_join")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
