package graft.tools
import org.apache.spark.sql.functions._
object T158 {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession("t158", 32)
    spark.sparkContext.setLogLevel("WARN")
    def time(l: String)(f: => Unit) = { val t=System.nanoTime(); f; println(f"[t158] $l ${(System.nanoTime()-t)/1e9}%.2f s") }
    // background sampler: dump hottest stack snapshot at 30s and 60s
    new Thread(() => {
      for (delay <- Seq(30000, 60000)) {
        Thread.sleep(delay)
        val stacks = Thread.getAllStackTraces
        import scala.jdk.CollectionConverters._
        val hot = stacks.asScala.toSeq.filter(_._1.getName.startsWith("Executor task"))
          .take(3).map { case (t, st) => t.getName + ":\n    " + st.take(8).mkString("\n    ") }
        println(s"[t158] ---- sample at ${delay}ms ----\n" + hot.mkString("\n"))
      }
    }) { setDaemon(true) }.start()
    def q = graft.SparkEntry.queries("q126_vwap")(spark, "/tmp/graft_sfx100")
    time("q126-cold") { q.write.format("noop").mode("overwrite").save() }
    spark.stop()
  }
}
