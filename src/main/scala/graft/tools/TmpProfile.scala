package graft.tools

import org.apache.spark.sql.functions._

/** Scratch micro-profiler (contents change per investigation). */
object TmpProfile {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession("tmp-profile", 32)
    val dir = "/root/testdata/sf0.1"
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-36s ${(System.nanoTime() - t0) / 1e9}%8.2f s  -> $r")
      r
    }
    val docs = graft.core.Tables.documents(spark, dir)
    docs.count()
    val sim = graft.functions.NearDup.simHash(docs, "doc_id",
      graft.functions.TextAnalysis.wordTokens(col("text")))
    t("simhash build (64-way agg)")(sim.write.format("noop").mode("overwrite").save())
    t("simhash build again")(sim.write.format("noop").mode("overwrite").save())
    val simP = sim.persist()
    simP.count()
    val pairs = graft.functions.NearDup.simHashPairs(simP, maxDist = 3)
    t("pairs from cached sim")(pairs.write.format("noop").mode("overwrite").save())
    t("pairs again")(pairs.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
