package graft.tools

import org.apache.spark.sql.functions._

/** One-off q148 diagnosis on the salted 10x replica: stage-level cost
  * of the pair stream vs the size joins. */
object ContainProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession("containprobe", 32)
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/tmp/graft_sfx10-salted")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val d = graft.core.Tables.documents(spark, dir)
    val pairs = t("minHashPairs.construct")(graft.functions.NearDup.minHashPairs(d, "doc_id",
      graft.functions.TextAnalysis.wordTokens(col("text")),
      numHashes = 128, bands = 32, threshold = 0.8))
    val n = t("pairs.count")(pairs.count())
    println(s"[probe] n_pairs=$n")
    val sizes = d.select(col("doc_id"),
      size(array_distinct(graft.functions.TextAnalysis.wordTokens(col("text")))).cast("long").as("n"))
    val joined = pairs
      .join(sizes.select(col("doc_id").as("id_a"), col("n").as("n_a")), Seq("id_a"))
      .join(sizes.select(col("doc_id").as("id_b"), col("n").as("n_b")), Seq("id_b"))
    joined.explain("formatted")
    t("joined.noop")(joined.write.format("noop").mode("overwrite").save())
    t("sparkentry.q148.noop") {
      graft.SparkEntry.queries("q148_containment")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    t("sparkentry.q149.noop") {
      graft.SparkEntry.queries("q149_leakage_matrix")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
