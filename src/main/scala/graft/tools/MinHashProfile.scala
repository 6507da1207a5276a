package graft.tools

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.{IntersectCount, NearDup, TextAnalysis}

/** Stage-by-stage timing of the MinHash pipeline at a given sf/params. */
object MinHashProfile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val numHashes = if (args.length > 1) args(1).toInt else 96
    val bands = if (args.length > 2) args(2).toInt else 24
    val rowsPerBand = numHashes / bands
    val spark = graft.core.GraftSession("minhash-profile", 32)
    val docs = Tables.documents(spark, dir)
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val t = docs.select(col("doc_id").as("id"),
      array_sort(transform(array_distinct(TextAnalysis.wordTokens(col("text"))), tk => xxhash64(tk))).as("toks"))
      .withColumn("fp1", xxhash64(col("toks")))
      .withColumn("fp2", xxhash64(lit(0x9e3779b9L), col("toks")))
    val sets = t.groupBy(col("fp1"), col("fp2"))
      .agg(min(col("id")).as("set_id"), sort_array(collect_list(col("id"))).as("ids"),
        first(col("toks")).as("toks"))
      .select(col("set_id"), col("ids"), col("toks")).cache()
    timed("sets")(println("  n_sets=" + sets.count()))
    val sigs = sets.select(col("set_id"), size(col("toks")).as("sz"), col("toks"))
      .withColumn("sig", NearDup.minHashSignature(col("toks"), numHashes))
    val banded = sigs.select(
      col("set_id"), col("sz"),
      posexplode(array((0 until bands).map { b =>
        xxhash64(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand))
      }: _*))
    ).select(col("set_id"), col("sz"), col("pos").as("band"), col("col").as("band_key")).cache()
    timed("banded (sig compute)")(println("  n_banded=" + banded.count()))
    val preDistinct = banded.select(col("band"), col("band_key"), col("set_id").as("set_a"), col("sz").as("sz_a"))
      .join(banded.select(col("band"), col("band_key"), col("set_id").as("set_b"), col("sz").as("sz_b")), Seq("band", "band_key"))
      .filter(col("set_a") < col("set_b")
        && col("sz_a") >= col("sz_b") * 0.8 && col("sz_b") >= col("sz_a") * 0.8)
      .select(col("set_a"), col("set_b"))
    timed("pre-distinct candidate rows")(println("  n_pre=" + preDistinct.count()))
    val candidates = preDistinct.distinct().cache()
    timed("distinct")(println("  n_cand=" + candidates.count()))
    val toksBySet = sets.select(col("set_id"), col("toks"))
    val verified = candidates
      .join(toksBySet.select(col("set_id").as("set_a"), col("toks").as("toks_a")), Seq("set_a"))
      .join(toksBySet.select(col("set_id").as("set_b"), col("toks").as("toks_b")), Seq("set_b"))
      .withColumn("__i", IntersectCount.column(col("toks_a"), col("toks_b")).cast("double"))
      .withColumn("jaccard", col("__i") / (size(col("toks_a")) + size(col("toks_b")) - col("__i")))
      .filter(col("jaccard") >= 0.8)
      .select(col("set_a"), col("set_b"), col("jaccard"))
    timed("verify")(println("  n_verified=" + verified.count()))
    spark.stop()
  }
}
