package graft.tools

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.{NearDup, TextAnalysis}

/** Diagnostic: does minHashPairs at (numHashes, bands) reproduce the
  * exact all-pairs Jaccard output on this corpus? Prints missing /
  * spurious pair counts — the decision input for giving q22 a strict
  * equality oracle. */
object LshRecallCheck {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val numHashes = if (args.length > 1) args(1).toInt else 64
    val bands = if (args.length > 2) args(2).toInt else 16
    val spark = graft.core.GraftSession("lsh-check", 16)
    val docs = Tables.documents(spark, dir)
    val toks = TextAnalysis.wordTokens(col("text"))
    val lsh = NearDup.minHashPairs(docs, "doc_id", toks, numHashes, bands, 0.8)
      .select(col("id_a"), col("id_b")).cache()
    val exact = NearDup.jaccardPairs(docs.withColumn("__b", lit(1)), "doc_id", toks, "__b", 0.8)
      .select(col("id_a"), col("id_b")).cache()
    val missing = exact.except(lsh).count()
    val spurious = lsh.except(exact).count()
    println(s"[lsh-check] nh=$numHashes bands=$bands exact=${exact.count()} lsh=${lsh.count()} missing=$missing spurious=$spurious")
    spark.stop()
  }
}
