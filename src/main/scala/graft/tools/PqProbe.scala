package graft.tools

import org.apache.spark.sql.functions._

import graft.core.GraftSession
import graft.core.Tables
import graft.functions.{ProductQuant, Similarity}

/** One-off recall probe for PQ configs: candidate-recall of the ADC
  * shortlist at several sizes, for a few (nSub, kBits, rounds)
  * operating points. Diagnostic only — not part of any query path. */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = GraftSession("pq-probe", 8)
    val e = Tables.embeddings(spark, dir)
    val q = e.filter(col("vec_id") < 10)
    import spark.implicits._
    val exact = Similarity.cosineTopK(q, e, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    for ((nSub, nb, rounds) <- Seq((32, 4, 1), (32, 8, 1), (16, 2, 1), (16, 4, 1), (64, 16, 1), (32, 4, 2))) {
      for (short <- Seq(5, 25, 50)) {
        val got = ProductQuant.pqTopK(q, e, "vec_id", "embedding", nSub, 64, nb, rounds, short)
          .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
        val rec = (exact & got).size.toDouble / exact.size
        println(f"PQPROBE nSub=$nSub nbPerDim=$nb rounds=$rounds shortlist=$short recall=$rec%.3f")
      }
    }
    spark.stop()
  }
}
