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
    // phase timing at q104's operating point (2 passes; read the 2nd —
    // the 1st absorbs codegen/broadcast warmup)
    for (pass <- 1 to 2) {
      def t[A](label: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        println(f"PQTIME pass$pass $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
      }
      val sub = ProductQuant.subspaces(e, "vec_id", "embedding", 16, 64)
      val cells = t("gridCells") { val c = ProductQuant.gridCells(sub, 4, 4); c.write.format("noop").mode("overwrite").save(); c }
      val book = t("train") { ProductQuant.trainCodebooksGrid(sub, 4, 4, 1) }
      t("encode") { ProductQuant.encode(sub, book).write.format("noop").mode("overwrite").save() }
      t("adc+rerank") {
        ProductQuant.pqRerankTopK(q, e, "vec_id", "embedding", 16, 64, 4, 1, 25, 5)
          .write.format("noop").mode("overwrite").save()
      }
    }
    // measured on-disk compression at q104's operating point: raw
    // embedding column vs byte-packed codes (+ the shared codebook)
    locally {
      val sub = ProductQuant.subspaces(e, "vec_id", "embedding", 16, 64)
      val book = ProductQuant.trainCodebooksGrid(sub, 4, 4, 1)
      val codes = ProductQuant.encode(sub, book)
        .groupBy("id").agg(collect_list(struct(col("m"), col("code"))).as("mc"))
        .select(col("id"), expr("transform(array_sort(mc), x -> cast(x.code AS tinyint))").as("codes"))
      val dir = java.nio.file.Files.createTempDirectory("graft_pq_size").toString
      e.select("vec_id", "embedding").write.mode("overwrite").parquet(s"$dir/raw")
      codes.write.mode("overwrite").parquet(s"$dir/codes")
      book.write.mode("overwrite").parquet(s"$dir/book")
      def bytes(p: String): Long =
        java.nio.file.Files.walk(java.nio.file.Paths.get(p)).toArray.map(_.asInstanceOf[java.nio.file.Path])
          .filter(f => java.nio.file.Files.isRegularFile(f) && f.getFileName.toString.endsWith(".parquet"))
          .map(java.nio.file.Files.size).sum
      val (r, c, b) = (bytes(s"$dir/raw"), bytes(s"$dir/codes"), bytes(s"$dir/book"))
      println(f"PQSIZE raw=$r codes=$c book=$b ratio=${r.toDouble / (c + b)}%.1f vectors=${e.count()}")
    }
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
