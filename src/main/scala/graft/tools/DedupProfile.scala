package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Phase-level wall-clock profile of the dedup-on-ingest batch body
  * (StreamPipeline.dedupOnIngest) outside the streaming harness: same
  * data generator as StreamBench, same per-batch steps, a timer
  * around each — the evidence for WHERE a 10k-doc batch spends its
  * seconds. Diagnostic only; numbers go to stdout.
  *
  *   sbt "runMain graft.tools.DedupProfile [docsPerBatch] [batches]"
  */
object DedupProfile {
  def main(args: Array[String]): Unit = {
    val docRows = args.headOption.map(_.toInt).getOrElse(10000)
    val batches = args.drop(1).headOption.map(_.toInt).getOrElse(5)
    val spark = graft.core.GraftSession("dedupprofile", 32)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dedupprofile").toString
    val corpusPath = s"$dir/corpus"
    val ix = s"$dir/bandindex"

    def text(seed: Long): String =
      (0 until 30).map(j => s"w${((seed * 1000003L + j) * 2654435761L) % 50000}").mkString(" ")
    def genDocs(b: Int) =
      (0 until docRows).map { i =>
        val id = b.toLong * docRows + i
        val seed = if (i % 10 == 0 && b > 0) (b - 1).toLong * docRows + i else id
        (id, text(seed))
      }

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[dedup] $label%-28s ${(System.nanoTime() - t0) / 1e3}%10.0f us")
      r
    }

    for (b <- 0 until batches) {
      println(s"[dedup] ---- batch $b ----")
      val batch = genDocs(b).toDF("doc_id", "text")
        .repartition(32).persist(StorageLevel.MEMORY_AND_DISK)
      batch.count()
      val toks = graft.functions.TextAnalysis.wordTokens(col("text"))
      val (sets, setPairs) = t("minHashSetPairs") {
        val r = graft.functions.NearDup.minHashSetPairs(
          batch, "doc_id", toks, numHashes = 128, bands = 32, threshold = 0.8)
        r._2.count(); r
      }
      val assigned = t("dedupAssignmentBySets") {
        val a = graft.operators.ConnectedComponents.dedupAssignmentBySets(sets, setPairs)
          .persist(StorageLevel.MEMORY_AND_DISK)
        a.count(); a
      }
      val batchSurvivors = t("survivors semi-join") {
        val s = batch.join(
          assigned.filter(col("is_canonical")).select(col("doc_id")), Seq("doc_id"), "left_semi")
          .persist(StorageLevel.MEMORY_AND_DISK)
        s.count(); s
      }
      val haveIndex = graft.functions.BandIndex.exists(spark, ix)
      val dupsOpt = if (haveIndex) Some(t("BandIndex.probePairs") {
        graft.functions.BandIndex.probePairs(spark, ix, batchSurvivors, "doc_id", toks, threshold = 0.8)
      }) else None
      val novelOut = t("novel anti-join + persist") {
        val novel = dupsOpt match {
          case Some(dups) => batchSurvivors.join(
            dups.select(col("probe_id").as("doc_id")).distinct(), Seq("doc_id"), "left_anti")
          case None => batchSurvivors
        }
        val n = novel.withColumn("batch_id", lit(b.toLong)).persist(StorageLevel.MEMORY_AND_DISK)
        n.count(); n
      }
      t("corpus append (parquet)") {
        novelOut.write.mode("append").parquet(corpusPath)
      }
      t("BandIndex append/build") {
        if (haveIndex) graft.functions.BandIndex.append(novelOut, "doc_id", toks, ix)
        else graft.functions.BandIndex.build(novelOut, "doc_id", toks, ix)
      }
      dupsOpt.foreach(_.unpersist(blocking = false))
      sets.unpersist(blocking = false)
      setPairs.unpersist(blocking = false)
      assigned.unpersist(blocking = false)
      batchSurvivors.unpersist(blocking = false)
      novelOut.unpersist(blocking = false)
      batch.unpersist(blocking = false)
    }
    spark.stop()
  }
}
