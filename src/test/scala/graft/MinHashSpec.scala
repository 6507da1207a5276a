package graft

import org.apache.spark.sql.functions._

import graft.functions.{NearDup, TextAnalysis}

/** Scale-shape and recall guarantees for the MinHash+LSH pipeline. */
class MinHashSpec extends SparkSpec {
  import spark.implicits._

  // deterministic word soup: doc i draws 40 words from a 2000-word vocab
  private def word(i: Long): String = s"w${(i * 2654435761L) % 2000}"
  private def planted(): (org.apache.spark.sql.DataFrame, Set[(Long, Long)]) = {
    // 100 base docs; for the first 20, a near-dup twin sharing 38/40
    // words (jaccard ~ 38/42 = 0.905)
    val base = (0L until 100L).map { d =>
      d -> (0 until 40).map(j => word(d * 100 + j)).distinct.mkString(" ")
    }
    val twins = (0L until 20L).map { d =>
      val words = (0 until 38).map(j => word(d * 100 + j)) ++ Seq(s"x$d", s"y$d")
      (1000L + d) -> words.distinct.mkString(" ")
    }
    val df = (base ++ twins).toDF("doc_id", "text")
    val expectPairs = (0L until 20L).map(d => (d, 1000L + d)).toSet
    (df, expectPairs)
  }

  test("BandIndex.removeIds: erased docs stop suppressing dups, leave disk, index == fresh build") {
    val bi = graft.functions.BandIndex
    val dir = java.nio.file.Files.createTempDirectory("graft_bandrm").toString
    val shared = (1 to 30).map(i => s"w$i").mkString(" ")
    val corpus = Seq(
      (1L, shared),                                       // the doc to erase
      (2L, (1 to 30).map(i => s"z$i").mkString(" "))).toDF("doc_id", "text")
    bi.build(corpus, "doc_id", TextAnalysis.wordTokens(col("text")), dir)
    val probe = Seq((100L, shared + " extra")).toDF("doc_id", "text") // j = 30/31
    val before = bi.probePairs(spark, dir, probe, "doc_id", TextAnalysis.wordTokens(col("text")))
    assert(before.select("corpus_id").as[Long].collect().toSeq == Seq(1L))
    before.unpersist()
    bi.removeIds(spark, dir, Seq(1L))
    val after = bi.probePairs(spark, dir, probe, "doc_id", TextAnalysis.wordTokens(col("text")))
    assert(after.isEmpty, "erased doc still surfaces as a corpus candidate")
    after.unpersist()
    // data erasure, not a tombstone: no row with id 1 in either table
    assert(spark.read.parquet(s"$dir/toks").filter($"id" === 1L).isEmpty)
    assert(spark.read.parquet(s"$dir/bands").filter($"id" === 1L).isEmpty)
    // the rewritten index is EXACTLY a fresh build without the doc
    val fresh = java.nio.file.Files.createTempDirectory("graft_bandrm2").toString
    bi.build(corpus.filter($"doc_id" =!= 1L), "doc_id", TextAnalysis.wordTokens(col("text")), fresh)
    for (sub <- Seq("toks", "bands")) {
      val a = spark.read.parquet(s"$dir/$sub")
      val b = spark.read.parquet(s"$fresh/$sub")
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty, s"$sub differs from fresh build")
    }
  }

  test("planted near-dups at j>=0.9: recall >= 95%") {
    val (df, want) = planted()
    val got = NearDup.minHashPairs(df, "doc_id", TextAnalysis.wordTokens(col("text")),
      numHashes = 32, bands = 8, threshold = 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val hit = want.count(got.contains)
    assert(hit >= math.ceil(want.size * 0.95).toInt, s"recall $hit/${want.size}")
  }

  test("no token array ever rides in an exchange key") {
    val (df, _) = planted()
    val plan = NearDup.minHashPairs(df, "doc_id", TextAnalysis.wordTokens(col("text")))
      .queryExecution.executedPlan.toString
    // grouping/join keys must be fingerprints or int ids; the token
    // array column may appear in exchanges only as DATA, never as the
    // partitioning key
    val partitionings = "hashpartitioning\\(([^)]*)\\)".r.findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(partitionings.nonEmpty)
    partitionings.foreach { keys =>
      assert(!keys.contains("toks"), s"token array in exchange key: $keys\n$plan")
    }
  }

  test("oversized band buckets are dropped (stop-word band cap)") {
    // 50 docs all sharing the same 30-word core (one degenerate band
    // bucket), pairwise jaccard 30/34 ~ 0.88 < 1.0 so they are NOT
    // exact dups; with cap < 50 the bucket is dropped and no pairs
    // survive, with the default cap they all pair
    val core = (0 until 30).map(j => word(j)).distinct.mkString(" ")
    val df = (0L until 50L).map(d => d -> (core + s" a$d b$d")).toDF("doc_id", "text")
    val toks = TextAnalysis.wordTokens(col("text"))
    val capped = NearDup.minHashPairs(df, "doc_id", toks, 32, 8, 0.8, maxBucketSize = 10).count()
    val uncapped = NearDup.minHashPairs(df, "doc_id", toks, 32, 8, 0.8).count()
    assert(capped == 0L, s"capped run still produced $capped pairs")
    assert(uncapped > 1000L, s"uncapped run produced only $uncapped pairs")
  }

  test("MinHashSigExpr is bitwise identical to the HOF formulation") {
    // random-length pre-hashed token arrays incl. empty and duplicate
    // tokens; the codegen'd one-pass signature must equal the
    // array(array_min(transform(...))) reference element-for-element
    val rows = (0L until 200L).map { d =>
      val n = (d % 17L).toInt // includes 0-length arrays
      d -> (0 until n).map(j => (d * 31L + j * 7L) % 13L).toArray // duplicates guaranteed
    }
    val df = rows.toDF("id", "raw")
      .withColumn("toks", transform(col("raw"), t => xxhash64(t)))
    val both = df.select(
      NearDup.minHashSignature(col("toks"), 16).as("fast"),
      NearDup.minHashSignatureHof(col("toks"), 16).as("ref"))
    assert(both.filter(not(col("fast") <=> col("ref"))).count() == 0L)
    // null input array → array of n nulls on both paths (array() over
    // null array_mins is non-null)
    val nulls = Seq(Tuple1(Option.empty[Array[Long]])).toDF("toks")
    val nb = nulls.select(
      NearDup.minHashSignature(col("toks"), 4).as("fast"),
      NearDup.minHashSignatureHof(col("toks"), 4).as("ref"))
    assert(nb.filter(not(col("fast") <=> col("ref"))).count() == 0L)
    assert(nb.filter(col("fast").isNull).count() == 0L)
  }

  test("identical sets still pair at jaccard 1.0 regardless of cap") {
    val df = Seq((1L, "same words here"), (2L, "same words here"), (3L, "other thing entirely"))
      .toDF("doc_id", "text")
    val got = NearDup.minHashPairs(df, "doc_id", TextAnalysis.wordTokens(col("text")),
      32, 8, 0.8, maxBucketSize = 1)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSet
    assert(got == Set((1L, 2L, 1.0)))
  }
}
