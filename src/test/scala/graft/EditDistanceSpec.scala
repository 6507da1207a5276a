package graft

import org.apache.spark.sql.functions._

import graft.functions.NearDup

class EditDistanceSpec extends SparkSpec {
  import spark.implicits._

  test("editDistancePairs: blocked pairs, threshold, banded early-abandon semantics") {
    val docs = Seq(
      (1L, "the quick brown fox jumps", "en"),
      (2L, "the quick brown fox jumped", "en"), // dist 2 from doc 1
      (3L, "a completely different sentence here", "en"),
      (4L, "the quick brown fox jumps", "de")   // identical text, other block
    ).toDF("doc_id", "text", "lang")
    val got = NearDup.editDistancePairs(docs, "doc_id", col("text"),
      Seq(col("lang")), maxDist = 5)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 2L))) // 3 too far; 4 blocked away
  }

  test("editDistancePairs matches the SQL levenshtein function") {
    val docs = Seq(
      (1L, "abcdefgh", "x"), (2L, "abcdxfgh", "x"), (3L, "abcd", "x")
    ).toDF("doc_id", "text", "lang")
    val got = NearDup.editDistancePairs(docs, "doc_id", col("text"),
      Seq(col("lang")), maxDist = 10)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val want = Seq(
      ("abcdefgh", "abcdxfgh", (1L, 2L)), ("abcdefgh", "abcd", (1L, 3L)),
      ("abcdxfgh", "abcd", (2L, 3L))
    ).map { case (a, b, k) =>
      k -> docs.sparkSession.sql(s"SELECT levenshtein('$a', '$b')").as[Int].head().toLong
    }.toMap
    assert(got == want)
  }

  test("LSH-fronted fuzzy: planted near-dups recalled, dists exact, identical prefixes collapse") {
    val seed = new scala.util.Random(42)
    def randText(n: Int): String = Seq.fill(n)(('a' + seed.nextInt(26)).toChar).mkString
    val bases = (0 until 30).map(i => (i.toLong * 10, randText(80)))
    // plant: one 2-edit variant per base + two verbatim copies of base 0
    val variants = bases.map { case (id, t) =>
      (id + 1, t.updated(5, 'z').updated(40, 'q').mkString)
    }
    val copies = Seq((900L, bases(0)._2), (901L, bases(0)._2))
    val docs = (bases ++ variants ++ copies).toDF("doc_id", "text")
    val got = NearDup.editDistancePairsLsh(docs, "doc_id", col("text"), maxDist = 10)
    val gotPairs = got.as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    // every planted (base, variant) pair found with dist == 2
    bases.foreach { case (id, _) =>
      assert(gotPairs.get((id, id + 1)).contains(2L), s"missing planted pair $id")
    }
    // verbatim copies: dist-0 pairs among {0, 900, 901}
    assert(gotPairs((0L, 900L)) == 0L && gotPairs((0L, 901L)) == 0L && gotPairs((900L, 901L)) == 0L)
    // and copies also pair with base 0's variant at dist 2
    assert(gotPairs.get((1L, 900L)).contains(2L))
    // no false positives: verify stage is exact, so every emitted dist
    // must equal the true levenshtein and be <= maxDist
    val txt = (bases ++ variants ++ copies).toMap
    gotPairs.foreach { case ((a, b), d) =>
      val want = docs.sparkSession.sql(
        s"SELECT levenshtein('${txt(a)}', '${txt(b)}')").as[Int].head().toLong
      assert(d == want && d <= 10, s"pair ($a,$b) dist $d != $want")
    }
    got.unpersist()
  }

  test("set-granular clusters == doc-granular clusters over the expanded pair list") {
    // same planted corpus shape as above: 30 bases, a 2-edit variant
    // each, verbatim copies of base 0 — plus a CHAIN (a-b dist 4,
    // b-c dist 4, a-c dist 8) so transitivity is actually exercised
    val seed = new scala.util.Random(7)
    def randText(n: Int): String = Seq.fill(n)(('a' + seed.nextInt(26)).toChar).mkString
    val bases = (0 until 30).map(i => (i.toLong * 10, randText(80)))
    val variants = bases.map { case (id, t) =>
      (id + 1, t.updated(5, 'z').updated(40, 'q').mkString)
    }
    val chainA = randText(80)
    val chainB = chainA.updated(10, '0').updated(20, '1').updated(30, '2').updated(50, '3').mkString
    val chainC = chainB.updated(12, '4').updated(22, '5').updated(32, '6').updated(52, '7').mkString
    val extra = Seq((900L, bases(0)._2), (901L, bases(0)._2),
      (950L, chainA), (951L, chainB), (952L, chainC))
    val docs = (bases ++ variants ++ extra).toDF("doc_id", "text")
    // set-granular: CC over set pairs, docs inherit via membership
    val (sets, setPairs) = NearDup.editDistanceSetPairs(docs, "doc_id", col("text"), maxDist = 10)
    val bySets = graft.operators.ConnectedComponents.dedupAssignmentBySets(sets, setPairs)
    // doc-granular reference: CC over the fully expanded pair list
    val pairs = NearDup.editDistancePairsLsh(docs, "doc_id", col("text"), maxDist = 10)
    val byDocs = graft.operators.ConnectedComponents.dedupAssignment(
      docs, "doc_id", pairs.select(col("id_a"), col("id_b")))
    assert(bySets.exceptAll(byDocs).isEmpty && byDocs.exceptAll(bySets).isEmpty,
      "set-granular and doc-granular cluster assignments must agree exactly")
    // the chain collapsed to one cluster rooted at its min id
    val chain = bySets.filter(col("doc_id").isin(950L, 951L, 952L))
      .select("cluster_id").as[Long].collect().toSet
    assert(chain == Set(950L), s"chain cluster: $chain")
    sets.unpersist(); setPairs.unpersist(); pairs.unpersist()
  }
}
