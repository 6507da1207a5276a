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
}
