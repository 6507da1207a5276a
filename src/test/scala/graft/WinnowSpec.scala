package graft

import org.apache.spark.sql.functions._

import graft.functions.{RollingHash, Winnow}

class WinnowSpec extends SparkSpec {
  import spark.implicits._

  /** Reference winnowing: per-position gram fold + window min +
    * distinct, written compositionally so the one-pass expression is
    * checked against the textbook definition. */
  private def ref(s: String, g: Int = 8, w: Int = 4): Seq[Long] = {
    val bytes = s.getBytes("UTF-8")
    val grams = bytes.sliding(g).filter(_.length == g)
      .map(_.foldLeft(0L)((h, b) => (h * RollingHash.Base + (b & 0xff)) % RollingHash.Mod))
      .toArray
    if (grams.isEmpty) Seq.empty
    else if (grams.length < w) Seq(grams.min)
    else grams.sliding(w).map(_.min).toSeq.distinct
  }

  test("winnow expression matches the compositional reference (incl. utf-8 and degenerates)") {
    val cases = Seq(
      "",                       // no bytes
      "short",                  // < 8 bytes -> no grams
      "exactly8",               // one gram, fewer than window -> global min
      "0123456789",             // 3 grams < window=4 -> global min
      "01234567890",            // exactly window grams -> one window
      "the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaaaaaaaaaaaa", // all grams identical -> 1 fingerprint
      "héllo wörld — ünïcode béyond ascii bytes" // multibyte UTF-8
    )
    val got = cases.toDF("s")
      .select(Winnow.column($"s").as("fps"))
      .as[Seq[Long]].collect()
    cases.zip(got).foreach { case (s, fps) =>
      assert(fps.sorted == ref(s).sorted, s"mismatch for '$s'")
    }
  }

  test("shared substring of gram+window-1 bytes guarantees a shared fingerprint at any offset") {
    val shared = "GUARANTEED-SAMPLE" // 17 bytes > 8+4-1 = 11
    val a = s"left padding text then $shared and trailing stuff"
    val b = s"completely different preamble $shared!"
    val c = "no overlap with the marker at all, different content"
    val fps = Seq((1L, a), (2L, b), (3L, c)).toDF("id", "s")
      .select($"id", explode(Winnow.column($"s")).as("fp"))
      .collect().groupBy(_.getLong(0)).map { case (k, v) => k -> v.map(_.getLong(1)).toSet }
    assert((fps(1L) & fps(2L)).nonEmpty, "docs sharing a long substring must share a fingerprint")
    assert((fps(1L) & fps(3L)).isEmpty || (fps(2L) & fps(3L)).isEmpty,
      "unrelated doc should not collide with both")
  }

  test("q73 surfaces cross-doc repeated fingerprints on the documents table") {
    val out = SparkEntry.queries("q73_winnow_fps")(spark, sf())
    assert(out.columns.toSeq == Seq("fp", "n_docs", "first_doc"))
    assert(out.count() > 0)
    assert(out.filter($"n_docs" <= 1).count() == 0)
  }
}
