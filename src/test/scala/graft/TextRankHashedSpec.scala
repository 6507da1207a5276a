package graft

/** q215 (hashed-term TextRank) must equal q211 (string-term) exactly
  * on the test corpora: the xxhash64 keys exist only inside the df
  * distinct and the position-window exchanges; the top-30 vocabulary,
  * co-occurrence matrix, and 40-iteration rank must be bitwise
  * identical. Also pins the boundary-tie contract: the hashed top-30
  * cut (df >= d30 candidates, then (df DESC, term ASC) take 30)
  * reproduces the string side's orderBy/limit exactly.
  */
class TextRankHashedSpec extends SparkSpec {

  for (sfd <- Seq("sf0.001", "sf0.01"))
    test(s"q215 hashed TextRank == q211 string TextRank bitwise at $sfd") {
      val dir = sf(sfd)
      val q211 = SparkEntry.queries("q211_textrank")(spark, dir)
      val q215 = SparkEntry.queries("q215_textrank_hashed")(spark, dir)
      assert(q211.count() == q215.count() && q211.count() > 0)
      assert(q211.exceptAll(q215).isEmpty && q215.exceptAll(q211).isEmpty,
        "hashed and string TextRank must agree bitwise (terms, df, out_cooc, textrank)")
    }
}
