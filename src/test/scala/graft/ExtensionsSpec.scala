package graft

import org.apache.spark.sql.SparkSession

/** spark.sql.extensions=graft.GraftExtensions must install the custom
  * expressions into a session built with that config — the cluster-
  * wide deployment path (thriftserver/connect sessions included). */
class ExtensionsSpec extends SparkSpec {
  test("GraftExtensions installs rolling_hash/dot_product/intersect_count in SQL") {
    val orig = spark // force shared session + context to exist
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // withExtensions is the same installation hook the static
      // spark.sql.extensions conf drives; the conf itself can't be
      // tested here because the shared test SparkContext already
      // exists and static confs are fixed at context start
      val s2 = SparkSession.builder().master("local[2]").appName("graft-ext-test")
        .withExtensions(new GraftExtensions())
        .getOrCreate()
      val r = s2.sql(
        """SELECT rolling_hash('abc') AS h,
          |       dot_product(array(1d, 2d), array(3d, 4d)) AS d,
          |       intersect_count(array(1L, 2L, 3L), array(2L, 3L, 9L)) AS i,
          |       cdc_chunks(repeat('xyz abc ', 40), 16, 64, 32, 128) AS c,
          |       minhash_sig(array(xxhash64('a'), xxhash64('b')), 4) AS ms,
          |       winnow_fps('the quick brown fox jumps over it') AS wf,
          |       ewma(array(1d, 2d, 3d), 0.5) AS ew,
          |       interleave_bits(3L, 0L) AS zb,
          |       json_long_field('{"k": 42}', 'k') AS jf""".stripMargin).head()
      val want = graft.functions.RollingHash.eval(
        org.apache.spark.unsafe.types.UTF8String.fromString("abc"))
      assert(r.getLong(0) == want)
      assert(r.getDouble(1) == 11.0)
      assert(r.getInt(2) == 2)
      assert(r.getSeq[String](3).mkString == "xyz abc " * 40)
      assert(r.getSeq[Long](4).length == 4)
      assert(r.getSeq[Long](5).nonEmpty)
      assert(r.getSeq[Double](6) == Seq(1.0, 1.5, 2.25))
      assert(r.getLong(7) == 5L)
      assert(r.getLong(8) == 42L)
      // simhash_agg: aggregate over one hash == that hash's bit pattern
      val agg = s2.sql(
        "SELECT simhash_agg(h) AS sh FROM (SELECT xxhash64('tok') AS h)").head()
      val sqlCtx = s2.sql("SELECT xxhash64('tok') AS h").head().getLong(0)
      assert(agg.getLong(0) == sqlCtx)
    } finally {
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
  }
}
