package graft

import org.apache.spark.unsafe.types.UTF8String

import graft.functions.JaroWinkler
import graft.queries.GovernQueries

/** Governance + entity-resolution surface (q216–q220): Jaro-Winkler
  * pinned to the textbook/DuckDB vectors, designed-feed pins for the
  * RI audit and the SCD2 build, and real-feed invariants for the
  * blocked matcher and sorted-neighborhood blocking. */
class GovernSpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinkler.eval(UTF8String.fromString(a), UTF8String.fromString(b))

  test("JaroWinkler matches the textbook/DuckDB vectors exactly") {
    // values cross-checked bitwise against DuckDB's
    // jaro_winkler_similarity (20k random pairs + these vectors)
    assert(jw("martha", "marhta") == 0.9611111111111111)
    assert(jw("dixon", "dicksonx") == 0.8133333333333332)
    assert(jw("jellyfish", "smellyfish") == 0.8962962962962964)
    assert(jw("abc", "abc") == 1.0)
    // boost threshold: jaro = 0.6 <= 0.7, so the 4-char common prefix
    // must NOT add the Winkler bonus
    assert(jw("abcdxxxxxx", "abcdyyyyyy") == 0.6)
    // DuckDB's empty conventions (both-empty is 0.0, NOT textbook 1.0)
    assert(jw("", "") == 0.0)
    assert(jw("", "abc") == 0.0)
    assert(jw("a", "") == 0.0)
    // no matches at all
    assert(jw("aaa", "zzz") == 0.0)
  }

  test("JaroWinkler is symmetric and bounded on random strings") {
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      def w() = (1 to (1 + rnd.nextInt(12))).map(_ => ('a' + rnd.nextInt(6)).toChar).mkString
      val (a, b) = (w(), w())
      val x = jw(a, b)
      assert(x == jw(b, a), s"asymmetric on ($a, $b)")
      assert(x >= 0.0 && x <= 1.0, s"out of range on ($a, $b): $x")
      assert(jw(a, a) == 1.0)
    }
  }

  test("riAudit counts nulls, orphan rows and distinct orphan keys on a designed feed") {
    val child = Seq(Some(1L), Some(1L), Some(2L), None, Some(9L), Some(9L), Some(7L))
      .toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = GovernQueries.riAudit("child.fk->parent.pk", child, "fk", parent, "pk")
      .collect().head
    assert(r.getAs[String]("relation") == "child.fk->parent.pk")
    assert(r.getAs[Long]("n_rows") == 7L)
    assert(r.getAs[Long]("n_null") == 1L)
    assert(r.getAs[Long]("n_orphan_rows") == 3L) // 9,9,7
    assert(r.getAs[Long]("n_orphan_keys") == 2L) // {9,7}
  }

  test("q216 on the clean testdata: four relations, zero orphans, exact row counts") {
    val rows = GovernQueries.queries("q216_ri_orphans")(spark, sf()).collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_orphan_rows") == 0L, r.getAs[String]("relation"))
      assert(r.getAs[Long]("n_null") == 0L)
      assert(r.getAs[Long]("n_rows") > 0L)
    }
  }

  test("q217 risky flag is exactly n < 5 and k_anon is the min cell size") {
    val rows = GovernQueries.queries("q217_k_anonymity")(spark, sf()).collect()
    assert(rows.nonEmpty)
    val minN = rows.map(_.getAs[Long]("n")).min
    rows.foreach { r =>
      assert(r.getAs[Boolean]("risky") == (r.getAs[Long]("n") < 5L))
      assert(r.getAs[Long]("k_anon") == minN)
    }
  }

  test("entityMatch finds the planted spelling variant and respects the block contract") {
    val docs = Seq(
      (1L, "acme widget shipped fast"),
      (2L, "acme widgit shipped fast"), // 'widget' vs 'widgit'
      (3L, "zebra crossing")
    ).toDF("doc_id", "text")
    val got = GovernQueries.entityMatch(docs).collect()
    // the variant pair must be found ('acme widget' vs 'acme widgit' share block 'ac')
    assert(got.exists(r => r.getAs[String]("phrase_a") == "acme widget" &&
      r.getAs[String]("phrase_b") == "acme widgit"))
    got.foreach { r =>
      val (a, b) = (r.getAs[String]("phrase_a"), r.getAs[String]("phrase_b"))
      assert(a < b)
      assert(a.take(2) == b.take(2), "blocking violated")
      assert(r.getAs[Double]("jw_r6") >= 0.85)
      // the reported score is the quantized JaroWinkler of the pair
      val want = math.floor(jw(a, b) * 1e6 + 0.5) / 1e6
      assert(r.getAs[Double]("jw_r6") == want)
    }
  }

  test("sortedNeighborhood pairs identical-prefix docs within the rank window") {
    val docs = Seq(
      (10L, "alpha beta gamma delta"),
      (11L, "alpha beta gamma delta"),   // byte-identical twin
      (12L, "alpha beta gamma epsilon"), // same 16-char prefix, high overlap
      (13L, "omega psi chi")
    ).toDF("doc_id", "text")
    val got = GovernQueries.sortedNeighborhood(docs).collect()
    val pairs = got.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(pairs.contains((10L, 11L)))
    // the twins' jaccard is exactly 1.0
    val twin = got.find(r => r.getAs[Long]("doc_a") == 10L && r.getAs[Long]("doc_b") == 11L).get
    assert(twin.getAs[Double]("jac_r4") == 1.0)
    got.foreach { r =>
      val d = r.getAs[Long]("rank_dist")
      assert(d >= 1L && d <= 3L)
      assert(r.getAs[Double]("jac_r4") >= 0.5)
    }
    // the unrelated doc never pairs above threshold
    assert(!pairs.exists(p => p._1 == 13L || p._2 == 13L))
  }

  test("q245 hashed payload ≡ q219 string payload on the test corpus") {
    // the 8-byte md5-15 token keys must reproduce the string-set
    // answer row for row (collisions would be shared by the oracle,
    // but on real vocabulary they simply don't occur)
    def rows(name: String) =
      GovernQueries.queries(name)(spark, sf()).collect()
        .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
          r.getAs[Long]("rank_dist"), r.getAs[Long]("n_common"),
          r.getAs[Double]("jac_r4"))).toSet
    val s219 = rows("q219_sorted_neighborhood")
    val s245 = rows("q245_sorted_neighborhood_hashed")
    assert(s219.nonEmpty)
    assert(s245 == s219)
  }

  test("fkKeyGrid: one scan produces every FK's key-grain counts, nulls included") {
    val child = Seq(
      (Some(1L), Some(10L)), (Some(1L), Some(20L)),
      (Some(2L), None), (None, Some(10L))
    ).toDF("fk_a", "fk_b")
    val grid = GovernQueries.fkKeyGrid(child, Seq("fk_a", "fk_b"))
      .collect().map(r => (r.getAs[Int]("f"),
        Option(r.get(1)).map(_.asInstanceOf[Long]), r.getAs[Long]("n"))).toSet
    assert(grid == Set(
      (0, Some(1L), 2L), (0, Some(2L), 1L), (0, None, 1L),
      (1, Some(10L), 2L), (1, Some(20L), 1L), (1, None, 1L)))
    // keyed audit over a slice matches the raw-child audit
    val parent = Seq(1L).toDF("pk")
    val slice = GovernQueries.fkKeyGrid(child, Seq("fk_a", "fk_b"))
      .filter(org.apache.spark.sql.functions.col("f") === 0).drop("f")
    val keyed = GovernQueries.riAuditKeyed("r", slice, parent, "pk").collect().head
    val raw = GovernQueries.riAudit("r", child, "fk_a", parent, "pk").collect().head
    assert(keyed.toSeq == raw.toSeq)
  }

  test("scd2 compresses a designed change log into the right validity intervals") {
    val t0 = java.sql.Timestamp.valueOf("2024-03-01 00:00:00")
    def ts(h: Int) = new java.sql.Timestamp(t0.getTime + h * 3600000L)
    val ev = Seq(
      (1L, ts(0), 1L, "A"), (1L, ts(1), 2L, "A"), (1L, ts(2), 3L, "B"),
      (1L, ts(3), 4L, "B"), (1L, ts(4), 5L, "A"),
      (2L, ts(0), 6L, "X"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = GovernQueries.scd2(ev).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("version")) ->
        (r.getAs[String]("state"), r.getAs[java.sql.Timestamp]("valid_from"),
          Option(r.getAs[java.sql.Timestamp]("valid_to")), r.getAs[Boolean]("is_current")))
      .toMap
    assert(got.size == 4)
    assert(got((1L, 1L)) == (("A", ts(0), Some(ts(2)), false)))
    assert(got((1L, 2L)) == (("B", ts(2), Some(ts(4)), false)))
    assert(got((1L, 3L)) == (("A", ts(4), None, true)))
    assert(got((2L, 1L)) == (("X", ts(0), None, true)))
  }

  test("scd2 chunked plan is bitwise-identical to the direct two-window form") {
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    val ev = graft.core.Tables.events(spark, sf())
    assert(canon(GovernQueries.scd2(ev, chunked = true)) ==
      canon(GovernQueries.scd2(ev, chunked = false)))
    // dominant-key regime: one bot user carries half the feed — the
    // case the chunked plan exists for must also agree exactly
    val bot = ev.withColumn("user_id",
      org.apache.spark.sql.functions.when(
        org.apache.spark.sql.functions.col("event_id") % 2 === 0,
        org.apache.spark.sql.functions.lit(999999999L))
        .otherwise(org.apache.spark.sql.functions.col("user_id")))
    assert(canon(GovernQueries.scd2(bot, chunked = true)) ==
      canon(GovernQueries.scd2(bot, chunked = false)))
  }

  test("supplyTriangles finds the planted triangle above the p90 edge cut") {
    // suppliers 1,2,3 share 5 parts pairwise (counts 5,5,5); suppliers
    // 4-7 share one part (6 pairs at count 1). n = 9 pairs, p90 rank
    // k = ceil(8.1) = 9 -> threshold 5: edges are exactly the heavy
    // triangle, each member deg 2 / 1 triangle / clustering 1.0.
    val li = (for (sp <- 1 to 3; pt <- 101 to 105) yield (sp.toLong, pt.toLong)) ++
      (for (sp <- 4 to 7) yield (sp.toLong, 200L))
    val got = GovernQueries.supplyTriangles(li.toDF("l_suppkey", "l_partkey")).collect()
    assert(got.length == 3)
    got.foreach { r =>
      assert(Set(1L, 2L, 3L).contains(r.getAs[Long]("s_suppkey")))
      assert(r.getAs[Long]("degree") == 2L)
      assert(r.getAs[Long]("n_triangles") == 1L)
      assert(r.getAs[Double]("clust_r4") == 1.0)
    }
  }

  test("q226 triangle counts are consistent: sum of per-node counts is divisible by 3") {
    val rows = GovernQueries.queries("q226_supply_triangles")(spark, sf()).collect()
    assert(rows.nonEmpty)
    val tot = rows.map(_.getAs[Long]("n_triangles")).sum
    assert(tot % 3 == 0, s"each triangle must be counted at exactly its 3 members (sum $tot)")
    rows.foreach { r =>
      val d = r.getAs[Long]("degree")
      assert(r.getAs[Long]("n_triangles") <= d * (d - 1) / 2, "triangles bounded by wedge count")
    }
  }

  test("revenueGini: perfect equality is 0, a single whale with a zero member is 0.5") {
    val cust = Seq((1L, 1, "x"), (2L, 1, "x"), (3L, 2, "x"), (4L, 2, "x"))
      .toDF("c_custkey", "c_nationkey", "c_pad")
    // nation 1: both customers 100.00; nation 2: one whale, one zero-order customer
    val orders = Seq((10L, 1L, 100.0), (11L, 2L, 100.0), (12L, 3L, 100.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val got = GovernQueries.revenueGini(cust, orders).collect()
      .map(r => r.getAs[Int]("c_nationkey") ->
        (r.getAs[Long]("n_cust"), r.getAs[Double]("gini_r4"))).toMap
    assert(got(1) == ((2L, 0.0)))
    assert(got(2) == ((2L, 0.5)))
  }

  test("q228 gini is within [0, 1) and zero-revenue nations carry a null gini") {
    GovernQueries.queries("q228_revenue_gini")(spark, sf()).collect().foreach { r =>
      val g = r.getAs[Double]("gini_r4")
      if (!r.isNullAt(r.fieldIndex("gini_r4")))
        assert(g >= 0.0 && g < 1.0, s"gini out of range: $g")
    }
  }

  test("scd2 intervals tile each user's timeline: valid_to chains to the next valid_from") {
    val got = GovernQueries.queries("q220_scd2_build")(spark, sf()).collect()
      .groupBy(_.getAs[Long]("user_id"))
    got.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("version"))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[java.sql.Timestamp]("valid_to") ==
            b.getAs[java.sql.Timestamp]("valid_from"))
          assert(!a.getAs[Boolean]("is_current"))
        case _ =>
      }
      assert(sorted.last.getAs[Boolean]("is_current"))
      assert(sorted.last.get(sorted.last.fieldIndex("valid_to")) == null)
    }
  }
}
