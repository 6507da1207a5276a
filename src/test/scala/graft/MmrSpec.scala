package graft

import org.apache.spark.sql.functions._

import graft.functions.Similarity

/** Pins Similarity.mmrGreedy (the one-pass flatMapGroups kernel) to
  * the join/window formulation it replaced — bitwise on every column
  * including the IEEE mmr scores — on the real corpus and on a
  * degenerate shortlist smaller than k.
  */
class MmrSpec extends SparkSpec {
  import spark.implicits._

  test("kernel MMR == iterative join/window MMR bitwise (ids, picks, rel, mmr)") {
    val (shortlist, pairs) = graft.queries.ExtensionQueries.mmrFrames(spark, sf("sf0.01"))
    val p = pairs.persist(); p.count()
    val kernel = Similarity.mmrGreedy(shortlist, p, k = 5, lambda = 0.5)
    val iter = Similarity.mmrGreedyIterative(shortlist, p, k = 5, lambda = 0.5)
    // exceptAll is exact on doubles: any 1-ulp drift in a mmr_r fails
    assert(kernel.exceptAll(iter).isEmpty && iter.exceptAll(kernel).isEmpty,
      "kernel and iterative MMR must agree bitwise")
    assert(kernel.count() == 50, "10 queries x 5 picks")
    p.unpersist(); shortlist.unpersist()
  }

  test("OuterProductSum == explode/groupBy Gram matrix on a mixed-sign corpus") {
    val vecs = Seq(
      Seq(3L, -1L, 4L), Seq(-2L, 5L, 0L), Seq(7L, 7L, -7L), Seq(0L, 0L, 0L))
    val df = vecs.toDF("vf")
    val buf = df.agg(graft.functions.OuterProductSum.column($"vf", 3).as("b"))
      .collect()(0).getAs[scala.collection.Seq[Long]]("b")
    // independent reference: plain Scala sums
    def ref(i: Int, j: Int) = vecs.map(v => v(i) * v(j)).sum
    for (i <- 0 until 3; j <- 0 until 3)
      assert(buf(i * 3 + j) == ref(i, j), s"outer($i,$j)")
    for (i <- 0 until 3)
      assert(buf(9 + i) == vecs.map(_(i)).sum, s"sx($i)")
    assert(buf(12) == 4L, "count")
    // repartitioned (forced merge path) agrees
    val buf2 = df.repartition(3).agg(graft.functions.OuterProductSum.column($"vf", 3).as("b"))
      .collect()(0).getAs[scala.collection.Seq[Long]]("b")
    assert(buf == buf2, "merge path must agree with single-partition path")
  }

  test("candidate with NO sim entries is skipped, not handed +Inf (iterative inner-join semantics)") {
    // query 9: three candidates; candidate 30 has rank 2 on relevance
    // but appears in NO pair row — the iterative formulation's inner
    // join on maxSim drops it every step, so it must never be picked
    // and no mmr_r may be Infinity.
    val shortlist = Seq(
      (9L, 10L, 0.9, 1L), (9L, 30L, 0.8, 2L), (9L, 20L, 0.7, 3L))
      .toDF("query_id", "neighbor_id", "rel_r", "rnk")
    val pairs = Seq(
      (9L, 20L, 10L, 0.4), (9L, 10L, 20L, 0.4))
      .toDF("query_id", "a_id", "b_id", "sim_r")
    val kernel = Similarity.mmrGreedy(shortlist, pairs, k = 3, lambda = 0.5)
    val iter = Similarity.mmrGreedyIterative(shortlist, pairs, k = 3, lambda = 0.5)
    assert(kernel.exceptAll(iter).isEmpty && iter.exceptAll(kernel).isEmpty,
      "kernel must drop no-sim candidates exactly as the iterative inner join does")
    val rows = kernel.collect()
    assert(!rows.exists(_.getAs[Long]("neighbor_id") == 30L), "no-sim candidate never picked")
    assert(!rows.exists(r => !r.isNullAt(r.fieldIndex("mmr_r")) &&
      r.getAs[Double]("mmr_r").isInfinite), "no Infinity mmr scores")
  }

  test("shortlist smaller than k: both formulations stop at the candidate count") {
    // 3 candidates for one query -> exactly 3 picks, same in both
    val dir = java.nio.file.Files.createTempDirectory("graft_mmr").toString
    Seq(
      (0L, Seq(1.00f, 0.00f), 0),
      (1L, Seq(0.90f, 0.10f), 0),
      (2L, Seq(0.50f, 0.50f), 0),
      (3L, Seq(0.10f, 0.90f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val (shortlist, pairs) = graft.queries.ExtensionQueries.mmrFrames(spark, dir)
    val p = pairs.persist(); p.count()
    val kernel = Similarity.mmrGreedy(shortlist, p, k = 5, lambda = 0.5)
      .filter($"query_id" === 0L)
    val iter = Similarity.mmrGreedyIterative(shortlist, p, k = 5, lambda = 0.5)
      .filter($"query_id" === 0L)
    assert(kernel.count() == 3 && iter.count() == 3)
    assert(kernel.exceptAll(iter).isEmpty && iter.exceptAll(kernel).isEmpty)
    p.unpersist(); shortlist.unpersist()
  }
}
