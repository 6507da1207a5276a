package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.{ProductQuant, Similarity}

/** Product quantization: compression is real (nSub byte-codes from
  * nbPerDim^ds cells), ADC + exact-rerank recalls the exact top-k,
  * and the whole pipeline is partition-invariant (the 1000-executor
  * reproducibility property). Config under test = q104's production
  * point: 16 subspaces x 256 cells on 64-dim (16 B/vector vs 256 B
  * raw float32 — 16x). */
class PQSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def e = Tables.embeddings(spark, dir)
  private def queries = e.filter(col("vec_id") < 10)

  test("codebook and codes have the promised compressed shape") {
    val sub = ProductQuant.subspaces(e, "vec_id", "embedding", nSub = 16, dim = 64)
    val book = ProductQuant.trainCodebooksGrid(sub, ds = 4, nbPerDim = 4, lloydRounds = 1)
    val nVec = e.count()
    assert(book.count() <= 16 * 256, "at most nSub * nbPerDim^ds codebook rows")
    assert(book.select(max(col("code"))).as[Long].head() < 256, "codes fit one byte")
    val codes = ProductQuant.encode(sub, book)
    assert(codes.count() == nVec * 16, "exactly nSub codes per vector")
    assert(codes.groupBy("id").count().filter(col("count") =!= 16).count() == 0)
  }

  test("codegen argmin kernel assigns bitwise-identical codes to the join plan") {
    // The encode path is PqArgminExpr (one compiled map pass, zero
    // intermediate rows); assignJoin is the fan-out formulation kept
    // as its oracle. Same 1e-4-rounded L2 objective, same sequential
    // dot order, same ascending-code tiebreak -> EXACT equality, for
    // every (id, m), across both codebook generations.
    val sub = ProductQuant.subspaces(e, "vec_id", "embedding", nSub = 16, dim = 64).persist()
    try {
      val book = ProductQuant.trainCodebooksGrid(sub, ds = 4, nbPerDim = 4, lloydRounds = 1)
      val viaExpr = ProductQuant.encode(sub, book)
      val viaJoin = ProductQuant.assignJoin(sub, book).select(col("id"), col("m"), col("code"))
      assert(viaExpr.count() == viaJoin.count())
      assert(viaExpr.exceptAll(viaJoin).isEmpty && viaJoin.exceptAll(viaExpr).isEmpty,
        "kernel and join plan disagree on at least one (id, m) code")
      // and the kernel's plan is the point: no join, no aggregate, no
      // exchange between the subspace frame and the codes
      val plan = viaExpr.queryExecution.executedPlan.toString
      assert(!plan.toLowerCase.contains("join"), s"encode plan still joins:\n$plan")
    } finally sub.unpersist(false)
  }

  test("appended vectors join IVF-PQ serving via nearest-centroid bucket assignment") {
    // the incremental-maintenance loop closed on the COARSE quantizer
    // side: a new vector encodes against the frozen PQ codebook
    // (appendToIndex) AND joins the bucket of its nearest centroid
    // (assignBuckets) — no re-clustering, no retraining — and the
    // composed IVF-PQ serve finds it. The clone of vector 7 lands in
    // 7's own nearest bucket, which is exactly the bucket query 7
    // probes first.
    val (codes, book) = ProductQuant.buildIndex(e, "vec_id", "embedding", 16, 64, 4, 1)
    val cents = Similarity.centroids(e, "embedding", "label")
    val clone = e.filter(col("vec_id") === 7L)
      .select(lit(9001L).as("vec_id"), col("embedding"))
    val grownCodes = ProductQuant.appendToIndex(codes, book, clone, "vec_id", "embedding", 16, 64)
    val cloneCand = clone
      .join(Similarity.assignBuckets(clone, cents, "vec_id", "embedding")
        .withColumnRenamed("id", "vec_id"), Seq("vec_id"))
      .select(col("vec_id"), col("embedding"), col("bucket").as("label"))
    val cand = e.select(col("vec_id"), col("embedding"), col("label")).unionByName(cloneCand)
    val served = ProductQuant.ivfPqServe(
      e.filter(col("vec_id") === 7L), cand, grownCodes, book, cents,
      "vec_id", "embedding", "label", 16, 64, nprobe = 1, shortlist = 25, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(served.contains((7L, 9001L)),
      s"appended clone must serve through the composed index, got $served")
  }

  test("grid seeding yields fine cells (the resolution SRP seeding loses in low dims)") {
    val sub = ProductQuant.subspaces(e, "vec_id", "embedding", nSub = 16, dim = 64)
    val cells = ProductQuant.gridCells(sub, ds = 4, nbPerDim = 4)
    // per-dim ntile buckets are exactly balanced by construction; the
    // PRODUCT cells are populated statistically (~500 vectors over 256
    // cells leaves a Poisson tail of empties) — the point is the count
    // scales with nbPerDim^ds instead of saturating at the ~2*ds
    // origin-hyperplane regions SRP caps out at
    val cellsPerSub = cells.groupBy("m").agg(countDistinct("cell").as("n"))
      .select(min(col("n"))).as[Long].head()
    assert(cellsPerSub >= 150, s"grid cells collapsed: min $cellsPerSub of 256")
    assert(cells.select(max(col("cell"))).as[Long].head() < 256, "cell ids exceed the 4^4 grid")
  }

  test("ADC alone recalls most of the exact top-5; with exact rerank, nearly all") {
    val exact = Similarity.cosineTopK(queries, e, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(exact.size == 50)
    val adc = ProductQuant.pqTopK(queries, e, "vec_id", "embedding", 16, 64, 4, 1, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val adcRecall = (exact & adc).size.toDouble / exact.size
    assert(adcRecall >= 0.6, s"ADC recall@5 degraded: $adcRecall (measured 0.74 at sf0.001)")
    val rr = ProductQuant.pqRerankTopK(queries, e, "vec_id", "embedding", 16, 64, 4, 1,
      shortlist = 25, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val rrRecall = (exact & rr).size.toDouble / exact.size
    assert(rrRecall >= 0.95, s"rerank recall@5 degraded: $rrRecall (measured 1.0 at sf0.001)")
  }

  test("IVF-PQ: the PQ stage loses almost nothing beyond the routing ceiling") {
    // the recall CEILING here is the coarse routing itself: the
    // driver's `label` buckets are class labels, not similarity
    // clusters, so nprobe=2 of 10 buckets holds ~0.3 of the exact
    // top-5 (measured; a lloydIterate-clustered coarse quantizer is
    // how production lifts that). The claim THIS spec pins is that
    // the PQ stage adds almost no loss ON TOP of routing: IVF-PQ must
    // recover nearly everything IVF-with-exact-scoring finds.
    val ivfExact = Similarity.topK(
      Similarity.ivfScore(queries, e, "vec_id", "embedding", "label", nprobe = 2)
        .withColumn("cos_r", expr("floor(cos*10000+0.5)/10000")), 5, col("cos_r"))
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivfpq = ProductQuant.ivfPqTopK(queries, e, "vec_id", "embedding", "label",
      16, 64, 4, 1, nprobe = 2, shortlist = 25, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val vsRouting = (ivfExact & ivfpq).size.toDouble / ivfExact.size
    assert(vsRouting >= 0.9, s"PQ stage lost recall beyond the routing ceiling: $vsRouting")
    assert(ivfpq.size == ivfExact.size, "k per query must be stable")
  }

  test("k-means-clustered coarse buckets lift the IVF routing ceiling over raw labels") {
    val exact = Similarity.cosineTopK(queries, e, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    def routingRecall(corpus: org.apache.spark.sql.DataFrame, bucketCol: String): Double = {
      val got = Similarity.topK(
        Similarity.ivfScore(corpus.filter(col("vec_id") < 10), corpus,
          "vec_id", "embedding", bucketCol, nprobe = 2)
          .withColumn("cos_r", expr("floor(cos*10000+0.5)/10000")), 5, col("cos_r"))
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      (exact & got).size.toDouble / exact.size
    }
    val labelRecall = routingRecall(e, "label")
    val clustered = Similarity.lloydIterate(e, "vec_id", "embedding", "label", iters = 3)
      .select(col("id").as("vec_id"), col("bucket").as("kbucket"))
      .join(e, Seq("vec_id"))
    val kmeansRecall = routingRecall(clustered, "kbucket")
    // labels are classes, not similarity cells — re-clustering the
    // same 10 buckets around actual vector geometry must route better
    assert(kmeansRecall > labelRecall,
      s"k-means buckets ($kmeansRecall) should beat label buckets ($labelRecall)")
    assert(kmeansRecall >= 0.38, s"clustered routing recall too low: $kmeansRecall (measured 0.42 vs labels 0.30 at sf0.001)")
  }

  test("approximate scores are close to the exact cosine they stand in for") {
    val sub = ProductQuant.subspaces(e, "vec_id", "embedding", 16, 64)
    val book = ProductQuant.trainCodebooksGrid(sub, 4, 4, 1)
    val exact = Similarity.scoreAll(queries, e, "vec_id", "embedding")
      .select(col("query_id"), col("neighbor_id"), col("cos"))
    val approx = ProductQuant.adcScore(queries, e, "vec_id", "embedding", 16, 64, book)
    val err = exact.join(approx, Seq("query_id", "neighbor_id"))
      .select(avg(abs(col("cos") - col("approx_cos"))).as("mae"))
      .as[Double].head()
    assert(err < 0.1, s"mean ADC error too large: $err")
  }

  test("partition layout does not change the ranking") {
    def run(c: org.apache.spark.sql.DataFrame) =
      ProductQuant.pqRerankTopK(queries, c, "vec_id", "embedding", 16, 64, 4, 1, 25, 5)
        .collect().map(_.toString).sorted
    assert(run(e).sameElements(run(e.repartition(7))), "pqRerankTopK must be partition-invariant")
  }
}
