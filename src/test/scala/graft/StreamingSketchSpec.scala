package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.functions.Sketches

/** Mergeable-summary property of the explicit-hash sketches: partial
  * sketches built per slice / per micro-batch combine into EXACTLY
  * the sketch of the whole — the property that lets a 1000-executor
  * cluster (or an unbounded stream) sketch without ever co-locating
  * the raw data. */
class StreamingSketchSpec extends SparkSpec {
  import spark.implicits._

  private def cellMap(df: DataFrame): Map[(Long, Long), Long] =
    df.collect().map(r => (r.getAs[Number]("depth").longValue(), r.getAs[Number]("cslot").longValue())
      -> r.getAs[Number]("cell_n").longValue()).toMap

  test("count-min cells: per-slice partials merge to the exact whole-data sketch") {
    val whole = graft.core.Tables.lineitem(spark, sf("sf0.001")).select($"l_partkey")
    val slices = Seq(
      whole.filter($"l_partkey" % 3 === 0),
      whole.filter($"l_partkey" % 3 === 1),
      whole.filter($"l_partkey" % 3 === 2))
    val merged = Sketches.mergeCells(slices.map(s => Sketches.countMinCells(s, $"l_partkey")): _*)
    assert(cellMap(merged) == cellMap(Sketches.countMinCells(whole, $"l_partkey")))
  }

  test("bloom bits: per-slice unions equal the whole-set filter; probe agrees") {
    val keys = (1L to 400L).toDF("k")
    val slices = Seq(keys.filter($"k" <= 150), keys.filter($"k" > 150 && $"k" <= 290), keys.filter($"k" > 290))
    val mergedBits = slices.map(s => Sketches.bloomBits(s, $"k")).reduce(_ unionByName _).distinct()
    val wholeBits = Sketches.bloomBits(keys, $"k")
    assert(mergedBits.as[Long].collect().sorted.toSeq == wholeBits.as[Long].collect().sorted.toSeq)
    // member probes all hit on the merged filter (no false negatives)
    val hits = Sketches.bloomProbe(mergedBits, keys, $"k")
    assert(hits.filter(!$"bloom_hit").count() == 0)
  }

  test("streaming quantile sketch: per-batch sig-bucket partials merge to the batch sketch") {
    val stream = MemoryStream[Long](spark)
    var acc: Option[DataFrame] = None
    val q = stream.toDF().toDF("v").writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val partial = Sketches.sigBuckets(batch, col("v")).persist()
        partial.count()
        acc = Some(acc.fold(partial)(prev => {
          val m = Sketches.mergeSigBuckets(prev, partial).persist()
          m.count()
          prev.unpersist(); partial.unpersist()
          m
        }))
        ()
      }
      .start()
    try {
      val all = (1L to 900L).map(i => i * i % 7919 + 1)
      all.grouped(300).foreach { chunk => stream.addData(chunk); q.processAllAvailable() }
      def bm(df: DataFrame) = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(bm(acc.get) == bm(Sketches.sigBuckets(all.toDF("v"), col("v"))))
      // and the merged sketch answers quantiles like the batch one
      val qs = Seq(0.5, 0.9)
      val a = Sketches.sigQuantiles(acc.get, qs).collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
      val b = Sketches.sigQuantiles(Sketches.sigBuckets(all.toDF("v"), col("v")), qs)
        .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
      assert(a == b)
    } finally q.stop()
  }

  test("maintainSketches: durable store equals batch sketches after 3 batches; swap-safe") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sketches").toString
    val stream = MemoryStream[(Long, Double)](spark)
    val q = graft.streaming.StreamPipeline.maintainSketches(
      stream.toDF().toDF("k", "v"), s"$dir/store", s"$dir/ckpt", "k", "v",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      val all = (1L to 900L).map(i => (i % 57, (i % 13 + 1) * 7.5))
      all.grouped(300).foreach { chunk => stream.addData(chunk); q.processAllAvailable() }
      val whole = all.toDF("k", "v")
      val wantCells = cellMap(Sketches.countMinCells(whole, col("k")))
      val gotCells = cellMap(spark.read.parquet(s"$dir/store/cms"))
      assert(gotCells == wantCells)
      val cents = org.apache.spark.sql.functions.floor(col("v") * 100 + lit(0.5)).cast("long")
      val wantB = Sketches.sigBuckets(whole, cents)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val gotB = spark.read.parquet(s"$dir/store/qbuckets")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(gotB == wantB)
      // the store answers estimates directly
      val est = Sketches.cmsEstimate(spark.read.parquet(s"$dir/store/cms"),
        Seq(5L).toDF("k"), col("k")).collect().head.getLong(1)
      assert(est >= all.count(_._1 == 5L), "CMS estimate must dominate truth")
    } finally q.stop()
  }

  test("maintainSketches replay: a torn cross-store snapshot heals without double-counting") {
    import graft.streaming.StreamPipeline.mergeSketchBatch
    val root = java.nio.file.Files.createTempDirectory("graft_torn").toString
    val store = s"$root/store"
    val b0 = (1L to 300L).map(i => (i % 57, (i % 13 + 1) * 7.5)).toDF("k", "v")
    val b1 = (301L to 600L).map(i => (i % 57, (i % 13 + 1) * 7.5)).toDF("k", "v")
    mergeSketchBatch(b0, store, "k", "v", 0L)

    // crash BETWEEN the two swaps of batch 1: cms has batch 1 merged
    // (marker and all), qbuckets is still the batch-0 snapshot
    val qbSnap = java.nio.file.Paths.get(s"$root/qb_snapshot")
    org.apache.commons.io.FileUtils.copyDirectory(
      new java.io.File(s"$store/qbuckets"), qbSnap.toFile)
    mergeSketchBatch(b1, store, "k", "v", 1L)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$store/qbuckets"))
    org.apache.commons.io.FileUtils.copyDirectory(qbSnap.toFile, new java.io.File(s"$store/qbuckets"))

    // checkpoint replay of batch 1: cms must be left untouched (its
    // marker already says 1), qbuckets must catch up — both stores
    // then equal the clean two-batch result
    mergeSketchBatch(b1, store, "k", "v", 1L)
    val whole = b0.union(b1)
    assert(cellMap(spark.read.parquet(s"$store/cms")) ==
      cellMap(Sketches.countMinCells(whole, col("k"))),
      "replay double-counted batch 1 into the cms store")
    val cents = org.apache.spark.sql.functions.floor(col("v") * 100 + lit(0.5)).cast("long")
    assert(spark.read.parquet(s"$store/qbuckets").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Sketches.sigBuckets(whole, cents).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap,
      "qbuckets did not heal to the two-batch sketch")
  }

  test("similarityServe: streamed queries get the exact batch top-k against the corpus") {
    val dir = java.nio.file.Files.createTempDirectory("graft_serve").toString
    def vec(seed: Long): Seq[Float] =
      (0 until 8).map(j => ((seed * 31 + j * 7) % 13 - 6).toFloat)
    val corpus = (1L to 50L).map(i => (i, vec(i))).toDF("id", "embedding")
    val stream = MemoryStream[(Long, Seq[Float])](spark)
    val q = graft.streaming.StreamPipeline.similarityServe(
      stream.toDF().toDF("id", "embedding"), corpus, s"$dir/out", s"$dir/ckpt", k = 3,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      stream.addData((1001L, vec(3)), (1002L, vec(17)))
      q.processAllAvailable()
      stream.addData((1003L, vec(42)))
      q.processAllAvailable()
      val got = spark.read.parquet(s"$dir/out")
        .select("query_id", "neighbor_id", "rnk")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val queries = Seq((1001L, vec(3)), (1002L, vec(17)), (1003L, vec(42)))
        .toDF("id", "embedding")
      val want = graft.functions.Similarity.cosineTopK(queries, corpus, "id", "embedding", 3)
        .select("query_id", "neighbor_id", "rnk")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == want)
      assert(got.size == 9, "3 queries x top-3")
    } finally q.stop()
  }

  test("pqServe: streamed queries equal the batch ADC+rerank pipeline on the same index") {
    import graft.functions.ProductQuant
    val dir = java.nio.file.Files.createTempDirectory("graft_pqserve").toString
    val e = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")
    // build the index ONCE, store codes like a real deployment would
    val (codesDf, book) = ProductQuant.buildIndex(e, "vec_id", "embedding", 16, 64, 4, 1)
    codesDf.write.mode("overwrite").parquet(s"$dir/codes")
    val codes = spark.read.parquet(s"$dir/codes")
    val qIds = Seq(3L, 17L, 42L)
    val queries = e.filter(col("vec_id").isin(qIds: _*))
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val stream = MemoryStream[(Long, Seq[Float])](spark)
    val q = graft.streaming.StreamPipeline.pqServe(
      stream.toDF().toDF("vec_id", "embedding"), codes, book, e,
      s"$dir/out", s"$dir/ckpt", "vec_id", "embedding",
      nSub = 16, dim = 64, shortlist = 25, k = 5,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      val qRows = queries.collect().map(r =>
        (r.getLong(0), r.getSeq[Float](1))).toSeq
      stream.addData(qRows.take(2))
      q.processAllAvailable()
      stream.addData(qRows.drop(2))
      q.processAllAvailable()
      val got = spark.read.parquet(s"$dir/out")
        .select("query_id", "neighbor_id", "cos", "rnk")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
      // batch reference: same stored index, same shortlist+rerank
      val short = graft.functions.Similarity.topK(
        ProductQuant.adcScoreCodes(queries, codes, book, "vec_id", "embedding", 16, 64),
        25, col("approx_cos")).select(col("query_id"), col("neighbor_id"))
      val want = ProductQuant.exactRerank(short, queries, e, "vec_id", "embedding", 5)
        .select("query_id", "neighbor_id", "cos", "rnk")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
      assert(got == want, "served results must equal the batch pipeline on the same index")
      assert(got.size == 15, "3 queries x top-5")
    } finally q.stop()
  }

  test("driftGate: in-distribution batches route clean, a shifted batch routes flagged") {
    val dir = java.nio.file.Files.createTempDirectory("graft_driftgate").toString
    // reference distribution: symmetric around 100
    def rows(scaleDev: Double, shift: Double, ids: Range): Seq[(Long, Double)] =
      ids.map(i => (i.toLong, 100.0 + (i % 21 - 10) * scaleDev + shift))
    val ref = rows(1.0, 0.0, 0 until 2100).toDF("id", "v")
    val snap = graft.operators.Checks.snapshot(ref, Seq("v"))

    val stream = MemoryStream[(Long, Double)](spark)
    val q = graft.streaming.StreamPipeline.driftGate(
      stream.toDF().toDF("id", "v"), snap, tol = 0.05,
      s"$dir/clean", s"$dir/flagged", s"$dir/report", s"$dir/ckpt",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      stream.addData(rows(1.0, 0.0, 10000 until 12100))   // in-distribution
      q.processAllAvailable()
      stream.addData(rows(2.0, 25.0, 20000 until 22100))  // shifted AND widened
      q.processAllAvailable()
      stream.addData(rows(1.02, 0.3, 30000 until 32100))  // wiggle inside tolerance
      q.processAllAvailable()
    } finally q.stop()

    val clean = spark.read.parquet(s"$dir/clean")
    val flagged = spark.read.parquet(s"$dir/flagged")
    assert(clean.count() == 4200, "batches 0 and 2 must route clean")
    assert(flagged.count() == 2100, "the shifted batch must route flagged")
    assert(flagged.select(min($"id")).as[Long].head() >= 20000
      && flagged.select(max($"id")).as[Long].head() < 22100)
    // the audit report names what drifted, per batch
    val rep = spark.read.parquet(s"$dir/report")
    assert(rep.count() == 9, "3 batches x 3 drift constraints")
    val failedChecks = rep.filter(!$"pass")
      .select("check_name").as[String].collect().toSet
    assert(failedChecks == Set("mean_within(v)", "stddev_within(v)", "quantile_within(v,0.5)"),
      s"shifted+widened batch must flag all three statistics: $failedChecks")
    assert(rep.filter(!$"pass").select("batch_id").distinct().as[Long].collect().toSeq == Seq(1L))
  }

  test("sustained ingest: per-batch latency stays flat as the standing stores grow") {
    // The throughput contract behind graft.tools.StreamBench: the
    // bucket-ingest and dedup-on-ingest pipelines do O(batch) work
    // against their standing stores, so batch latency must not trend
    // up as the store accumulates. 12 batches each; compare the MIN
    // of the last third to the MIN of batches 2-4 (skipping batch 0-1
    // JIT/plan warmup) with a generous noise bound. Min, not median:
    // a store-size-proportional pipeline raises the FLOOR of late
    // latencies, while one multi-second GC/host spike in a 4-batch
    // window moves a median but can never move a min — the same
    // noise-robust estimator Bench.scala documents (this test flaked
    // exactly once on a median: late batches 10.2/13.0/1.9/5.9 s, a
    // transient spike pair with the floor unchanged).
    def floor4(xs: Seq[Double]): Double = xs.min
    val dir = java.nio.file.Files.createTempDirectory("graft_flatlat").toString
    val nBatches = 12

    val ticks = MemoryStream[(String, java.sql.Timestamp, Double, Double, Long)](spark)
    val qRun = graft.streaming.StreamPipeline.run(
      ticks.toDF().toDF("symbol", "timestamp", "price", "change", "volume"),
      s"$dir/buckets", s"$dir/ckpt_run",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    val runLats = try {
      (0 until nBatches).map { b =>
        ticks.addData((0 until 2000).map { i =>
          (s"S${i % 20}", new java.sql.Timestamp((1704067200L + b * 600L + i / 20) * 1000L),
            100.0 + i % 50, 0.0, 100L)
        })
        val t0 = System.nanoTime(); qRun.processAllAvailable()
        (System.nanoTime() - t0) / 1e6
      }
    } finally qRun.stop()
    val (runEarly, runLate) = (floor4(runLats.slice(2, 5)), floor4(runLats.takeRight(4)))
    assert(runLate <= runEarly * 4 + 200,
      s"bucket ingest latency trends up: early $runEarly ms -> late $runLate ms ($runLats)")

    val docs = MemoryStream[(Long, String)](spark)
    val qDedup = graft.streaming.StreamPipeline.dedupOnIngest(
      docs.toDF().toDF("doc_id", "text"), s"$dir/corpus", s"$dir/ckpt_dedup",
      threshold = 0.8, trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0),
      indexPath = Some(s"$dir/bandindex"))
    // hash-per-(seed, j) words — a windowed generator aliases into
    // real near-dups (see StreamBench) and collapses the corpus
    def text(seed: Long): String =
      (0 until 25).map(j => s"w${((seed * 1000003L + j) * 2654435761L) % 50000}").mkString(" ")
    val dedupLats = try {
      (0 until nBatches).map { b =>
        docs.addData((0 until 300).map { i =>
          val id = b.toLong * 300 + i
          (id, text(if (i % 10 == 0 && b > 0) id - 300 else id))
        })
        val t0 = System.nanoTime(); qDedup.processAllAvailable()
        (System.nanoTime() - t0) / 1e6
      }
    } finally qDedup.stop()
    val (dupEarly, dupLate) = (floor4(dedupLats.slice(2, 5)), floor4(dedupLats.takeRight(4)))
    assert(dupLate <= dupEarly * 4 + 200,
      s"dedup ingest latency trends up: early $dupEarly ms -> late $dupLate ms ($dedupLats)")
  }

  test("pqIndexMaintain: appended vectors serve without any retraining job") {
    import graft.functions.ProductQuant
    val dir = java.nio.file.Files.createTempDirectory("graft_pqmaint").toString
    val e = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")
    // train ONCE on the standing corpus; freeze the codebook
    val (codesDf, book) = ProductQuant.buildIndex(e, "vec_id", "embedding", 16, 64, 4, 1)
    codesDf.withColumn("batch_id", lit(-1L)).write.mode("overwrite").parquet(s"$dir/index")
    val baseErr = ProductQuant.quantizationError(e, book, "vec_id", "embedding", 16, 64)

    // two micro-batches of NEW vectors: exact copies of existing ones
    // under fresh ids, so each new id's nearest neighbor is provably
    // its source and must surface in served top-k
    def rowOf(id: Long): Seq[Float] =
      e.filter(col("vec_id") === id).select(col("embedding").cast("array<float>"))
        .head().getSeq[Float](0)
    val stream = MemoryStream[(Long, Seq[Float])](spark)
    val m = graft.streaming.StreamPipeline.pqIndexMaintain(
      stream.toDF().toDF("vec_id", "embedding"), book, s"$dir/index", s"$dir/ckpt",
      "vec_id", "embedding", nSub = 16, dim = 64,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      stream.addData((9001L, rowOf(7L)), (9002L, rowOf(19L)))
      m.processAllAvailable()
      stream.addData((9003L, rowOf(33L)))
      m.processAllAvailable()
    } finally m.stop()

    val index = graft.streaming.StreamPipeline.readCodeIndex(spark, s"$dir/index")
    assert(index.count() == (e.count() + 3) * 16, "3 appended vectors x 16 codes each")

    // the appended vectors are SERVABLE: querying with the source
    // vectors, the clone must appear in the ADC+rerank top-k (its
    // approx and exact cosine are identical to the source's self-sim)
    val corpus = e.select(col("vec_id"), col("embedding"))
      .unionByName(Seq((9001L, rowOf(7L)), (9002L, rowOf(19L)), (9003L, rowOf(33L)))
        .toDF("vec_id", "embedding").select(col("vec_id"), col("embedding").cast("array<float>")))
    val queries = e.filter(col("vec_id").isin(7L, 19L, 33L))
    val served = ProductQuant.serveRerankTopK(queries, corpus, index, book,
      "vec_id", "embedding", 16, 64, shortlist = 25, k = 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(served.contains((7L, 9001L)) && served.contains((19L, 9002L))
      && served.contains((33L, 9003L)),
      s"appended clones must serve in top-k, got $served")

    // ZERO retraining jobs in the append path: the encode plan is
    // scan -> project (PqArgmin), no window (ntile seeding), no
    // aggregate (means/Lloyd), no join
    val appendPlan = ProductQuant.appendToIndex(
      spark.read.parquet(s"$dir/index").drop("batch_id"), book,
      queries, "vec_id", "embedding", 16, 64)
      .queryExecution.optimizedPlan.toString.toLowerCase
    assert(!appendPlan.contains("window") && !appendPlan.contains("join"),
      s"append path must not contain training shapes:\n$appendPlan")

    // drift gate: the unchanged distribution does not trigger retrain
    val curErr = ProductQuant.quantizationError(corpus, book, "vec_id", "embedding", 16, 64)
    assert(!ProductQuant.shouldRetrain(baseErr, curErr),
      s"no-drift corpus must not retrain (base $baseErr, cur $curErr)")
    // a genuinely shifted distribution does
    val shifted = e.select(col("vec_id"),
      expr("transform(cast(embedding as array<double>), x -> x * 40.0 + 25.0)").as("embedding"))
    val shiftErr = ProductQuant.quantizationError(shifted, book, "vec_id", "embedding", 16, 64)
    assert(ProductQuant.shouldRetrain(baseErr, shiftErr),
      s"shifted corpus must trigger retrain (base $baseErr, shifted $shiftErr)")
  }

  test("removeFromCodeIndex: erased vectors leave the store and can never be shortlisted") {
    import graft.functions.ProductQuant
    val dir = java.nio.file.Files.createTempDirectory("graft_pqrm").toString
    val e = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val (codesDf, book) = ProductQuant.buildIndex(e, "vec_id", "embedding", 16, 64, 4, 1)
    codesDf.withColumn("batch_id", lit(-1L)).write.mode("overwrite").parquet(s"$dir/index")
    val n = e.count()

    graft.streaming.StreamPipeline.removeFromCodeIndex(spark, s"$dir/index",
      Seq(7L).toDF("vec_id"))
    val index = graft.streaming.StreamPipeline.readCodeIndex(spark, s"$dir/index")
    assert(index.filter($"id" === 7L).isEmpty, "erased vector's codes must leave disk")
    assert(index.count() == (n - 1) * 16)

    // serving with vector 7's own embedding as the query: the erased
    // id can never be shortlisted again (its codes are gone), even
    // though its nearest neighbor would trivially be itself
    val q7 = e.filter($"vec_id" === 7L)
    val corpus = e.filter($"vec_id" =!= 7L)
    val served = ProductQuant.serveRerankTopK(q7, corpus, index, book,
      "vec_id", "embedding", 16, 64, shortlist = 25, k = 5)
    assert(served.filter($"neighbor_id" === 7L).isEmpty)
    assert(served.count() == 5, "serving still returns a full top-k from the survivors")
  }

  test("streaming CMS: foreachBatch-maintained cells equal the batch sketch after 3 batches") {
    val stream = MemoryStream[Long](spark)
    var acc: Option[DataFrame] = None
    val q = stream.toDF().toDF("k").writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val partial = Sketches.countMinCells(batch, col("k")).persist()
        partial.count() // materialize before the batch frame goes away
        acc = Some(acc.fold(partial)(prev => {
          val m = Sketches.mergeCells(prev, partial).persist()
          m.count()
          prev.unpersist(); partial.unpersist()
          m
        }))
        ()
      }
      .start()
    try {
      val all = (1L to 900L).map(i => i % 57)
      all.grouped(300).foreach { chunk => stream.addData(chunk); q.processAllAvailable() }
      val expected = cellMap(Sketches.countMinCells(all.toDF("k"), col("k")))
      assert(cellMap(acc.get) == expected)
    } finally q.stop()
  }

  test("maintainGram: merged streaming Gram store yields the BITWISE batch PCA component; replay-idempotent") {
    import graft.functions.PowerIteration
    import graft.streaming.StreamPipeline
    val dir = java.nio.file.Files.createTempDirectory("graft_gram").toString
    val corpus = graft.core.Tables.embeddings(spark, sf("sf0.001"))
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect().toSeq
    val stream = MemoryStream[(Long, Seq[Float])](spark)
    val q = StreamPipeline.maintainGram(
      stream.toDF().toDF("vec_id", "embedding"), s"$dir/gram", s"$dir/ckpt",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      corpus.grouped((corpus.size + 2) / 3).foreach { chunk =>
        stream.addData(chunk); q.processAllAvailable()
      }
      val streamed = StreamPipeline.readGram(spark, s"$dir/gram")
      val batch = PowerIteration.gramBuffer(
        graft.core.Tables.embeddings(spark, sf("sf0.001")), $"embedding", 64)
      assert(streamed.toSeq == batch.toSeq,
        "streamed merge must equal the one-pass batch buffer exactly")
      val (n1, sx1, v1, _) = PowerIteration.top(streamed, 64)
      val (n2, sx2, v2, _) = PowerIteration.top(batch, 64)
      assert(n1 == n2 && sx1.toSeq == sx2.toSeq)
      assert(v1.toSeq == v2.toSeq, "component must be bitwise equal (same kernel, same integers)")
      // replaying the last batch (same batchId) must not double-count
      val before = StreamPipeline.readGram(spark, s"$dir/gram").toSeq
      val lastChunk = corpus.grouped((corpus.size + 2) / 3).toSeq.last
      StreamPipeline.mergeGramBatch(lastChunk.toDF("vec_id", "embedding"),
        s"$dir/gram", "embedding", 64, batchId = 2L)
      assert(StreamPipeline.readGram(spark, s"$dir/gram").toSeq == before,
        "marker must make the replay a no-op")
    } finally q.stop()
  }
}
