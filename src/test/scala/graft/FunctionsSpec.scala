package graft

import org.apache.spark.sql.functions._

import graft.functions.{NearDup, RollingHash, Similarity, TextAnalysis}

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("DotProduct refuses non-double arrays at analysis time (no silent bit-reinterpretation)") {
    import org.apache.spark.sql.functions._
    val longArr = Seq((1L, Seq(1L, 2L, 3L))).toDF("id", "v")
    val ex = intercept[Exception] {
      longArr.select(Similarity.dot(col("v"), col("v"))).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("array<double>")
      || ex.getMessage.toLowerCase.contains("datatype_mismatch"), ex.getMessage)
    // and the double path still evaluates exactly
    val ok = Seq((1L, Seq(1d, 2d, 3d))).toDF("id", "v")
      .select(Similarity.dot(col("v"), col("v"))).as[Double].head()
    assert(ok == 14d)
  }

  test("JsonField.longField == get_json_object on the real feed and adversarial shapes") {
    import org.apache.spark.sql.functions._
    // differential on every real props blob
    val ev = graft.core.Tables.events(spark, sf())
    val diff = ev.select(
        graft.functions.JsonField.longField($"props", "k").as("fast"),
        get_json_object($"props", "$.k").cast("long").as("ref"))
      .filter(!($"fast" <=> $"ref"))
    assert(diff.isEmpty, "fast path diverges from get_json_object on the feed")
    // adversarial shapes
    val cases = Seq(
      ("""{"k": 42}""", Some(42L)),
      ("""{"k":-7}""", Some(-7L)),
      ("""{ "k" : 0 , "x": 1}""", Some(0L)),
      ("""{"kk": 5}""", None),              // key is not a prefix match
      ("""{"x": "k", "k": 9}""", Some(9L)), // key bytes inside a string value
      ("""{"k": 1.5}""", None),             // non-integer -> null (cast contract)
      ("""{"k": "9"}""", None),             // quoted value -> null on this shape
      ("""{"x": 3}""", None),
      ("""{}""", None),
      ("""""", None))
    val got = cases.zipWithIndex.map { case ((j, _), i) => (i, j) }
      .toDF("i", "j")
      .select($"i", graft.functions.JsonField.longField($"j", "k").as("v"))
      .collect().map(r => r.getInt(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
    cases.zipWithIndex.foreach { case ((j, want), i) =>
      assert(got(i) == want, s"case $i [$j]: got ${got(i)} want $want")
    }
  }

  test("text tokens / fingerprint normalize whitespace and case") {
    val df = Seq(
      (1L, "The quick  brown fox"),
      (2L, "the QUICK brown\tfox"),
      (3L, "something else")
    ).toDF("id", "text")
    val fp = df.select($"id", TextAnalysis.fingerprint($"text").as("fp")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp(1L) == fp(2L) && fp(1L) != fp(3L))
    val toks = df.filter($"id" === 1).select(TextAnalysis.wordTokens($"text")).as[Seq[String]].head()
    assert(toks == Seq("the", "quick", "brown", "fox"))
  }

  test("rolling hash: codegen'd expression matches a reference fold") {
    val df = Seq("abc", "", "the quick brown fox", "ü-utf8").toDF("s")
    val got = df.select(TextAnalysis.rollingFingerprint($"s")).as[Long].collect()
    def ref(s: String): Long =
      s.getBytes("UTF-8").foldLeft(0L)((h, b) => (h * RollingHash.Base + (b & 0xff)) % RollingHash.Mod)
    val want = Seq("abc", "", "the quick brown fox", "ü-utf8").map(ref)
    assert(got.toSeq == want)
  }

  test("exact dedup by hash groups identical content") {
    val df = Seq((1L, "same text"), (2L, "same text"), (3L, "other")).toDF("doc_id", "text")
    val g = NearDup.exactByHash(df, col("doc_id"), md5(col("text"))).collect()
    val byKeep = g.map(r => r.getAs[Long]("keep_id") -> r.getAs[Long]("n_dupes")).toMap
    assert(byKeep(1L) == 2L && byKeep(3L) == 1L)
  }

  test("minhash LSH finds planted near-duplicates and skips unrelated docs") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val near = base + " nu" // high jaccard
    val far = "one two three four five six seven eight nine ten eleven twelve"
    val df = Seq((1L, base), (2L, near), (3L, far)).toDF("doc_id", "text")
    val pairs = NearDup.minHashPairs(df, "doc_id", TextAnalysis.wordTokens(col("text")),
      numHashes = 32, bands = 8, threshold = 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("simhash: identical docs distance 0, near docs small distance") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val df = Seq((1L, base), (2L, base), (3L, "unrelated corpus words entirely different domain")).toDF("doc_id", "text")
    val sim = NearDup.simHash(df, "doc_id", TextAnalysis.wordTokens(col("text")))
    val m = sim.collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("simhash")).toMap
    assert(m(1L) == m(2L))
    assert(java.lang.Long.bitCount(m(1L) ^ m(3L)) > 3)
    val pairs = NearDup.simHashPairs(sim, maxDist = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("simHashPairs big-bucket join fallback emits the same pairs as the HOF path") {
    // maxBucketSize=1 forces EVERY bucket through the self-join
    // fallback (a bucket needs >=2 members to pair at all); output
    // must be identical to the collect_list+HOF path on a corpus with
    // plenty of real near-pairs.
    val docs = graft.core.Tables.documents(spark, sf())
    val sim = NearDup.simHash(docs, "doc_id", TextAnalysis.wordTokens(col("text")))
      .persist()
    try {
      val hof = NearDup.simHashPairs(sim, maxDist = 3)
        .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect().toSet
      val joined = NearDup.simHashPairs(sim, maxDist = 3, maxBucketSize = 1)
        .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect().toSet
      assert(hof.nonEmpty, "corpus should contain simhash near-pairs")
      assert(joined == hof)
    } finally sim.unpersist()
  }

  test("SimHashAgg is bitwise identical to the 64-aggregate formulation") {
    val docs = graft.core.Tables.documents(spark, sf())
    val toks = TextAnalysis.wordTokens(col("text"))
    val fast = NearDup.simHash(docs, "doc_id", toks)
    val wide = NearDup.simHashWide(docs, "doc_id", toks)
    assert(fast.join(wide.withColumnRenamed("simhash", "ref"), Seq("id"))
      .filter(not(col("simhash") <=> col("ref"))).count() == 0L)
    // empty token array: no rows after explode, so the doc is absent
    // from BOTH (group never forms) — and a doc with one token gets
    // that token's hash verbatim on both paths
    val one = Seq((1L, "solo")).toDF("doc_id", "text")
    val f1 = NearDup.simHash(one, "doc_id", TextAnalysis.wordTokens(col("text"))).collect()(0).getLong(1)
    val w1 = NearDup.simHashWide(one, "doc_id", TextAnalysis.wordTokens(col("text"))).collect()(0).getLong(1)
    assert(f1 == w1)
  }

  test("lloydIterate: one iteration equals lloydStep; more iterations stay valid and improve fit") {
    val e = graft.core.Tables.embeddings(spark, sf())
    val step = Similarity.lloydStep(e, "vec_id", "embedding", "label")
      .select(col("id"), col("bucket")).as[(Long, Long)].collect().toMap
    val one = Similarity.lloydIterate(e, "vec_id", "embedding", "label", iters = 1)
    val oneMap = one.select(col("id"), col("bucket")).as[(Long, Long)].collect().toMap
    assert(oneMap == step)
    val meanSim1 = one.agg(avg(col("sim"))).as[Double].head()
    one.unpersist()
    val three = Similarity.lloydIterate(e, "vec_id", "embedding", "label", iters = 3)
    val rows = three.select(col("id"), col("bucket")).as[(Long, Long)].collect()
    assert(rows.length == e.count() && rows.map(_._1).distinct.length == rows.length,
      "every vector assigned exactly once")
    val meanSim3 = three.agg(avg(col("sim"))).as[Double].head()
    three.unpersist()
    // Lloyd with mean centroids + cosine assignment is not a strict
    // monotone descent (means aren't the exact spherical update, and
    // sims are 1e-4-rounded), but fit must not get WORSE materially
    assert(meanSim3 >= meanSim1 - 1e-3, s"fit degraded: $meanSim1 -> $meanSim3")
  }

  test("lloydIterate kernel regime equals the join regime bitwise (buckets AND sims)") {
    // kernelGate=0 forces the crossJoin+min_by plan; the default gate
    // takes the CentroidAssign codegen kernel. Same seeding, same
    // rounds -> identical (id, bucket, sim) rows, including the
    // 1e-4-rounded sim doubles (exceptAll compares exact values).
    val e = graft.core.Tables.embeddings(spark, sf())
      .withColumn("b0", col("vec_id") % 7)
    val kernel = Similarity.lloydIterate(e, "vec_id", "embedding", "b0", iters = 2)
    val joined = Similarity.lloydIterate(e, "vec_id", "embedding", "b0", iters = 2, kernelGate = 0L)
    assert(kernel.count() == joined.count() && kernel.count() > 0)
    assert(kernel.exceptAll(joined).isEmpty && joined.exceptAll(kernel).isEmpty,
      "kernel and join assignment regimes must agree bitwise")
    kernel.unpersist(); joined.unpersist()
  }

  test("MicroDedup survivors equal the distributed setPairs+CC survivors on a random near-dup corpus") {
    // 300 docs over a 40-word vocab: dense near-dups, exact dups, and
    // transitive CHAINS (a~b~c with a!~c) — the regime where a
    // single-hop dup pointer would diverge from connected components
    // and only an exact union-find replication agrees.
    val rnd = new scala.util.Random(42)
    val vocab = (0 until 4000).map(i => s"w$i")
    // 100 chains of (a, b, c): b = a + one word (j 10/11 = 0.91),
    // c = b with one of a's words swapped for a new one — c~b at
    // 10/12 = 0.83 but c~a at only 9/12 = 0.75: the link is strictly
    // transitive. Expected survivors: exactly the 100 chain minima.
    val docs = (0 until 100).flatMap { g =>
      val a = rnd.shuffle(vocab).take(10)
      val x = s"x$g"
      val z = s"z$g"
      val b = a :+ x
      val c = (a.drop(1) :+ x) :+ z
      Seq((g * 3L, a.mkString(" ")), (g * 3L + 1, b.mkString(" ")), (g * 3L + 2, c.mkString(" ")))
    }
    val df = docs.toDF("doc_id", "text")
    val toks = TextAnalysis.wordTokens(col("text"))
    val (sets, setPairs) = NearDup.minHashSetPairs(df, "doc_id", toks,
      numHashes = 128, bands = 32, threshold = 0.8)
    val distSurvivors = graft.operators.ConnectedComponents
      .dedupAssignmentBySets(sets, setPairs)
      .filter(col("is_canonical")).select("doc_id").as[Long].collect().toSet
    // the micro path's exact prep projection (dedupOnIngest's)
    val prepped = df.select(col("doc_id"),
        array_sort(transform(array_distinct(toks), tk => xxhash64(tk))).as("toks"))
      .withColumn("__sig", graft.functions.MinHashSig.column(col("toks"), 128))
      .select(col("doc_id"), col("toks"),
        array((0 until 32).map(b => xxhash64(slice(col("__sig"), b * 4 + 1, 4))): _*).as("bands"))
      .collect()
    val micro = graft.functions.MicroDedup.run(
      prepped.map(r => (r.getLong(0), r.getSeq[Long](1).toArray, r.getSeq[Long](2).toArray)),
      threshold = 0.8, maxBucketSize = 4096)
    assert(micro.survivors.map(_.id).toSet == distSurvivors,
      "micro survivors must equal distributed survivors")
    // the chains really collapsed, to their minima (transitively:
    // c joins only through b)
    assert(micro.survivors.map(_.id).toSet == (0 until 100).map(_ * 3L).toSet)
    sets.unpersist(); setPairs.unpersist()
  }

  test("cosine top-k matches a driver-side brute force on sf0.001") {
    val e = graft.core.Tables.embeddings(spark, sf())
    val topk = Similarity.cosineTopK(e.filter($"vec_id" < 3), e, "vec_id", "embedding", 4)
      .select("query_id", "neighbor_id", "rnk").as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap

    val all = e.select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val ad = a.map(_.toDouble); val bd = b.map(_.toDouble)
      val dot = ad.zip(bd).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(ad.map(x => x * x).sum) * math.sqrt(bd.map(x => x * x).sum))
    }
    for (qid <- 0L until 3L) {
      val qv = all.find(_._1 == qid).get._2
      val want = all.filter(_._1 != qid)
        .map { case (id, v) => (id, cos(qv, v)) }
        .sortBy { case (id, c) => (-c, id) }.take(4).map(_._1).toSeq
      assert(topk(qid) == want, s"query $qid")
    }
  }

  test("bucketed ANN only scans same-bucket candidates") {
    val e = graft.core.Tables.embeddings(spark, sf())
    val res = Similarity.topK(
      Similarity.scoreBucketed(e.filter($"vec_id" < 5), e, "vec_id", "embedding", "label"), 3, col("cos"))
    val labels = e.select($"vec_id", $"label").as[(Long, Int)].collect().toMap
    res.select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .foreach { case (q, n) => assert(labels(q.toInt) == labels(n.toInt)) }
  }

  test("chunking: coverage with overlap, last chunk short, tiny doc = one chunk") {
    val df = Seq((1L, "a" * 500), (2L, "xy")).toDF("doc_id", "text")
      .withColumn("n_chars", length($"text").cast("long"))
    val chunks = df.select($"doc_id",
        posexplode(TextAnalysis.chunks($"text", $"n_chars", size = 256, overlap = 56)))
      .select($"doc_id", $"pos", $"col".as("chunk"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    val d1 = chunks.filter(_._1 == 1L).sortBy(_._2).map(_._3)
    assert(d1.length == 3) // strides at 0,200,400 over 500 chars
    assert(d1(0).length == 256 && d1(1).length == 256 && d1(2).length == 100)
    // consecutive chunks overlap by 56 chars
    assert(d1(0).takeRight(56) == d1(1).take(56))
    assert(chunks.count(_._1 == 2L) == 1 && chunks.find(_._1 == 2L).get._3 == "xy")
  }

  test("IVF with computed centroids: assigns to nearest centroid, searches one bucket") {
    // two tight clusters far apart; queries must land in their own cluster
    def vec(base: Double): Seq[Float] = Seq.tabulate(4)(i => (base + i * 0.01).toFloat)
    val rows = (0 until 6).map(i => (i.toLong, vec(1.0 + i * 0.001), 0)) ++
      (6 until 12).map(i => (i.toLong, vec(-1.0 - i * 0.001).map(x => (-x).abs * -1), 1))
    val df = rows.toDF("vec_id", "embedding", "label")
    val res = Similarity.ivfTopK(df.filter($"vec_id".isin(0L, 6L)), df, "vec_id", "embedding", "label", 3)
    val byQ = res.select("query_id", "neighbor_id").as[(Long, Long)].collect().groupBy(_._1)
    assert(byQ(0L).map(_._2).forall(_ < 6), "query 0 searches cluster-0 bucket only")
    assert(byQ(6L).map(_._2).forall(n => n >= 6 && n < 12), "query 6 searches cluster-1 bucket only")
  }

  test("shingles: overlapping n-grams, short-doc collapse, rewrite discrimination") {
    val df = Seq((1L, "the quick brown fox jumps"), (2L, "fox brown quick the jumps"), (3L, "hi")).toDF("doc_id", "text")
    val sh = df.select($"doc_id", TextAnalysis.shingles(TextAnalysis.wordTokens($"text"), 3).as("s"))
      .as[(Long, Seq[String])].collect().toMap
    assert(sh(1L) == Seq("the quick brown", "quick brown fox", "brown fox jumps"))
    assert(sh(3L) == Seq("hi"))
    // same word SET, different order: word jaccard 1.0, shingle jaccard 0
    assert(sh(1L).toSet.intersect(sh(2L).toSet).isEmpty)
  }

  test("IVF multi-probe recall dominates single-probe vs brute force") {
    val e = graft.core.Tables.embeddings(spark, sf("sf0.001"))
    val q = e.filter($"vec_id" < 5)
    def topkSet(scored: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      Similarity.topK(scored.withColumn("cos_r", graft.queries.r4($"cos")).drop("cos"), 5, $"cos_r")
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val exact = topkSet(Similarity.scoreAll(q, e, "vec_id", "embedding"))
    val p1 = topkSet(Similarity.ivfScore(q, e, "vec_id", "embedding", "label", nprobe = 1))
    val p2 = topkSet(Similarity.ivfScore(q, e, "vec_id", "embedding", "label", nprobe = 2))
    val r1 = (p1 & exact).size
    val r2 = (p2 & exact).size
    assert(r2 >= r1, s"nprobe=2 recall $r2 < nprobe=1 recall $r1")
    assert(p1.subsetOf(p2) || r2 >= r1) // more probes never hurt the hit count
  }

  test("embedding near-dup: exact finds planted dup; LSH always finds identical vectors") {
    val base = Seq.tabulate(16)(i => math.sin(i + 1).toFloat)
    val near = base.updated(0, base.head + 1e-4f)
    val far = Seq.tabulate(16)(i => math.cos(3 * i + 2).toFloat)
    val df = Seq((1L, base), (2L, near), (3L, far)).toDF("vec_id", "embedding")
    val exact = NearDup.embeddingPairs(df, "vec_id", "embedding", 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact == Set((1L, 2L)))
    // near-identical vectors agree on every hyperplane sign -> collide
    // in every SRP table -> always found
    val lsh = NearDup.embeddingPairsLsh(df, "vec_id", "embedding", 0.99, nBits = 8, dim = 16)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh == Set((1L, 2L)))
  }

  test("language id is deterministic and marks CJK as zh") {
    val df = Seq((1L, "the cat is on the mat"), (2L, "der hund und die katze ist"), (3L, "你好世界"))
      .toDF("id", "text")
    val got = df.select($"id", TextAnalysis.langId($"text").as("l")).as[(Long, String)].collect().toMap
    assert(got(1L) == "en" && got(2L) == "de" && got(3L) == "zh")
  }
}
