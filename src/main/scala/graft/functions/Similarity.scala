package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector similarity search over an embedding column (array<float>).
  *
  * Two paths, as a scale-out story:
  *  - `cosineTopK`: brute-force exact top-k — broadcast the (small)
  *    query set against all candidates; per-row HOF dot products stay
  *    map-side, one shuffle for the per-query top-k window.
  *  - `bucketedTopK`: IVF-style pruned search — candidates are
  *    pre-assigned to coarse buckets (here the corpus `label`; in a
  *    full IVF build, the nearest-centroid id); each query only scans
  *    its bucket. Same output schema, ~(1/nBuckets) the work, with the
  *    usual approximate-recall tradeoff at bucket boundaries.
  *
  * All arithmetic is double (arrays cast element-wise) with sequential
  * HOF summation — deterministic and bitwise-reproducible.
  */
object Similarity {

  /** Sequential-order dot product of two array<double> columns —
    * a native codegen'd expression (see DotProduct.scala); bitwise
    * identical to the HOF `aggregate(zip_with(...))` formulation it
    * replaced, minus the per-row intermediate array. */
  def dot(a: Column, b: Column): Column = DotProduct.column(a, b)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** All (query, candidate) cosine scores, self excluded — the exact
    * brute-force scan. The query set is broadcast; scoring is
    * map-side. Norms are computed ONCE per side before the cross join
    * (not per pair — with k queries that is a k-fold saving on the
    * candidate norm, the dominant term). Output: query_id,
    * neighbor_id, cos. */
  def scoreAll(queries: DataFrame, candidates: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
      .withColumn("qn", l2norm(col("qv")))
    val c = candidates.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"))
      .withColumn("cn", l2norm(col("cv")))
    c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .select(col("query_id"), col("neighbor_id"), col("cos"))
  }

  /** Bucket-pruned scoring: only candidates sharing `bucketCol` with
    * the query are scanned (inverted-file pattern). At 100 TB the
    * bucket column comes from a trained coarse quantizer and is the
    * partition key of the vector table, so a query touches one
    * partition instead of the full corpus. Output adds `bucket`. */
  def scoreBucketed(queries: DataFrame, candidates: DataFrame, idCol: String, vecCol: String,
                    bucketCol: String): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(bucketCol).as("bucket"), asDouble(col(vecCol)).as("qv"))
      .withColumn("qn", l2norm(col("qv")))
    val c = candidates.select(col(idCol).as("neighbor_id"), col(bucketCol).as("bucket"), asDouble(col(vecCol)).as("cv"))
      .withColumn("cn", l2norm(col("cv")))
    c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .select(col("query_id"), col("bucket"), col("neighbor_id"), col("cos"))
  }

  /** Per-query top-k over a scored frame: rank by `scoreCol` desc with
    * neighbor_id tiebreak.
    *
    * Runs on the bounded-heap aggregate (BoundedTopK), NOT a
    * row_number window: partial aggregation reduces every map
    * partition to <= k rows per query before the exchange, so the
    * shuffle carries O(partitions * k) rows per query instead of the
    * whole scored corpus, and no single reducer ever sorts
    * |corpus|-sized data. Output rows and order are identical to the
    * window form (the (score desc, neighbor_id) key is total). */
  def topK(scored: DataFrame, k: Int, scoreCol: Column): DataFrame = {
    val cols = scored.columns.toSeq
    val key = struct(negate(scoreCol), col("neighbor_id"))
    val payload = struct(cols.map(col): _*)
    scored.groupBy(col("query_id"))
      .agg(BoundedTopK.column(key, payload, k).as("__top"))
      .select(posexplode(col("__top")).as(Seq("__pos", "__p")))
      .select(cols.map(c => col("__p").getField(c).as(c)) :+ (col("__pos") + 1).cast("long").as("rnk"): _*)
  }

  /** The window formulation topK replaced — kept as the semantic
    * reference for the equivalence spec. Scale hazard: one reducer
    * partition per query sorts the entire scored set. */
  private[graft] def topKWindow(scored: DataFrame, k: Int, scoreCol: Column): DataFrame = {
    val w = Window.partitionBy(col("query_id")).orderBy(scoreCol.desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w).cast("long")).filter(col("rnk") <= k)
  }

  /** Exact brute-force cosine top-k (convenience composition). */
  def cosineTopK(queries: DataFrame, candidates: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame =
    topK(scoreAll(queries, candidates, idCol, vecCol), k, col("cos"))

  /** IVF coarse-quantizer build: per-bucket centroid as the
    * element-wise mean vector. One narrow shuffle of (bucket, dim)
    * partial sums; output is tiny (nBuckets rows) and broadcastable.
    * With k-means this would iterate assign->recompute; one step over
    * pre-labeled data demonstrates the index-build dataflow. */
  def centroids(candidates: DataFrame, vecCol: String, bucketCol: String): DataFrame =
    candidates
      .select(col(bucketCol).as("bucket"), posexplode(asDouble(col(vecCol))).as(Seq("dim", "x")))
      .groupBy(col("bucket"), col("dim"))
      .agg(avg(col("x")).as("m"))
      .groupBy(col("bucket"))
      .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("__s"))
      .select(col("bucket"), transform(col("__s"), s => s.getField("m")).as("centroid"))

  /** Assign each query vector to its nearest centroid and score its
    * bucket — the IVF(nprobe=1) scoring flow. The nearest-centroid
    * rank uses the 1e-4-ROUNDED similarity (bucket-id tiebreak):
    * centroid means are float sums whose low bits vary with partition
    * layout/engine, and rounding makes the assignment reproducible
    * across both. Output: query_id, bucket, neighbor_id, cos. */
  /** Assign each query to its `nprobe` nearest coarse centroids by
    * 1e-4-ROUNDED cosine (bucket tiebreak — the reproducible-argmin
    * rule): the multi-probe IVF recall lever, shared by the plain IVF
    * scorer and the IVF-PQ composition. Output: (query_id, bucket,
    * qv). The centroid table broadcasts; cost is |queries| x
    * |buckets| map-side. */
  def probeBuckets(queries: DataFrame, cents: DataFrame, idCol: String, vecCol: String,
                   nprobe: Int): DataFrame =
    queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
      .crossJoin(broadcast(cents))
      .withColumn("sim", cosine(col("qv"), col("centroid")))
      .withColumn("__simr", floor(col("sim") * lit(1e4) + lit(0.5)) / lit(1e4))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("__simr").desc, col("bucket"))))
      .filter(col("__rn") <= nprobe)
      .select(col("query_id"), col("bucket"), col("qv"))

  /** IVF bucket assignment for NEW vectors entering a maintained
    * index — the WRITE-path twin of [[probeBuckets]]: each appended
    * vector joins the partition of its nearest coarse centroid
    * (nprobe=1), so incremental appends compose with IVF-PQ serving
    * without re-clustering (the [[ProductQuant.appendToIndex]]
    * frozen-codebook contract, coarse-quantizer side). Output:
    * (id, bucket). */
  def assignBuckets(newVectors: DataFrame, cents: DataFrame,
                    idCol: String, vecCol: String): DataFrame =
    probeBuckets(newVectors, cents, idCol, vecCol, nprobe = 1)
      .select(col("query_id").as("id"), col("bucket"))

  def ivfScore(queries: DataFrame, candidates: DataFrame, idCol: String, vecCol: String,
               bucketCol: String, nprobe: Int = 1): DataFrame = {
    val cents = centroids(candidates, vecCol, bucketCol)
    val assigned = probeBuckets(queries, cents, idCol, vecCol, nprobe)
    val c = candidates.select(col(idCol).as("neighbor_id"), col(bucketCol).as("bucket"),
      asDouble(col(vecCol)).as("cv")).withColumn("cn", l2norm(col("cv")))
    c.join(broadcast(assigned), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", dot(col("qv"), col("cv")) / (l2norm(col("qv")) * col("cn")))
      .select(col("query_id"), col("bucket"), col("neighbor_id"), col("cos"))
  }

  /** Full IVF(nprobe=1) top-k: ivfScore + bounded-heap topK. */
  def ivfTopK(queries: DataFrame, candidates: DataFrame, idCol: String, vecCol: String,
              bucketCol: String, k: Int): DataFrame =
    topK(ivfScore(queries, candidates, idCol, vecCol, bucketCol), k, col("cos"))

  /** One Lloyd (k-means) reassignment step: centroids are the
    * element-wise means of the CURRENT `bucketCol` assignment, and
    * every vector moves to its nearest centroid by 1e-4-ROUNDED
    * cosine with bucket-id tiebreak (centroid means are float sums
    * whose low bits vary with partition layout/engine; rounding makes
    * the argmin reproducible). Centroids broadcast, argmin is a
    * min_by partial aggregate — map-side, no window, no shuffle of
    * the vector table beyond the final per-id agg. Output:
    * (id, old_bucket, bucket, sim). */
  def lloydStep(vectors: DataFrame, idCol: String, vecCol: String, bucketCol: String): DataFrame = {
    val cents = centroids(vectors, vecCol, bucketCol)
    vectors.select(col(idCol).as("id"), col(bucketCol).cast("long").as("old_bucket"),
      asDouble(col(vecCol)).as("qv"))
      .crossJoin(broadcast(cents.withColumnRenamed("bucket", "cb")))
      .withColumn("simr", floor(cosine(col("qv"), col("centroid")) * lit(1e4) + lit(0.5)) / lit(1e4))
      .groupBy(col("id"), col("old_bucket"))
      .agg(min_by(struct(col("cb"), col("simr")), struct((-col("simr")).as("ns"), col("cb"))).as("t"))
      .select(col("id"), col("old_bucket"), col("t.cb").cast("long").as("bucket"), col("t.simr").as("sim"))
  }

  /** `iters` Lloyd steps from the `initBucketCol` seeding — the full
    * k-means refinement loop. Each iteration materializes (persists)
    * its assignment and drops the previous one, so the lineage stays
    * one step deep and each step is exactly one broadcast + one
    * partial agg over the vector table — the only cross-cluster
    * traffic at 100 TB is the tiny centroid table, per iteration.
    * Returns the final (id, bucket, sim), persisted; caller owns
    * unpersisting it. */
  def lloydIterate(vectors: DataFrame, idCol: String, vecCol: String, initBucketCol: String,
                   iters: Int, kernelGate: Long = 1L << 17): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    var cur = vectors.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"),
      col(initBucketCol).cast("long").as("bucket"), lit(null).cast("double").as("sim"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Regime gate, decided ONCE on the seed bucket count (assignment
    // never invents buckets, so k only shrinks across rounds): at
    // broadcast-sized k the reassignment is the CentroidAssign codegen
    // kernel — one map pass, zero intermediate rows (the join
    // formulation materializes |corpus| x k wide rows through a
    // groupBy and measured a 10 GB spill at the 100x growing-k probe);
    // past the gate the join plan stands, k-rows-at-a-time
    // distributed. Both produce bitwise-identical assignments
    // (FunctionsSpec pins kernel == join on real embeddings).
    val useKernel = cur.select(col("bucket")).distinct().count() <= kernelGate
    for (_ <- 1 to iters) {
      val cents = centroids(cur, "v", "bucket")
      val next = (if (useKernel) {
        val book = CentroidAssign.fromCentroids(cents)
        cur.select(col("id"), col("v"))
          .withColumn("__pk", CentroidAssign.column(col("v"), book))
          .select(col("id"), col("v"),
            expr("__pk DIV 100000").as("bucket"), // DIV: `/` on columns is double division
            ((col("__pk") % lit(100000L) - lit(10000L)).cast("double") / lit(1e4)).as("sim"))
      } else {
        // the vector rides the per-id aggregate as first(v) — carrying
        // it through the one unavoidable exchange instead of paying a
        // second id-to-id join to re-attach it each iteration
        cur.select(col("id"), col("v"))
          .crossJoin(broadcast(cents.withColumnRenamed("bucket", "cb")))
          .withColumn("simr", floor(cosine(col("v"), col("centroid")) * lit(1e4) + lit(0.5)) / lit(1e4))
          .groupBy(col("id"))
          .agg(first(col("v")).as("v"),
            min_by(struct(col("cb"), col("simr")), struct((-col("simr")).as("ns"), col("cb"))).as("t"))
          .select(col("id"), col("v"), col("t.cb").cast("long").as("bucket"), col("t.simr").as("sim"))
      }).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      next.count()
      cur.unpersist(blocking = false)
      cur = next
    }
    cur.select(col("id"), col("bucket"), col("sim"))
  }

  /** Sign-random-projection LSH bucket id from `nBits` seeded
    * hyperplanes: bit i = sign(<v, h_i>) where h_i is a deterministic
    * ±1 plane derived from (seed, i, j) — a data-free stand-in for
    * trained planes, giving a 2^nBits-bucket ANN index with no
    * external state. Planes are array literals dotted with zip_with —
    * codegen stays small regardless of dim. */
  def srpBucket(vec: Column, nBits: Int, dim: Int, seed: Int = 0): Column = {
    import org.apache.spark.sql.functions.typedlit
    val v = asDouble(vec)
    val bits = (0 until nBits).map { i =>
      val plane: Seq[Double] = (0 until dim).map { j =>
        if (((scala.util.hashing.MurmurHash3.productHash((seed, i, j)) >> 1) & 1) == 0) 1d else -1d
      }
      when(dot(v, typedlit(plane)) > 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** [[srpBucket]] with planes from EXPLICIT integer arithmetic
    * instead of the JVM's MurmurHash3: sign(i, j) = +1 iff
    * ((seed*97 + i*1299721 + j*15485863) mod (2^31-1)) is even. Same
    * ±1-plane geometry and recall characteristics, but the planes —
    * and therefore the buckets, the candidate set, and the whole
    * LSH output — are reproducible in ANSI SQL, giving the SRP
    * pipeline a strict cross-engine oracle (q39). */
  def srpBucketExplicit(vec: Column, nBits: Int, dim: Int, seed: Int = 0): Column = {
    import org.apache.spark.sql.functions.typedlit
    val v = asDouble(vec)
    val bits = (0 until nBits).map { i =>
      val plane: Seq[Double] = (0 until dim).map { j =>
        val h = (seed.toLong * 97L + i.toLong * 1299721L + j.toLong * 15485863L) % 2147483647L
        if (h % 2 == 0) 1d else -1d
      }
      when(dot(v, typedlit(plane)) > 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** MMR greedy selection (Carbonell & Goldstein 1998) over a bounded
    * per-query shortlist: pick 1 is the relevance top-1; pick i > 1
    * maximizes λ·rel(d) − (1−λ)·max_{s∈selected} sim(d, s), ties to
    * the smaller id. ONE flatMapGroups pass: each query's candidates
    * (≤ shortK rows) and pair similarities (≤ shortK² rows) group to
    * one task, and the k greedy steps run in-kernel — vs the
    * join/window formulation [[mmrGreedyIterative]], which schedules
    * ~3^k recomputing micro-jobs (measured 12.1 s vs 1.5 s warm at
    * the 100x probe for identical output; MmrSpec pins bitwise
    * equality). Inputs carry r4-quantized scores, and the kernel's
    * 0.5·rel − 0.5·maxsim is the same IEEE sequence the iterative
    * plan and the DuckDB oracle evaluate — mmr values agree bitwise.
    *
    * shortlist: (query_id, neighbor_id, rel_r, rnk);
    * pairs: (query_id, a_id, b_id, sim_r). Output: (query_id, pick,
    * neighbor_id, rel_r, mmr_r — null for pick 1). */
  def mmrGreedy(shortlist: DataFrame, pairs: DataFrame, k: Int, lambda: Double): DataFrame = {
    val spark = shortlist.sparkSession
    import spark.implicits._
    val tagged = shortlist.select(col("query_id").cast("long"), lit(true).as("is_cand"),
        col("neighbor_id").cast("long"), col("rel_r").cast("double"),
        lit(0L).as("b_id"), lit(0d).as("sim_r"), col("rnk").cast("long"))
      .unionByName(pairs.select(col("query_id").cast("long"), lit(false).as("is_cand"),
        col("a_id").cast("long").as("neighbor_id"), lit(0d).as("rel_r"),
        col("b_id").cast("long"), col("sim_r").cast("double"), lit(0L).as("rnk")))
      .as[(Long, Boolean, Long, Double, Long, Double, Long)]
    tagged.groupByKey(_._1)
      .flatMapGroups { (qid: Long, it: Iterator[(Long, Boolean, Long, Double, Long, Double, Long)]) =>
        val rows = it.toArray
        // candidates ascending by id: the tie-scan below then keeps
        // the smallest id on equal mmr, matching (mmr DESC, id ASC)
        val cands = rows.filter(_._2).map(r => (r._3, r._4, r._7)).sortBy(_._1)
        val sim = new scala.collection.mutable.HashMap[(Long, Long), Double]()
        rows.filterNot(_._2).foreach(r => sim((r._3, r._5)) = r._6)
        val selected = scala.collection.mutable.ArrayBuffer.empty[Long]
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Long, Double, Option[Double])]
        cands.find(_._3 == 1L).foreach { c =>
          selected += c._1; out += ((qid, 1, c._1, c._2, None))
        }
        var step = 2
        while (step <= k && selected.nonEmpty && selected.size < cands.length) {
          var bestId = -1L; var bestRel = 0d; var bestMmr = 0d; var found = false
          cands.foreach { case (id, rel, _) =>
            if (!selected.contains(id)) {
              var ms = Double.NegativeInfinity
              selected.foreach { s =>
                val v = sim.getOrElse((id, s), Double.NegativeInfinity)
                if (v > ms) ms = v
              }
              // a candidate with NO sim entry against the selected set
              // is skipped for this step — the iterative formulation's
              // inner join on maxSim drops it, and -inf would otherwise
              // make mmr = +inf and hand it the win
              if (ms != Double.NegativeInfinity) {
                val mmr = lambda * rel - (1d - lambda) * ms
                if (!found || mmr > bestMmr) {
                  found = true; bestId = id; bestRel = rel; bestMmr = mmr
                }
              }
            }
          }
          if (found) {
            selected += bestId
            out += ((qid, step, bestId, bestRel, Some(bestMmr)))
          }
          step += 1
        }
        out.iterator
      }
      .toDF("query_id", "pick", "neighbor_id", "rel_r", "mmr_r")
  }

  /** The join/window formulation [[mmrGreedy]] replaced — kept as the
    * semantic reference for the equivalence spec (MmrSpec). Scale
    * hazard: each greedy step is a micro-job over ~|queries| rows,
    * and the selected-set union tree recomputes earlier steps
    * ~3^k times unless every step is eagerly persisted. */
  private[graft] def mmrGreedyIterative(shortlist: DataFrame, pairs: DataFrame,
                                        k: Int, lambda: Double): DataFrame = {
    val first = shortlist.filter(col("rnk") === 1)
      .select(col("query_id"), col("neighbor_id"), col("rel_r"),
        lit(1).as("pick"), lit(null).cast("double").as("mmr_r"))
    val selected = (2 to k).foldLeft(first) { (sel, step) =>
      val selIds = sel.select(col("query_id"), col("neighbor_id").as("b_id"))
      val maxSim = pairs.join(selIds, Seq("query_id", "b_id"))
        .groupBy(col("query_id"), col("a_id").as("neighbor_id"))
        .agg(max(col("sim_r")).as("max_sim"))
      val pick = shortlist
        .join(sel.select(col("query_id"), col("neighbor_id")),
          Seq("query_id", "neighbor_id"), "left_anti")
        .join(maxSim, Seq("query_id", "neighbor_id"))
        .withColumn("mmr_r", lit(lambda) * col("rel_r") - lit(1d - lambda) * col("max_sim"))
        .withColumn("rn", row_number().over(Window.partitionBy(col("query_id"))
          .orderBy(col("mmr_r").desc, col("neighbor_id"))))
        .filter(col("rn") === 1)
        .select(col("query_id"), col("neighbor_id"), col("rel_r"),
          lit(step).as("pick"), col("mmr_r"))
        .persist()
      pick.count() // collapse the 3^k recomputation tree
      sel.unionByName(pick)
    }
    selected.select(col("query_id"), col("pick"), col("neighbor_id"),
      col("rel_r"), col("mmr_r"))
  }
}
