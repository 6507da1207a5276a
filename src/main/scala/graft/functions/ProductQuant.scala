package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PRODUCT QUANTIZATION (Jégou, Douze, Schmid — "Product Quantization
  * for Nearest Neighbor Search", TPAMI 2011): compress unit-normalized
  * embeddings to one small code per subspace and answer top-k with
  * asymmetric distance computation (ADC) — the 100 TB embedding-search
  * memory story, where raw vectors (64 floats = 256 B) become M codes
  * (M bytes at k <= 256) plus one shared, broadcastable codebook.
  *
  * Pipeline (all DataFrame ops, deterministic, DuckDB-replayable):
  *  1. unit-normalize vectors (cosine becomes plain dot product);
  *  2. split each vector into M contiguous subspaces of dim/M dims;
  *  3. per subspace, train a k-cell codebook: seed cells with the
  *     EXPLICIT-arithmetic sign-random-projection bucket (the q39
  *     plane family, seeded by subspace index), take element-wise
  *     means, then run `lloydRounds` reassign/recompute rounds with
  *     1e-4-ROUNDED L2 scores and code tiebreak (the q37/q71 trick
  *     that makes float argmins reproducible across engines);
  *  4. encode: each (vector, subspace) keeps its nearest code —
  *     the compressed representation;
  *  5. ADC: per query, one distance table of <q_sub, centroid> per
  *     (subspace, code) — M*k entries, broadcast — and a candidate's
  *     approximate cosine is the sum of M table lookups; exact top-k
  *     machinery (BoundedTopK) runs over the approximate scores.
  *
  * Scale shape: training shuffles only (m, cell, dim) partial sums
  * (M * k * dim rows); encoding is ONE codegen map pass (the
  * [[PqArgminExpr]] kernel — no intermediate rows, no shuffle); ADC
  * scoring broadcasts the Q*M*k table and never shuffles candidate
  * vectors — the full-size embedding column is read ONCE to encode and
  * never again.
  */
object ProductQuant {

  private def r4d(c: Column): Column = floor(c * lit(1e4) + lit(0.5)) / lit(1e4)
  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Unit-normalize and split: one row per (id, m, sv) with
    * sv = the m-th `dim/nSub`-dim slice of v / |v|.
    *
    * Repartitions by id first: downstream training aggregations and
    * the encode kernel inherit this frame's partitioning, so a
    * single-file parquet's one partition would otherwise run the
    * entire pipeline on one task — the shuffle here is |vectors|
    * rows, the parallelism it buys is the whole pipeline's. */
  def subspaces(vectors: DataFrame, idCol: String, vecCol: String,
                nSub: Int, dim: Int): DataFrame = {
    require(dim % nSub == 0, s"dim $dim must divide into $nSub subspaces")
    val ds = dim / nSub
    vectors
      .select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .repartition(col("id"))
      .withColumn("n", Similarity.l2norm(col("v")))
      .select(col("id"), explode(sequence(lit(0), lit(nSub - 1))).as("m"),
        col("v"), col("n"))
      .select(col("id"), col("m"),
        transform(slice(col("v"), col("m") * ds + 1, lit(ds)), x => x / col("n")).as("sv"))
  }

  /** Explicit-arithmetic SRP cell for a subspace row — the q39 plane
    * family with the SUBSPACE INDEX as the seed, so every subspace
    * gets independent planes from one closed-form expression that
    * replays in ANSI SQL: sign(m, i, j) = +1 iff
    * ((m*97 + i*1299721 + j*15485863) mod (2^31-1)) is even.
    *
    * Caveat that motivated the grid seeding below: kBits hyperplanes
    * through the origin of a ds-dim subspace carve at most
    * O(kBits^(ds-1)) regions — for the small ds a PQ subspace has,
    * raising kBits past ~2*ds stops creating populated cells. */
  private[graft] def srpCell(sv: Column, m: Column, kBits: Int, ds: Int): Column =
    (0 until kBits).map { i =>
      val s = (0 until ds).map { j =>
        element_at(sv, j + 1) *
          when(((m * 97L + lit(i.toLong * 1299721L + j.toLong * 15485863L)) % 2147483647L) % 2 === 0,
            lit(1d)).otherwise(lit(-1d))
      }.reduce(_ + _)
      when(s > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** RANK-GRID cell seeding: per (subspace, dimension), cut the
    * corpus into `nbPerDim` equal-frequency buckets (ntile over the
    * coordinate with id tiebreak — deterministic, and ntile's
    * remainder rule is identical in Spark and DuckDB, the q83
    * precedent), and the cell is the mixed-radix digit string of the
    * per-dim buckets. Per-dim buckets are exactly balanced by
    * construction, and the product grid keeps gaining populated cells
    * as nbPerDim^ds grows — where SRP seeding saturates at the ~2*ds
    * regions its origin-hyperplanes can carve (PQSpec measures both
    * properties). The rank window is a per-(m,dim) sort of the TRAINING
    * corpus; at 100 TB the codebook trains on a sample (as all PQ
    * deployments do), so the sort is sample-sized, not corpus-sized. */
  private[graft] def gridCells(sub: DataFrame, ds: Int, nbPerDim: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("m"), col("dim")).orderBy(col("x"), col("id"))
    sub.select(col("id"), col("m"), posexplode(col("sv")).as(Seq("dim", "x")))
      .withColumn("b", ntile(nbPerDim).over(w) - 1)
      .groupBy(col("id"), col("m"))
      .agg(sum(col("b") * pow(lit(nbPerDim), col("dim"))).cast("long").as("cell"))
  }

  /** Element-wise mean over each (m, cell) group -> codebook rows
    * (m, code, cent). Input needs (m, cell, sv). */
  private def means(assigned: DataFrame): DataFrame =
    assigned
      .select(col("m"), col("cell"), posexplode(col("sv")).as(Seq("dim", "x")))
      .groupBy(col("m"), col("cell"), col("dim"))
      .agg(avg(col("x")).as("c"))
      .groupBy(col("m"), col("cell"))
      .agg(array_sort(collect_list(struct(col("dim"), col("c")))).as("__s"))
      .select(col("m"), col("cell").as("code"),
        transform(col("__s"), s => s.getField("c")).as("cent"))

  /** Rounded L2 objective for assignment: |c|^2 - 2<sv,c> (the |sv|^2
    * term is constant per row and drops out of the argmin). |c|^2
    * arrives precomputed on the codebook row — one dot per codebook
    * entry instead of one per scored pair. */
  private def l2score(sv: Column, cent: Column, cc: Column): Column =
    r4d(cc - lit(2d) * Similarity.dot(sv, cent))

  /** Nearest code per (id, m): ONE codegen map pass via
    * [[PqArgminExpr]] — the codebook collects into the expression
    * (it is <= nSub * cells rows by construction) and each subspace
    * row emits its argmin code directly. Zero intermediate rows, zero
    * shuffle; bitwise-identical codes to [[assignJoin]] (PQSpec pins
    * it). Carries sv through for retraining. Output: (id, m, sv,
    * code).
    *
    * History of this plan: the first version was [[assignJoin]]'s
    * fan-out (|vectors| * nSub * cells scored rows — 819 M rows and a
    * 22 GB spill at the 100x probe); an array-form HOF scan emitted no
    * rows but ran interpreted per element (measured 2.8x slower than
    * the join). The codegen kernel is the third option that is both:
    * compiled AND row-free. */
  private def assign(sub: DataFrame, book: DataFrame): DataFrame = {
    val kernel = PqArgmin.fromBook(book)
    sub.select(col("id"), col("m"), col("sv"),
      PqArgmin.column(col("sv"), col("m"), kernel).as("code"))
  }

  /** The join-plan formulation of [[assign]] — kept as the
    * cross-check oracle for the codegen kernel (PQSpec asserts codes
    * match bitwise), not used in any serving/training path. */
  private[graft] def assignJoin(sub: DataFrame, book: DataFrame): DataFrame =
    sub.join(broadcast(book.withColumn("cc", Similarity.dot(col("cent"), col("cent")))), Seq("m"))
      .withColumn("d", l2score(col("sv"), col("cent"), col("cc")))
      .groupBy(col("id"), col("m"))
      .agg(first(col("sv")).as("sv"),
        min_by(col("code"), struct(col("d"), col("code"))).as("code"))

  /** Train per-subspace codebooks: SRP-seeded cells -> means ->
    * `lloydRounds` reassign/recompute rounds. Output: (m, code, cent),
    * at most nSub * 2^kBits rows — broadcastable by construction. */
  def trainCodebooks(sub: DataFrame, kBits: Int, ds: Int, lloydRounds: Int): DataFrame = {
    var book = means(sub.withColumn("cell", srpCell(col("sv"), col("m"), kBits, ds)))
    for (_ <- 1 to lloydRounds)
      book = means(assign(sub, book).withColumnRenamed("code", "cell"))
    book
  }

  /** [[trainCodebooks]] with the rank-grid seeding — nbPerDim^ds cells
    * per subspace, all populated. The returned codebook is
    * MATERIALIZED (collected and re-created as a local frame): it is
    * at most nSub * nbPerDim^ds rows by construction, every consumer
    * broadcasts it anyway, and without this the full training lineage
    * (windows, two rounds of aggregation) re-executes once per
    * consumer — encode and the distance table would each retrain. */
  def trainCodebooksGrid(sub: DataFrame, ds: Int, nbPerDim: Int, lloydRounds: Int): DataFrame = {
    var book = means(sub.join(gridCells(sub, ds, nbPerDim), Seq("id", "m")))
    for (_ <- 1 to lloydRounds)
      book = means(assign(sub, book).withColumnRenamed("code", "cell"))
    val spark = sub.sparkSession
    spark.createDataFrame(
      java.util.Arrays.asList(book.collect(): _*), book.schema)
  }

  /** Encode: the compressed (id, m, code) long-form representation —
    * M small integers per vector (byte-packable at kBits <= 8). */
  def encode(sub: DataFrame, book: DataFrame): DataFrame =
    assign(sub, book).select(col("id"), col("m"), col("code"))

  /** Build the PQ INDEX for a candidate corpus: the (codes, book)
    * pair that serving needs — 16 B/vector codes plus the shared
    * broadcastable codebook. Build once, persist, serve forever; the
    * raw vector column is read exactly once (here). */
  def buildIndex(candidates: DataFrame, idCol: String, vecCol: String,
                 nSub: Int, dim: Int, nbPerDim: Int, lloydRounds: Int): (DataFrame, DataFrame) = {
    // The subspace frame is consumed 3 + lloydRounds times (grid
    // seeding, seed means, each Lloyd reassign, final encode); without
    // a cache every consumer re-runs the scan + repartition + explode
    // lineage. Cache it for the BUILD only: the eager localCheckpoint
    // materializes the codes (the index — the thing production
    // persists anyway) and truncates their lineage, so the cache can
    // drop before serving starts instead of squatting on executor
    // memory for the query's lifetime.
    val sub = subspaces(candidates, idCol, vecCol, nSub, dim).persist()
    try {
      val book = trainCodebooksGrid(sub, dim / nSub, nbPerDim, lloydRounds)
      (encode(sub, book).localCheckpoint(true), book)
    } finally sub.unpersist(false)
  }

  /** Append vectors to a PREBUILT index WITHOUT retraining — the
    * production maintenance path: new batches encode against the
    * FROZEN codebook (one [[PqArgminExpr]] map pass — no training
    * jobs, no window, no shuffle) and union into the standing code
    * table. Appends stay O(batch) forever; the codebook retrains only
    * when [[quantizationError]] drifts past [[shouldRetrain]]'s
    * tolerance — the drift contract every deployed PQ system uses
    * (codebooks age as the corpus distribution walks). */
  def appendToIndex(codes: DataFrame, book: DataFrame, newVectors: DataFrame,
                    idCol: String, vecCol: String, nSub: Int, dim: Int): DataFrame =
    codes.unionByName(encode(subspaces(newVectors, idCol, vecCol, nSub, dim), book))

  /** Codebook drift statistic: mean per-vector quantization error of
    * `sample` against the frozen codebook — the sum over subspaces of
    * ||sv - cent(assigned code)||^2. Rises as the live distribution
    * leaves the one the codebook trained on; compare against the
    * value recorded at train time. Sample-sized compute: one encode
    * map pass + a broadcast codebook join. */
  def quantizationError(sample: DataFrame, book: DataFrame, idCol: String, vecCol: String,
                        nSub: Int, dim: Int): Double = {
    val sub = subspaces(sample, idCol, vecCol, nSub, dim)
    assign(sub, book)
      .join(broadcast(book), Seq("m", "code"))
      .select(col("id"),
        (Similarity.dot(col("sv"), col("sv"))
          - lit(2d) * Similarity.dot(col("sv"), col("cent"))
          + Similarity.dot(col("cent"), col("cent"))).as("resid"))
      .groupBy(col("id")).agg(sum(col("resid")).as("err"))
      .agg(avg(col("err")).as("mean_err"))
      .head().getDouble(0)
  }

  /** The retrain gate: drift is RELATIVE error growth over the
    * baseline recorded when the codebook was trained. 20% default —
    * loose enough that sampling noise never triggers a spurious
    * week-long retrain, tight enough to catch a real distribution
    * shift. */
  def shouldRetrain(baselineError: Double, currentError: Double,
                    tolerance: Double = 0.2): Boolean =
    currentError > baselineError * (1d + tolerance)

  /** ADC scores against a PREBUILT code table: approximate cosine of
    * (query, candidate) = sum over subspaces of the query's
    * distance-table entry at the candidate's code. The distance table
    * (Q * nSub * cells rows) broadcasts; only the compressed codes
    * scan — no raw vector is touched. Output: (query_id, neighbor_id,
    * approx_cos). */
  def adcScoreCodes(queries: DataFrame, codes: DataFrame, book: DataFrame,
                    idCol: String, vecCol: String, nSub: Int, dim: Int): DataFrame = {
    val dtable = subspaces(queries, idCol, vecCol, nSub, dim)
      .withColumnRenamed("id", "query_id").withColumnRenamed("sv", "qsv")
      .join(broadcast(book), Seq("m"))
      .select(col("query_id"), col("m"), col("code"),
        Similarity.dot(col("qsv"), col("cent")).as("part"))
    codes
      .join(broadcast(dtable), Seq("m", "code"))
      .filter(col("query_id") =!= col("id"))
      .groupBy(col("query_id"), col("id").as("neighbor_id"))
      .agg(sum(col("part")).as("approx"))
      .select(col("query_id"), col("neighbor_id"), r4d(col("approx")).as("approx_cos"))
  }

  /** [[adcScoreCodes]] with the index built inline from the raw
    * candidate corpus. */
  def adcScore(queries: DataFrame, candidates: DataFrame, idCol: String, vecCol: String,
               nSub: Int, dim: Int, book: DataFrame): DataFrame =
    adcScoreCodes(queries, encode(subspaces(candidates, idCol, vecCol, nSub, dim), book),
      book, idCol, vecCol, nSub, dim)

  /** Exact-cosine rerank of a (query_id, neighbor_id) shortlist: the
    * tiny shortlist broadcasts against the corpus — one map-side
    * pass, no corpus shuffle. Output: (query_id, neighbor_id, cos,
    * rnk), 1e-4-rounded. */
  def exactRerank(short: DataFrame, queries: DataFrame, candidates: DataFrame,
                  idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = candidates.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"))
      .withColumn("cn", Similarity.l2norm(col("cv")))
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
      .withColumn("qn", Similarity.l2norm(col("qv")))
    val scored = c.join(broadcast(short), Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        r4d(Similarity.dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cos"))
    Similarity.topK(scored, k, col("cos"))
  }

  /** PQ ADC top-k with grid-seeded codebooks. Output: (query_id,
    * neighbor_id, approx_cos, rnk). */
  def pqTopK(queries: DataFrame, candidates: DataFrame, idCol: String, vecCol: String,
             nSub: Int, dim: Int, nbPerDim: Int, lloydRounds: Int, k: Int): DataFrame = {
    val (codes, book) = buildIndex(candidates, idCol, vecCol, nSub, dim, nbPerDim, lloydRounds)
    Similarity.topK(adcScoreCodes(queries, codes, book, idCol, vecCol, nSub, dim),
      k, col("approx_cos"))
  }

  /** IVF-PQ — the billion-scale serving architecture, composed from
    * the two index structures this engine already ships: the IVF
    * coarse quantizer routes each query to its `nprobe` nearest
    * bucket centroids, and within the probed buckets candidates are
    * scored by ADC over their PQ byte codes — so a query touches
    * ~(nprobe/|buckets|) of the corpus AND never reads a raw vector
    * until the exact rerank of the final shortlist. At 100 TB this is
    * the memory story (codes are 16 B/vector) times the scan story
    * (bucket routing) in one plan: codes shuffle-join their bucket
    * label once, everything else (centroids, probe table, distance
    * table, shortlist) broadcasts. Recall is bounded by how well
    * `bucketCol` clusters similarity — pre-cluster with
    * `Similarity.lloydIterate` when buckets are arbitrary labels
    * (PQSpec measures both the routing ceiling and the near-zero
    * loss the PQ stage adds on top). */
  def ivfPqTopK(queries: DataFrame, candidates: DataFrame, idCol: String, vecCol: String,
                bucketCol: String, nSub: Int, dim: Int, nbPerDim: Int, lloydRounds: Int,
                nprobe: Int, shortlist: Int, k: Int): DataFrame = {
    val (codes, book) = buildIndex(candidates, idCol, vecCol, nSub, dim, nbPerDim, lloydRounds)
    val cents = Similarity.centroids(candidates, vecCol, bucketCol)
    ivfPqServe(queries, candidates, codes, book, cents, idCol, vecCol, bucketCol,
      nSub, dim, nprobe, shortlist, k)
  }

  /** IVF-PQ SERVING against a prebuilt index — the steady-state
    * query path a deployment actually pays per request: bucket
    * routing over broadcast centroids, ADC over the 16 B/vector
    * codes, exact rerank of the shortlist. No training, no raw-vector
    * scan outside the rerank. [[ivfPqTopK]] is exactly
    * build-then-this, so the two stay plan-identical. */
  def ivfPqServe(queries: DataFrame, candidates: DataFrame, codes: DataFrame, book: DataFrame,
                 cents: DataFrame, idCol: String, vecCol: String, bucketCol: String,
                 nSub: Int, dim: Int, nprobe: Int, shortlist: Int, k: Int): DataFrame = {
    require(shortlist >= k, "shortlist must be at least k")
    val probed = Similarity.probeBuckets(queries, cents, idCol, vecCol, nprobe)
      .select(col("query_id"), col("bucket"))
    val dtable = subspaces(queries, idCol, vecCol, nSub, dim)
      .withColumnRenamed("id", "query_id").withColumnRenamed("sv", "qsv")
      .join(broadcast(book), Seq("m"))
      .select(col("query_id"), col("m"), col("code"),
        Similarity.dot(col("qsv"), col("cent")).as("part"))
    val bucketOf = candidates.select(col(idCol).as("id"), col(bucketCol).as("bucket"))
    val scored = codes.join(bucketOf, Seq("id"))
      .join(broadcast(probed), Seq("bucket"))
      .filter(col("query_id") =!= col("id"))
      .join(broadcast(dtable), Seq("query_id", "m", "code"))
      .groupBy(col("query_id"), col("id").as("neighbor_id"))
      .agg(sum(col("part")).as("approx"))
      .select(col("query_id"), col("neighbor_id"), r4d(col("approx")).as("approx_cos"))
    val short = Similarity.topK(scored, shortlist, col("approx_cos"))
      .select(col("query_id"), col("neighbor_id"))
    exactRerank(short, queries, candidates, idCol, vecCol, k)
  }

  /** PQ-rerank SERVING against a prebuilt (codes, book) index — the
    * q104 pipeline minus training/encoding: ADC shortlist over codes,
    * exact rerank of the shortlist only. */
  def serveRerankTopK(queries: DataFrame, candidates: DataFrame, codes: DataFrame,
                      book: DataFrame, idCol: String, vecCol: String, nSub: Int, dim: Int,
                      shortlist: Int, k: Int): DataFrame = {
    require(shortlist >= k, "shortlist must be at least k")
    val short = Similarity.topK(adcScoreCodes(queries, codes, book, idCol, vecCol, nSub, dim),
      shortlist, col("approx_cos")).select(col("query_id"), col("neighbor_id"))
    exactRerank(short, queries, candidates, idCol, vecCol, k)
  }

  /** The production PQ serving shape: ADC SHORTLIST (cheap, over
    * codes) then EXACT re-rank of only the shortlist (one more
    * map-side pass: the tiny shortlist broadcasts against the corpus
    * — no corpus shuffle, no all-pairs scan). Output: (query_id,
    * neighbor_id, cos, rnk) with exact 1e-4-rounded cosines. */
  def pqRerankTopK(queries: DataFrame, candidates: DataFrame, idCol: String, vecCol: String,
                   nSub: Int, dim: Int, nbPerDim: Int, lloydRounds: Int,
                   shortlist: Int, k: Int): DataFrame = {
    require(shortlist >= k, "shortlist must be at least k")
    val short = pqTopK(queries, candidates, idCol, vecCol, nSub, dim, nbPerDim, lloydRounds, shortlist)
      .select(col("query_id"), col("neighbor_id"))
    exactRerank(short, queries, candidates, idCol, vecCol, k)
  }
}
