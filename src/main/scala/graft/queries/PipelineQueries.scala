package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.{NearDup, Similarity, TextAnalysis}

/** Round-5 pipeline-output surface: the queries that MATERIALIZE the
  * decisions earlier operators compute — the deduplicated corpus, the
  * decontaminated corpus, the quality-gated corpus, token-budget shard
  * assignments, and a k-means refinement step over the embedding
  * index. Together with the round-4 curation surface these are the
  * last mile of a training-data build: not "which docs are dups /
  * contaminated / low-quality" but the surviving corpus itself.
  * All oracle-checked against DuckDB.
  */
object PipelineQueries {

  private def docs(s: SparkSession, dir: String) = Tables.documents(s, dir)
  private def emb(s: SparkSession, dir: String) = Tables.embeddings(s, dir)

  // q67 — the DEDUPLICATED CORPUS: shingle-MinHash near-dup clusters
  // (q48's LSH + connected components) reduced to their min-id
  // canonical survivor, joined back to the document table — the frame
  // a pipeline actually writes out after dedup. Same plan as q48 plus
  // one broadcast-eligible semi-join; the oracle recomputes the
  // clusters from exact brute-force shingle pairs with a recursive
  // label-propagation CTE and keeps cluster representatives.
  private def q67(s: SparkSession, dir: String): DataFrame = {
    val (sets, setPairs) = NearDup.minHashSetPairs(docs(s, dir), "doc_id",
      TextAnalysis.shingles(TextAnalysis.wordTokens(col("text")), 3),
      numHashes = 128, bands = 32, threshold = 0.8)
    val assigned = graft.operators.ConnectedComponents.dedupAssignmentBySets(sets, setPairs)
    docs(s, dir)
      .join(assigned.filter(col("is_canonical")).select(col("doc_id"), col("cluster_size")),
        Seq("doc_id"))
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"), col("cluster_size"))
  }

  /** Planted benchmark passage for q68 — out-of-vocabulary words so
    * its 8-grams cannot occur naturally in the synthetic corpus. */
  private[queries] val BenchPassage =
    "zulu yankee xray whiskey victor uniform tango sierra romeo quebec papa oscar"

  // q68 — the DECONTAMINATED CORPUS: drop every candidate doc sharing
  // ANY distinct word-8-gram with the benchmark set (docs with
  // doc_id % 97 == 0) — the remove-on-overlap rule evaluation suites
  // apply. The raw corpus has zero natural 8-gram overlap (verified at
  // sf0.01), so contamination is PLANTED deterministically: docs with
  // doc_id % 13 == 0 get a fixed out-of-vocab passage appended, and
  // doc 0 (both % 13 and % 97) carries it into the benchmark gram set
  // — ground truth is known on both engines. Plan shape is q60's:
  // benchmark grams broadcast, corpus-side probe map-side, one per-doc
  // count shuffle, then a broadcast-eligible join back to documents.
  private def q68(s: SparkSession, dir: String): DataFrame = {
    val injected = when(col("doc_id") % 13 === 0,
      concat(col("text"), lit(" " + BenchPassage))).otherwise(col("text"))
    val grams = docs(s, dir)
      .select(col("doc_id"), TextAnalysis.wordTokens(injected).as("words"))
      .select(col("doc_id"), explode(CurationQueries.ngrams(col("words"), 8)).as("gram"))
    val bench = grams.filter(col("doc_id") % 97 === 0).select(col("gram")).distinct()
    val scored = grams.filter(col("doc_id") % 97 =!= 0)
      .join(broadcast(bench.withColumn("hit", lit(1))), Seq("gram"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"), count(col("hit")).as("n_hit"))
    // left join + coalesce: a doc with < 8 words has NO grams and must
    // survive (nothing to overlap), not vanish from the output
    docs(s, dir).filter(col("doc_id") % 97 =!= 0)
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"), col("lang"), col("n_chars"))
      .filter(col("n_hit") === 0)
      .drop("n_hit")
  }

  // q69 — the QUALITY GATE: Gopher-style keep/drop decision per doc
  // from three repetition/length signals — token count in range,
  // duplicate-2-gram fraction, top-word mass. Signals are integer
  // ratios (bitwise identical cross-engine; threshold compares are
  // exact, no rounding needed). The only shuffle is the per-(doc,word)
  // partial count agg for the top word; everything else is map-side
  // array arithmetic. Thresholds chosen so every signal discriminates
  // on this corpus (sf0.01: 457/491/409 pass individually, 389 keep).
  private def q69(s: SparkSession, dir: String): DataFrame = {
    val words = col("words") // materialized attribute — see CurationQueries.ngrams note
    val idx = when(size(words) >= 2, sequence(lit(1), size(words) - lit(1)))
      .otherwise(array().cast("array<int>"))
    val base = docs(s, dir)
      .select(col("doc_id"), TextAnalysis.wordTokens(col("text")).as("words"))
      .filter(size(col("words")) >= 2)
      .withColumn("grams", transform(idx, i => concat_ws(" ", slice(words, i, lit(2)))))
    val perDoc = base.select(col("doc_id"), size(col("words")).cast("long").as("n_tokens"),
      ((size(col("grams")) - size(array_distinct(col("grams")))).cast("double")
        / size(col("grams"))).as("dup2"))
    val topWord = base
      .select(col("doc_id"), explode(col("words")).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(max(col("c")).as("mc"))
    perDoc.join(topWord, Seq("doc_id"))
      .withColumn("twf", col("mc").cast("double") / col("n_tokens"))
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") >= 20).as("len_ok"),
        (col("dup2") <= 0.10).as("rep_ok"),
        (col("twf") <= 0.12).as("top_ok"),
        (col("n_tokens") >= 20 && col("dup2") <= 0.10 && col("twf") <= 0.12).as("keep"))
  }

  // q70 — TOKEN-BUDGET SHARD PACKING: docs in doc_id order are packed
  // into shards of ~20k tokens — the step that turns a curated corpus
  // into training shards. A global running sum is inherently
  // sequential, so the scalable form is the TWO-LEVEL prefix sum:
  // per-range-bucket token totals (one tiny aggregate), exclusive
  // prefix over the bucket totals (a window over |buckets| rows, not
  // |docs|), broadcast back, and a per-bucket running sum that
  // parallelizes across buckets. No stage ever sorts more than one
  // bucket on one task — the pattern that survives 100 TB, vs. the
  // single-reducer global window the oracle is free to use.
  private def q70(s: SparkSession, dir: String): DataFrame = {
    val budget = 20000L
    val bucketWidth = 256L
    val d = docs(s, dir).select(col("doc_id"),
      size(TextAnalysis.wordTokens(col("text"))).cast("long").as("n_tokens"))
    val b = d.withColumn("bkt", floor(col("doc_id") / bucketWidth).cast("long"))
    val offs = b.groupBy(col("bkt")).agg(sum(col("n_tokens")).as("bt"))
      .withColumn("off", coalesce(sum(col("bt")).over(
        Window.orderBy(col("bkt")).rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("bkt"), col("off"))
    b.join(broadcast(offs), Seq("bkt"))
      .withColumn("cum_tokens", col("off") + sum(col("n_tokens")).over(
        Window.partitionBy(col("bkt")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      // a doc belongs to the shard its FIRST token lands in
      .withColumn("shard_id",
        floor((col("cum_tokens") - col("n_tokens")).cast("double") / budget).cast("long"))
      .select(col("doc_id"), col("n_tokens"), col("cum_tokens"), col("shard_id"))
  }

  // q71 — K-MEANS REFINEMENT STEP over the embedding index: start from
  // the per-label centroids (q37's coarse quantizer), reassign every
  // vector to its nearest centroid by ROUNDED cosine (the q37 trick —
  // centroid means are float sums whose low bits vary with partition
  // layout/engine; 1e-4 rounding with bucket-id tiebreak makes the
  // argmin reproducible), and report the migration. Centroids are
  // broadcast; the argmin is a min_by partial agg (map-side, no
  // window) — the Lloyd-iteration dataflow at 100 TB where only the
  // tiny centroid table ever crosses the cluster.
  private def q71(s: SparkSession, dir: String): DataFrame =
    Similarity.lloydStep(emb(s, dir), "vec_id", "embedding", "label")
      .select(col("id").as("vec_id"), col("old_bucket"), col("bucket").as("new_bucket"),
        (col("bucket") =!= col("old_bucket")).as("moved"), col("sim"))

  // q72 — CLUSTER EXEMPLARS: after the Lloyd reassignment, the 5
  // vectors nearest each refined centroid — the per-cluster
  // representatives a curation pipeline inspects (or samples around).
  // The per-cluster top-k runs on the bounded-heap aggregate keyed by
  // CLUSTER (same partial-agg property as the query-keyed top-k: each
  // map partition reduces to <= k rows per cluster before the
  // exchange — no cluster's full membership ever sorts on one task).
  private def q72(s: SparkSession, dir: String): DataFrame = {
    val a = Similarity.lloydStep(emb(s, dir), "vec_id", "embedding", "label")
    a.groupBy(col("bucket"))
      .agg(graft.functions.BoundedTopK.column(
        struct((-col("sim")).as("ns"), col("id")), struct(col("id"), col("sim")), 5).as("__top"))
      .select(col("bucket"), posexplode(col("__top")).as(Seq("__pos", "__p")))
      .select(col("bucket"), col("__p.id").as("vec_id"), col("__p.sim").as("sim"),
        (col("__pos") + 1).cast("long").as("rnk"))
  }

  // q73 — WINNOWING FINGERPRINTS (Schleimer et al., the MOSS
  // algorithm): per doc, polynomial-hash every 8-byte gram, slide a
  // 4-hash window and keep each window's MIN — a position-robust
  // fingerprint subset that two documents sharing any sufficiently
  // long substring are GUARANTEED to sample identically (contrast
  // q65's 64-char aligned blocks, which an insertion anywhere
  // upstream shifts out of alignment). Cross-doc repeated
  // fingerprints then localize shared substrings. The
  // hash+window-min+distinct chain is ONE codegen'd expression
  // (graft.functions.Winnow) — a single O(n) long-arithmetic pass,
  // replacing the earlier per-position md5 + hex-string array_min
  // HOFs (the fold h=(h*257+byte)%1e9+7 stays DuckDB-expressible via
  // list_reduce, so the oracle remains strict).
  private def q73(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"),
        explode(graft.functions.Winnow.column(col("text"), gramBytes = 8, window = 4)).as("fp"))
      .groupBy(col("fp"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"))
      .filter(col("n_docs") > 1)

  // q74 — MIXTURE SAMPLING to a per-source token budget: docs in
  // doc_id order per source accumulate tokens until the source's
  // budget is reached (kept while the running total BEFORE the doc is
  // under budget — every source gets at least one doc). The running
  // sum is a window partitioned by SOURCE, so it parallelizes across
  // sources — per-group sequential scan is the correct scale shape
  // (groups are the parallelism unit; no global order exists).
  private def q74(s: SparkSession, dir: String): DataFrame = {
    val budget = 1000L
    docs(s, dir)
      .select(col("doc_id"), col("source"),
        size(TextAnalysis.wordTokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(
        Window.partitionBy(col("source")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("cum_tokens") - col("n_tokens") < budget)
  }

  // q140 — SEQUENCE PACKING (concat-and-chunk): lay the corpus's
  // token stream end to end in doc_id order and cut it into
  // fixed-length training sequences of L=2048 — the GPT-style
  // pretraining prep that q70's whole-doc sharding stops short of: a
  // doc whose span crosses a cut boundary contributes to EVERY
  // sequence it overlaps (one row per (doc, seq) with the exact token
  // count landing there), which is what an attention-mask builder
  // consumes. Scale shape: the global token offset is the q70
  // two-level prefix sum (per-bucket totals -> |buckets|-row
  // exclusive window -> broadcast back; no global sort, no
  // single-task window); the boundary fan-out is a map-side
  // sequence() explode bounded by ceil(n_tokens/L)+1 per doc.
  /** The q140 packing core over any (doc_id, n_tokens) frame — also
    * the last stage of the composed training build (q152). */
  private[queries] def packSequences(d: DataFrame, seqLen: Long, bucketWidth: Long): DataFrame = {
    val b = d.filter(col("n_tokens") > 0)
      .withColumn("bkt", floor(col("doc_id") / bucketWidth).cast("long"))
    val offs = b.groupBy(col("bkt")).agg(sum(col("n_tokens")).as("bt"))
      .withColumn("off", coalesce(sum(col("bt")).over(
        Window.orderBy(col("bkt")).rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("bkt"), col("off"))
    b.join(broadcast(offs), Seq("bkt"))
      .withColumn("end_tok", col("off") + sum(col("n_tokens")).over(
        Window.partitionBy(col("bkt")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("start_tok", col("end_tok") - col("n_tokens"))
      .withColumn("seq_id", explode(sequence(
        expr(s"start_tok DIV $seqLen"), expr(s"(end_tok - 1) DIV $seqLen"))))
      .select(col("doc_id"), col("n_tokens"), col("seq_id"),
        (least(col("end_tok"), (col("seq_id") + 1) * seqLen)
          - greatest(col("start_tok"), col("seq_id") * seqLen)).as("n_in_seq"))
  }

  private def q140(s: SparkSession, dir: String): DataFrame =
    packSequences(docs(s, dir).select(col("doc_id"),
      size(TextAnalysis.wordTokens(col("text"))).cast("long").as("n_tokens")),
      seqLen = 2048L, bucketWidth = 256L)

  // q152 — THE COMPOSED TRAINING-DATA BUILD: raw corpus → exact dedup
  // (q20's min-id-per-content-hash rule) → quality gate (≥20 tokens)
  // → DSIR importance selection (q141: src0 is the target; raw-pool
  // docs keep iff their summed log-likelihood ratio > 0; target docs
  // ride through) → temperature-scaled mixture (q143's α=1/2 sqrt
  // rates, derived from the SURVIVOR histogram) → L=2048 sequence
  // packing (q140). Every stage is an already-oracled primitive; the
  // point of declaring the COMPOSITION is that it runs as ONE
  // Catalyst plan — the optimizer sees dedup survivors feed the
  // model build, prunes columns across stage boundaries, and the
  // only corpus-sized shuffles are the content-hash aggregate, the
  // bigram→slot aggregate, and the packing's bucket windows: the
  // end-to-end shape a 100 TB pretraining build actually runs,
  // not five separate jobs materializing intermediate tables.
  private def q152(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.{Dsir, Sampling}
    val d0 = docs(s, dir).select(col("doc_id"), col("source"), col("text"))
    val firsts = d0.groupBy(md5(col("text")).as("h")).agg(min(col("doc_id")).as("doc_id"))
    val d2 = d0.join(firsts.select(col("doc_id")), Seq("doc_id"))
      .withColumn("n_tokens", size(TextAnalysis.wordTokens(col("text"))).cast("long"))
      .filter(col("n_tokens") >= 20)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val scored = Dsir.modelAndScore(Dsir.slots(
      d2.select(col("doc_id"), (col("source") === "src0").as("is_t"), col("text")),
      col("doc_id"), col("text"), keep = Seq("is_t")))
    val d3 = d2.filter(col("source") === "src0")
      .unionByName(d2.join(
        scored.filter(col("keep")).select(col("id").as("doc_id")), Seq("doc_id"), "left_semi"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = d3.groupBy(col("source")).agg(count(lit(1)).as("n_src"))
    val rates = counts.crossJoin(broadcast(counts.agg(min(col("n_src")).as("n_min"))))
      .withColumn("rate", sqrt(col("n_min").cast("double") / col("n_src").cast("double")))
      .select(col("source"), col("rate"))
    val d4 = d3.join(broadcast(rates), Seq("source"))
      .filter(Sampling.unitHash(col("doc_id")) < col("rate"))
    packSequences(d4.select(col("doc_id"), col("n_tokens")), seqLen = 2048L, bucketWidth = 256L)
  }

  // q139 — LANGUAGE-MIXTURE REBALANCING: resample the corpus to a
  // BALANCED per-language mix where the rates are DERIVED from the
  // corpus itself — the composition q74/q94 stop short of: q74 takes
  // a given budget, q94 a given rate formula; a real pretraining-mix
  // build first MEASURES the distribution (here over the LEARNED
  // language, q25's lang-id, not a trusted label), derives
  // keep-rate(lang) = min(1, (N/|langs|)/N_lang), and then applies
  // the q94 primitive (deterministic unit-hash Bernoulli, pure
  // map-side). Scale shape: one partial-agg shuffle for the language
  // histogram (|langs| rows), a 1-row total, both broadcast back onto
  // the scan — the filter itself never shuffles. Two corpus passes
  // total (the histogram must exist before the filter can run); each
  // is map-side and scan-bound at any volume. The filter compares the
  // EXACT rate (two IEEE divisions both engines replay); r4 only
  // rounds the REPORTED rate.
  private def q139(s: SparkSession, dir: String): DataFrame = {
    // round-16: langId is heavy per-row work fused into a scan stage
    // whose task count is row-group-bound (the documents file is ONE
    // row group — the whole classify pass ran single-task); the
    // adaptive fan-out (no-op at real scale) spreads it over the
    // session's cores. Both consumers (rate table + the final join)
    // reuse the fan-out exchange, so the scan still happens once.
    val langed = graft.operators.Skew.fanOut(docs(s, dir))
      .select(col("doc_id"), TextAnalysis.langId(col("text")).as("pred_lang"))
    val counts = langed.groupBy(col("pred_lang")).agg(count(lit(1)).as("n_lang"))
    val totals = counts.agg(sum(col("n_lang")).as("n_total"), count(lit(1)).as("n_langs"))
    val rates = counts.crossJoin(broadcast(totals))
      .withColumn("rate", least(lit(1d),
        col("n_total").cast("double") / col("n_langs") / col("n_lang")))
      .select(col("pred_lang"), col("n_lang"), col("rate"))
    langed.join(broadcast(rates), Seq("pred_lang"))
      .filter(graft.functions.Sampling.unitHash(col("doc_id")) < col("rate"))
      .select(col("doc_id"), col("pred_lang"), col("n_lang"), r4(col("rate")).as("rate"))
  }

  // q151 — SEMANTIC DECONTAMINATION (the embedding-space complement
  // of q60/q68's n-gram rule): corpus vectors too close in cosine to
  // ANY held-out eval vector are flagged — paraphrased benchmark
  // leakage that shares no 8-gram survives the lexical gate but not
  // this one. Every 10th vec_id plays the eval set (q66's split
  // convention). Output per flagged corpus vector: hit count and the
  // closest eval vector (max cos, min eval id on ties — min_by on a
  // (-cos, id) struct, no window sort). Scale shape: eval sets are
  // tiny by construction, so the eval side BROADCASTS and the corpus
  // is touched once map-side (q28's scorer); the only shuffle is the
  // per-corpus-vector aggregate of the ≥τ hits. At real volume the
  // scorer swaps for IVF/PQ serving (q118/q138) unchanged.
  private def q151(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val evalSet = e.filter(col("vec_id") % 10 === 0)
    val corpus = e.filter(col("vec_id") % 10 =!= 0)
    Similarity.scoreAll(evalSet, corpus, "vec_id", "embedding")
      .withColumn("cos_r", r4(col("cos"))).drop("cos")
      .filter(col("cos_r") >= lit(0.3))
      .groupBy(col("neighbor_id"))
      .agg(count(lit(1)).as("n_hits"),
        min_by(struct(col("query_id"), col("cos_r")),
          struct((-col("cos_r")).as("nc"), col("query_id"))).as("t"))
      .select(col("neighbor_id").as("corpus_id"), col("n_hits"),
        col("t.query_id").as("eval_id"), col("t.cos_r").as("cos"))
  }

  // q143 — TEMPERATURE-SCALED MIXTURE SAMPLING (the α-sampling of
  // multilingual pretraining, XLM-R / mT5 recipe): up-weight small
  // sources relative to proportional sampling by flattening the
  // source distribution with exponent α. At α = 1/2 the per-doc
  // keep-rate normalized so the SMALLEST source keeps everything is
  // rate(src) = sqrt(n_min / n_src) — and because IEEE sqrt and
  // division are correctly rounded, the rate is BITWISE identical
  // across engines (the reason α = 1/2 is the declared setting: a
  // pow(q, α-1) rate would hang cross-engine equality on libm
  // last-ulp agreement; the q81 rule — transcendental once, then
  // exact — specializes here to "use the algebraic exponent").
  // Completes the mixture family: q74 budget-given, q94 rate-given,
  // q139 balance-derived, q143 temperature-derived. Scale shape:
  // identical to q139 — one |sources|-row histogram broadcast back
  // onto the scan, the keep decision a pure map-side deterministic
  // Bernoulli (q94 primitive); the filter never shuffles.
  private def q143(s: SparkSession, dir: String): DataFrame = {
    val counts = docs(s, dir).groupBy(col("source")).agg(count(lit(1)).as("n_src"))
    val minc = counts.agg(min(col("n_src")).as("n_min"))
    val rates = counts.crossJoin(broadcast(minc))
      .withColumn("rate", sqrt(col("n_min").cast("double") / col("n_src").cast("double")))
      .select(col("source"), col("n_src"), col("rate"))
    docs(s, dir).select(col("doc_id"), col("source"))
      .join(broadcast(rates), Seq("source"))
      .filter(graft.functions.Sampling.unitHash(col("doc_id")) < col("rate"))
      .select(col("doc_id"), col("source"), col("n_src"), r4(col("rate")).as("rate"))
  }

  // q145 — DETERMINISTIC EPOCH SHUFFLE (training-order assignment):
  // each epoch permutes the corpus by a seeded multiplicative hash
  // and every doc gets its GLOBAL position in that permutation plus
  // a round-robin shard — the reader-side ordering a pretraining run
  // consumes (shuffled each epoch, reproducible across restarts, no
  // rand()). The position comes from ChunkedFrame.globalRank keyed
  // on the epoch with the hash's high bits as the chunk: parallelism
  // scales with volume/chunkWidth, not epoch count — a bare
  // row_number() OVER (PARTITION BY epoch ORDER BY h) would sort
  // each epoch's entire corpus in ONE task (the q108/q109 ceiling,
  // which is exactly what this query exists to avoid at 100 TB).
  private def q145(s: SparkSession, dir: String): DataFrame = {
    // seed folds into the id BEFORE the multiply: h = ((id + seed)·A)
    // mod 2^32. Adding the seed AFTER the multiply would be a pure
    // additive shift mod 2^32 — order-preserving except at the single
    // wrap point, i.e. every epoch would replay the SAME permutation
    // (CorpusOpsSpec caught exactly that on the first cut).
    val d = docs(s, dir).select(col("doc_id"))
      .withColumn("epoch", explode(array(lit(1), lit(2))))
      .withColumn("h", pmod(((col("doc_id") + col("epoch") * lit(1000003L)) % lit(2147483648L))
        * lit(2654435761L), lit(4294967296L)))
    graft.operators.ChunkedFrame.globalRank(
        d, "epoch", (col("h") / lit(16777216L)).cast("long"), Seq("h", "doc_id"))
      .select(col("epoch"), col("doc_id"), col("__g").as("pos"),
        (col("__g") % 8).as("shard"))
  }

  // q94 — WEIGHTED DETERMINISTIC SAMPLING: each doc keeps with
  // probability equal to its source's target rate (src0 -> 5% ...
  // src19 -> 100%), decided by comparing the doc's multiplicative-
  // hash uniform draw against the rate — no rand(), so the sample is
  // bitwise reproducible across runs/partitionings/engines, and the
  // decision is a pure map-side filter (zero shuffle at any scale).
  // This is the rate-based mixture primitive (q74 is the budget-based
  // one): hitting per-source token-share targets on a 100 TB corpus
  // without a global pass.
  private def q94(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).withColumn("rate",
      (substring(col("source"), 4, 10).cast("int") + 1).cast("double") / 20.0)
    graft.functions.Sampling.weightedSample(d, col("doc_id"), col("rate"))
      .select(col("doc_id"), col("source"), col("rate"))
  }

  // q119 — DATA-QUALITY CONSTRAINT REPORT (graft.operators.Checks):
  // the declarative load gate a warehouse pipeline runs before a
  // merge — completeness, key uniqueness, ranges, accepted values —
  // compiled into ONE aggregation pass plus one keyed aggregate for
  // the uniqueness check. The driver data is clean by construction,
  // so the report's value here is the CONTRACT (names, counts, pass
  // flags all oracle-checked); ChecksSpec exercises the violation
  // paths on planted dirty rows.
  private def q119(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Checks._
    graft.operators.Checks.report(Tables.lineitem(s, dir), Seq(
      NotNull("l_orderkey"), NotNull("l_returnflag"),
      Unique(Seq("l_orderkey", "l_linenumber")),
      InRange("l_quantity", 1.0, 50.0), InRange("l_discount", 0.0, 0.1),
      InSet("l_returnflag", Seq("A", "N", "R"))))
  }

  // q122 — DISTRIBUTION-DRIFT GATE (Checks.MeanWithin/StddevWithin/
  // QuantileWithin): the reference half of the event feed snapshots
  // its value statistics (decimal-exact mean/stddev, rank-selected
  // median — the Checks.snapshot contract); the second half is
  // PLANTED with a silent unit shift (value*2 + 5 in exact decimal —
  // the upstream bug a row-range check waves through). The gate
  // report must pass the reference frame against its own snapshot and
  // flag all three statistics on the drifted frame. Everything is
  // 1e-4-quantized exact arithmetic, so the verdicts replay in DuckDB.
  private def q122(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Checks
    val ev = Tables.events(s, dir).select(col("ts"), col("value"))
    val cut = lit("2024-01-16").cast("timestamp")
    val ref = ev.filter(col("ts") < cut).select(col("value"))
    val driftedFrame = ev.filter(col("ts") >= cut)
      .select((col("value").cast("decimal(18,4)") * lit(2) + lit(5)).cast("decimal(18,4)")
        .cast("double").as("value"))
    val checks = Checks.driftChecks(Checks.snapshot(ref, Seq("value")), tol = 0.10)
    Checks.report(ref, checks).withColumn("frame", lit("reference"))
      .unionByName(Checks.report(driftedFrame, checks).withColumn("frame", lit("drifted")))
      .select(col("frame"), col("check_name"), col("violations"), col("n_rows"), col("pass"))
  }

  // q136 — MAD ROBUST OUTLIERS per key: median absolute deviation,
  // the robust companion to q122's moment checks — mean/stddev gates
  // are dragged by the very outliers they hunt, while median/MAD have
  // a 50% breakdown point. Both medians are DISCRETE rank selections
  // (the element at rank (n+1) DIV 2 under a deterministic total
  // order — the Checks.QuantileWithin convention), so they are exact
  // decimal values both engines agree on bitwise; the outlier gate
  // |x - med| > 3*MAD is exact decimal arithmetic throughout.
  // Scale shape: NO per-key sort anywhere — both rank selections ride
  // ChunkedFrame.globalRank (keys x value-buckets parallelism), the
  // 5-row median/MAD tables broadcast back, and the final pass is one
  // partial aggregate. A quantile SKETCH (q85) answers the same
  // question approximately in one pass; this is the exact path.
  private def q136(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.ChunkedFrame
    val base = Tables.events(s, dir)
      .select(col("event_id"), col("event_type"),
        col("value").cast("decimal(18,4)").as("vd"))
    val counts = base.groupBy(col("event_type")).agg(count(lit(1)).as("cnt"))
    def rankSelect(df: DataFrame, valCol: String): DataFrame =
      ChunkedFrame.globalRank(df, "event_type", floor(col(valCol)), Seq(valCol, "event_id"))
        .join(broadcast(counts), Seq("event_type"))
        .filter(col("__g") === expr("(cnt + 1) DIV 2 - 1"))
        .select(col("event_type"), col(valCol))
    val med = rankSelect(base, "vd").withColumnRenamed("vd", "med")
    val dev = base.join(broadcast(med), Seq("event_type"))
      .withColumn("ad", abs(col("vd") - col("med")))
    val mad = rankSelect(dev.select(col("event_id"), col("event_type"), col("ad")), "ad")
      .withColumnRenamed("ad", "mad")
    dev.join(broadcast(mad), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(
        min(col("med")).cast("double").as("med"),
        min(col("mad")).cast("double").as("mad"),
        sum(when(col("ad") > col("mad") * 3, 1L).otherwise(0L)).as("n_outliers"),
        count(lit(1)).as("n_rows"))
  }

  // q201 — CONTENT-HASH SPLIT (dedup-safe train/val/test): split
  // assignment hashes the CANONICAL CONTENT fingerprint (q20/q27's
  // whitespace-normalized md5), not the doc id — so byte-identical
  // copies of a document can NEVER straddle train and test (the
  // classic eval-leakage bug an id-hash split like q33 commits
  // whenever the corpus carries duplicates; `moved_docs` counts how
  // many docs the id split would have placed differently). The 60-bit
  // hex prefix rides as a BIGINT through q193's overflow-safe
  // squared-affine mixer (every intermediate < 2^63 — a raw
  // Knuth-multiply of a 60-bit key would overflow, and DuckDB BIGINT
  // overflow is an ERROR, not a wrap). Scale shape: one map pass +
  // one (split, fp)-keyed partial-agg shuffle of 8-byte keys (the
  // q163 hashed-key exchange rule); output is 3 rows at any volume.
  private def q201(s: SparkSession, dir: String): DataFrame = {
    val P = lit(2147483647L)
    val d0 = docs(s, dir)
      .withColumn("fpn",
        conv(substring(TextAnalysis.fingerprint(col("text")), 1, 15), 16, 10).cast("long"))
    val m = col("fpn") % P
    val hb = ((m * m % P * lit(1299721L) + m * lit(7L) + lit(1L)) % P) % 100
    // doc_id reduced mod 2^31 before the multiply (same rule as fpn's
    // mixer and Sampling.hashBucket): a raw multiply wraps in Spark
    // but ERRORS in DuckDB once ids pass ~3.47e9 — the engines would
    // diverge exactly at 100 TB id ranges. No-op for ids < 2^31.
    val ib = (((col("doc_id") % lit(2147483648L)) * lit(2654435761L)) % lit(4294967296L)) % 100
    d0.withColumn("split",
        when(hb < 80, "train").when(hb < 90, "val").otherwise("test"))
      .withColumn("id_split",
        when(ib < 80, "train").when(ib < 90, "val").otherwise("test"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("fpn")).as("n_contents"),
        sum(col("n_chars").cast("long")).as("sum_chars"),
        sum(when(col("id_split") =!= col("split"), 1L).otherwise(0L)).as("moved_docs"))
  }

  // q202 — TOKEN-BUDGET SELECTION: the highest-quality corpus that
  // fits a fixed token budget — docs ranked by the shared q24/q161
  // quality score (quality_fp desc, doc_id tiebreak), kept while the
  // running token total stays within B = 10,000 (whole docs only; a
  // boundary doc that would cross the budget is dropped, not split).
  // The running total is a CORPUS-WIDE prefix sum, and it evaluates
  // through ChunkedFrame.withRunningSum on quality-bucket chunks — a
  // bare ORDER BY over the whole corpus would sort 100 TB in one
  // task (the q109/q178 global-order ceiling); the two-level form
  // keeps parallelism ∝ volume/bucket. Scale shape: the volume-sized
  // work is the scoring scan + the chunked prefix sum; the OUTPUT is
  // bounded by budget/min_tokens rows — volume-independent by
  // construction (a bigger corpus selects better docs, not more).
  private def q202(s: SparkSession, dir: String): DataFrame = {
    val d0 = docs(s, dir).select(
        col("doc_id"), col("source"),
        graft.operators.QualityGate.scoreFp(col("text")).as("quality_fp"),
        size(TextAnalysis.wsTokens(col("text"))).cast("long").as("n_tokens"))
      .filter(col("quality_fp").isNotNull)
      .withColumn("negq", -col("quality_fp"))
      .withColumn("corpus", lit(1))
    val run = graft.operators.ChunkedFrame.withRunningSum(
      d0, keyCol = "corpus", chunk = expr("negq DIV 1000000"),
      orderCols = Seq("negq", "doc_id"), valCol = "n_tokens", outCol = "cum_tokens")
    run.filter(col("cum_tokens") <= 10000L)
      .select(col("doc_id"), col("source"), col("quality_fp"),
        col("n_tokens"), col("cum_tokens"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q201_content_split" -> q201 _,
    "q202_budget_select" -> q202 _,
    "q136_mad_outliers" -> q136 _,
    "q122_drift_gate" -> q122 _,
    "q119_quality_checks" -> q119 _,
    "q94_weighted_sample" -> q94 _,
    "q67_dedup_corpus" -> q67 _,
    "q68_decontaminated" -> q68 _,
    "q69_quality_gate" -> q69 _,
    "q70_token_shards" -> q70 _,
    "q71_kmeans_step" -> q71 _,
    "q72_cluster_exemplars" -> q72 _,
    "q73_winnow_fps" -> q73 _,
    "q74_mixture_sample" -> q74 _,
    "q139_lang_rebalance" -> q139 _,
    "q140_seq_pack" -> q140 _,
    "q143_temp_mixture" -> q143 _,
    "q145_epoch_shuffle" -> q145 _,
    "q151_semantic_decontam" -> q151 _,
    "q152_training_build" -> q152 _
  )

  val oracleSql: Map[String, String] = Map(
    "q201_content_split" ->
      """WITH d AS (
        |  SELECT doc_id, n_chars,
        |    ('0x' || substr(md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))), 1, 15))::BIGINT AS fpn
        |  FROM documents
        |), s AS (
        |  SELECT *,
        |    ((fpn % 2147483647) * (fpn % 2147483647) % 2147483647 * 1299721
        |      + (fpn % 2147483647) * 7 + 1) % 2147483647 % 100 AS hb,
        |    (((doc_id % 2147483648) * 2654435761) % 4294967296) % 100 AS ib
        |  FROM d
        |), t AS (
        |  SELECT fpn, n_chars,
        |    CASE WHEN hb < 80 THEN 'train' WHEN hb < 90 THEN 'val' ELSE 'test' END AS split,
        |    CASE WHEN ib < 80 THEN 'train' WHEN ib < 90 THEN 'val' ELSE 'test' END AS id_split
        |  FROM s
        |)
        |SELECT split, count(*)::BIGINT AS n_docs,
        |  count(DISTINCT fpn)::BIGINT AS n_contents,
        |  sum(n_chars)::BIGINT AS sum_chars,
        |  sum(CASE WHEN id_split <> split THEN 1 ELSE 0 END)::BIGINT AS moved_docs
        |FROM t GROUP BY 1""".stripMargin,
    "q202_budget_select" ->
      """WITH t AS (
        |  SELECT doc_id, source, text,
        |    regexp_extract_all(lower(text), '[a-z0-9]+') AS toks,
        |    regexp_extract_all(text, '[.,;:!?''"()\[\]{}]') AS punct,
        |    len(regexp_extract_all(text, '\S+'))::BIGINT AS n_tokens
        |  FROM documents
        |), m AS (
        |  SELECT doc_id, source, n_tokens,
        |    ln(1 + len(toks)) * (1 - len(punct)::DOUBLE / nullif(length(text), 0))
        |      * (1 - len(list_filter(toks, x -> list_contains(['the','a','an','of','to','and','in','is','for','on','with','that','as','at','by'], x)))::DOUBLE
        |          / nullif(len(toks), 0)) AS q
        |  FROM t
        |), f AS (
        |  SELECT doc_id, source, n_tokens, floor(q * 1e6 + 0.5)::BIGINT AS quality_fp
        |  FROM m WHERE q IS NOT NULL
        |), r AS (
        |  SELECT *, (sum(n_tokens) OVER (ORDER BY quality_fp DESC, doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS cum_tokens
        |  FROM f
        |)
        |SELECT doc_id, source, quality_fp, n_tokens, cum_tokens
        |FROM r WHERE cum_tokens <= 10000""".stripMargin,
    "q136_mad_outliers" ->
      """WITH e AS (
        |  SELECT event_id, event_type, value::DECIMAL(18,4) AS vd FROM events
        |), n AS (
        |  SELECT event_type, count(*) AS cnt FROM e GROUP BY 1
        |), r1 AS (
        |  SELECT event_type, vd,
        |    row_number() OVER (PARTITION BY event_type ORDER BY vd, event_id) AS rn
        |  FROM e
        |), med AS (
        |  SELECT r1.event_type, vd AS med FROM r1 JOIN n USING (event_type)
        |  WHERE rn = (cnt + 1) // 2
        |), d AS (
        |  SELECT e.event_id, e.event_type, abs(e.vd - med) AS ad
        |  FROM e JOIN med USING (event_type)
        |), r2 AS (
        |  SELECT event_type, ad,
        |    row_number() OVER (PARTITION BY event_type ORDER BY ad, event_id) AS rn
        |  FROM d
        |), mad AS (
        |  SELECT r2.event_type, ad AS mad FROM r2 JOIN n USING (event_type)
        |  WHERE rn = (cnt + 1) // 2
        |)
        |SELECT d.event_type, min(med)::DOUBLE AS med, min(mad)::DOUBLE AS mad,
        |  sum(CASE WHEN ad > mad * 3 THEN 1 ELSE 0 END)::BIGINT AS n_outliers,
        |  count(*) AS n_rows
        |FROM d JOIN mad USING (event_type) JOIN med USING (event_type)
        |GROUP BY 1""".stripMargin,
    "q122_drift_gate" ->
      """WITH ref AS (
        |  SELECT value FROM events WHERE ts::TIMESTAMP < TIMESTAMP '2024-01-16'
        |), dr AS (
        |  SELECT ((value::DECIMAL(18,4) * 2 + 5)::DECIMAL(18,4))::DOUBLE AS value
        |  FROM events WHERE ts::TIMESTAMP >= TIMESTAMP '2024-01-16'
        |), rs AS (
        |  SELECT count(*) AS n, sum(value::DECIMAL(18,4)) AS s1,
        |         sum(value::DECIMAL(18,4) * value::DECIMAL(18,4)) AS s2
        |  FROM ref
        |), ds AS (
        |  SELECT count(*) AS n, sum(value::DECIMAL(18,4)) AS s1,
        |         sum(value::DECIMAL(18,4) * value::DECIMAL(18,4)) AS s2
        |  FROM dr
        |), rstat AS (
        |  SELECT n,
        |    floor((s1::DOUBLE / n)*10000 + 0.5)/10000 AS mean,
        |    floor(sqrt(greatest(0, (s2::DOUBLE - (s1::DOUBLE * s1::DOUBLE) / n) / (n - 1)))*10000 + 0.5)/10000 AS sd,
        |    (SELECT value FROM (
        |       SELECT value, row_number() OVER (ORDER BY value) AS rn, count(*) OVER () AS nn
        |       FROM ref) WHERE rn = floor(0.5 * (nn - 1))::BIGINT + 1) AS p50
        |  FROM rs
        |), dstat AS (
        |  SELECT n,
        |    floor((s1::DOUBLE / n)*10000 + 0.5)/10000 AS mean,
        |    floor(sqrt(greatest(0, (s2::DOUBLE - (s1::DOUBLE * s1::DOUBLE) / n) / (n - 1)))*10000 + 0.5)/10000 AS sd,
        |    (SELECT value FROM (
        |       SELECT value, row_number() OVER (ORDER BY value) AS rn, count(*) OVER () AS nn
        |       FROM dr) WHERE rn = floor(0.5 * (nn - 1))::BIGINT + 1) AS p50
        |  FROM ds
        |)
        |SELECT frame, check_name, violations::BIGINT AS violations,
        |  n_rows::BIGINT AS n_rows, violations = 0 AS pass
        |FROM (
        |  SELECT 'reference' AS frame, 'mean_within(value)' AS check_name,
        |    CASE WHEN abs(o.mean - r.mean) <= 0.1 * abs(r.mean) THEN 0 ELSE 1 END AS violations,
        |    o.n AS n_rows
        |  FROM rstat o, rstat r
        |  UNION ALL SELECT 'reference', 'stddev_within(value)',
        |    CASE WHEN abs(o.sd - r.sd) <= 0.1 * abs(r.sd) THEN 0 ELSE 1 END, o.n
        |  FROM rstat o, rstat r
        |  UNION ALL SELECT 'reference', 'quantile_within(value,0.5)',
        |    CASE WHEN abs(o.p50 - r.p50) <= 0.1 * abs(r.p50) THEN 0 ELSE 1 END, o.n
        |  FROM rstat o, rstat r
        |  UNION ALL SELECT 'drifted', 'mean_within(value)',
        |    CASE WHEN abs(o.mean - r.mean) <= 0.1 * abs(r.mean) THEN 0 ELSE 1 END, o.n
        |  FROM dstat o, rstat r
        |  UNION ALL SELECT 'drifted', 'stddev_within(value)',
        |    CASE WHEN abs(o.sd - r.sd) <= 0.1 * abs(r.sd) THEN 0 ELSE 1 END, o.n
        |  FROM dstat o, rstat r
        |  UNION ALL SELECT 'drifted', 'quantile_within(value,0.5)',
        |    CASE WHEN abs(o.p50 - r.p50) <= 0.1 * abs(r.p50) THEN 0 ELSE 1 END, o.n
        |  FROM dstat o, rstat r
        |)""".stripMargin,
    "q119_quality_checks" ->
      """WITH s AS (
        |  SELECT count(*) AS n,
        |    sum(CASE WHEN l_orderkey IS NULL OR l_orderkey::VARCHAR = '' THEN 1 ELSE 0 END) AS v_null_ok,
        |    sum(CASE WHEN l_returnflag IS NULL OR l_returnflag = '' THEN 1 ELSE 0 END) AS v_null_rf,
        |    sum(CASE WHEN l_quantity IS NOT NULL AND l_quantity NOT BETWEEN 1.0 AND 50.0 THEN 1 ELSE 0 END) AS v_rng_qty,
        |    sum(CASE WHEN l_discount IS NOT NULL AND l_discount NOT BETWEEN 0.0 AND 0.1 THEN 1 ELSE 0 END) AS v_rng_disc,
        |    sum(CASE WHEN l_returnflag IS NOT NULL AND l_returnflag NOT IN ('A','N','R') THEN 1 ELSE 0 END) AS v_set_rf
        |  FROM lineitem
        |), u AS (
        |  SELECT count(*) - count(DISTINCT (l_orderkey, l_linenumber)) AS v_uni, count(*) AS n
        |  FROM lineitem
        |)
        |SELECT check_name, violations::BIGINT AS violations, n_rows::BIGINT AS n_rows,
        |  violations = 0 AS pass
        |FROM (
        |  SELECT 'not_null(l_orderkey)' AS check_name, v_null_ok AS violations, n AS n_rows FROM s
        |  UNION ALL SELECT 'not_null(l_returnflag)', v_null_rf, n FROM s
        |  UNION ALL SELECT 'in_range(l_quantity,1.0,50.0)', v_rng_qty, n FROM s
        |  UNION ALL SELECT 'in_range(l_discount,0.0,0.1)', v_rng_disc, n FROM s
        |  UNION ALL SELECT 'in_set(l_returnflag)', v_set_rf, n FROM s
        |  UNION ALL SELECT 'unique(l_orderkey,l_linenumber)', v_uni, n FROM u
        |)""".stripMargin,
    "q140_seq_pack" ->
      """WITH d AS (
        |  SELECT doc_id, len(regexp_extract_all(lower(text), '[a-z0-9]+'))::BIGINT AS n_tokens
        |  FROM documents
        |), nz AS (
        |  SELECT doc_id, n_tokens,
        |    (sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS end_tok
        |  FROM d WHERE n_tokens > 0
        |), sp AS (
        |  SELECT doc_id, n_tokens, end_tok, end_tok - n_tokens AS start_tok FROM nz
        |)
        |SELECT sp.doc_id, sp.n_tokens, g.seq_id,
        |  (least(sp.end_tok, (g.seq_id + 1) * 2048)
        |    - greatest(sp.start_tok, g.seq_id * 2048))::BIGINT AS n_in_seq
        |FROM sp, LATERAL (
        |  SELECT unnest(generate_series(sp.start_tok // 2048, (sp.end_tok - 1) // 2048)) AS seq_id
        |) g""".stripMargin,
    "q139_lang_rebalance" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks,
        |    len(regexp_extract_all(text, '[\x{4e00}-\x{9fff}]')) AS zh
        |  FROM documents
        |), h AS (
        |  SELECT doc_id, zh,
        |    len(list_filter(toks, x -> list_contains(['the','a','is','and','of'], x))) AS en,
        |    len(list_filter(toks, x -> list_contains(['der','die','das','und','ist'], x))) AS de,
        |    len(list_filter(toks, x -> list_contains(['le','la','les','et','est'], x))) AS fr,
        |    len(list_filter(toks, x -> list_contains(['el','los','las','y','es'], x))) AS es
        |  FROM t
        |), p AS (
        |  SELECT doc_id,
        |    CASE WHEN zh > 0 THEN 'zh'
        |         WHEN en >= de AND en >= fr AND en >= es AND en > 0 THEN 'en'
        |         WHEN de >= fr AND de >= es AND de > 0 THEN 'de'
        |         WHEN fr >= es AND fr > 0 THEN 'fr'
        |         WHEN es > 0 THEN 'es'
        |         ELSE 'und' END AS pred_lang
        |  FROM h
        |), c AS (
        |  SELECT pred_lang, count(*)::BIGINT AS n_lang FROM p GROUP BY 1
        |), tt AS (
        |  SELECT sum(n_lang)::BIGINT AS n_total, count(*)::BIGINT AS n_langs FROM c
        |), r AS (
        |  SELECT pred_lang, n_lang,
        |    least(1.0::DOUBLE, n_total::DOUBLE / n_langs / n_lang) AS rate
        |  FROM c CROSS JOIN tt
        |)
        |SELECT p.doc_id, p.pred_lang, r.n_lang,
        |  floor(r.rate * 10000 + 0.5) / 10000 AS rate
        |FROM p JOIN r USING (pred_lang)
        |WHERE (((p.doc_id % 2147483648) * 2654435761) % 4294967296)::DOUBLE / 4294967296.0 < r.rate""".stripMargin,
    "q152_training_build" ->
      """WITH f AS (
        |  SELECT md5(text) AS h, min(doc_id) AS keep_id FROM documents GROUP BY 1
        |), d2 AS (
        |  SELECT d.doc_id, d.source, d.text,
        |    len(regexp_extract_all(lower(d.text), '[a-z0-9]+'))::BIGINT AS n_tokens
        |  FROM documents d JOIN f ON d.doc_id = f.keep_id
        |  WHERE len(regexp_extract_all(lower(d.text), '[a-z0-9]+')) >= 20
        |), base AS (
        |  SELECT doc_id, source = 'src0' AS is_t,
        |    regexp_extract_all(lower(text), '[a-z0-9]+') AS w
        |  FROM d2
        |), bg AS (
        |  SELECT doc_id, is_t, unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS bg
        |  FROM base WHERE len(w) >= 2
        |), sl AS (
        |  SELECT doc_id, is_t,
        |    (((('0x' || substr(md5(bg), 1, 15))::BIGINT % 2147483647) * 1299721 + 7) % 2147483647) % 4096 AS slot
        |  FROM bg
        |), model AS (
        |  SELECT slot,
        |    sum(CASE WHEN is_t THEN 1 ELSE 0 END)::BIGINT AS ct,
        |    sum(CASE WHEN is_t THEN 0 ELSE 1 END)::BIGINT AS cr
        |  FROM sl GROUP BY 1
        |), tot AS (
        |  SELECT sum(ct)::BIGINT AS tt, sum(cr)::BIGINT AS tr FROM model
        |), lam AS (
        |  SELECT slot,
        |    floor(log2((ct + 1)::DOUBLE / (tt + 4096)::DOUBLE) * 1e6 + 0.5)::BIGINT
        |      - floor(log2((cr + 1)::DOUBLE / (tr + 4096)::DOUBLE) * 1e6 + 0.5)::BIGINT AS lam_fp
        |  FROM model CROSS JOIN tot
        |), sc AS (
        |  SELECT s.doc_id FROM sl s JOIN lam l USING (slot)
        |  WHERE NOT s.is_t GROUP BY 1 HAVING sum(l.lam_fp) > 0
        |), d3 AS (
        |  SELECT doc_id, source, n_tokens FROM d2 WHERE source = 'src0'
        |  UNION ALL
        |  SELECT d2.doc_id, d2.source, d2.n_tokens FROM d2 JOIN sc USING (doc_id)
        |), c AS (
        |  SELECT source, count(*)::BIGINT AS n_src FROM d3 GROUP BY 1
        |), m AS (
        |  SELECT min(n_src) AS n_min FROM c
        |), r AS (
        |  SELECT source, sqrt(n_min::DOUBLE / n_src::DOUBLE) AS rate FROM c CROSS JOIN m
        |), d4 AS (
        |  SELECT d3.doc_id, d3.n_tokens FROM d3 JOIN r USING (source)
        |  WHERE (((d3.doc_id % 2147483648) * 2654435761) % 4294967296)::DOUBLE / 4294967296.0 < r.rate
        |), nz AS (
        |  SELECT doc_id, n_tokens,
        |    (sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS end_tok
        |  FROM d4 WHERE n_tokens > 0
        |), sp AS (
        |  SELECT doc_id, n_tokens, end_tok, end_tok - n_tokens AS start_tok FROM nz
        |)
        |SELECT sp.doc_id, sp.n_tokens, g.seq_id,
        |  (least(sp.end_tok, (g.seq_id + 1) * 2048)
        |    - greatest(sp.start_tok, g.seq_id * 2048))::BIGINT AS n_in_seq
        |FROM sp, LATERAL (
        |  SELECT unnest(generate_series(sp.start_tok // 2048, (sp.end_tok - 1) // 2048)) AS seq_id
        |) g""".stripMargin,
    "q151_semantic_decontam" ->
      """WITH q AS (
        |  SELECT vec_id AS eval_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id % 10 = 0
        |), c AS (
        |  SELECT vec_id AS corpus_id, embedding::DOUBLE[] AS cv FROM embeddings WHERE vec_id % 10 <> 0
        |), s AS (
        |  SELECT corpus_id, eval_id,
        |    floor(list_dot_product(qv, cv) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))*10000 + 0.5)/10000 AS cos_r
        |  FROM c, q
        |), f AS (
        |  SELECT * FROM s WHERE cos_r >= 0.3
        |), r AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY corpus_id ORDER BY cos_r DESC, eval_id) AS rn,
        |    count(*) OVER (PARTITION BY corpus_id) AS n_hits
        |  FROM f
        |)
        |SELECT corpus_id, n_hits::BIGINT AS n_hits, eval_id, cos_r AS cos
        |FROM r WHERE rn = 1""".stripMargin,
    "q143_temp_mixture" ->
      """WITH c AS (
        |  SELECT source, count(*)::BIGINT AS n_src FROM documents GROUP BY 1
        |), m AS (
        |  SELECT min(n_src) AS n_min FROM c
        |), r AS (
        |  SELECT source, n_src, sqrt(n_min::DOUBLE / n_src::DOUBLE) AS rate
        |  FROM c CROSS JOIN m
        |)
        |SELECT d.doc_id, d.source, r.n_src,
        |  floor(r.rate * 10000 + 0.5)/10000 AS rate
        |FROM documents d JOIN r USING (source)
        |WHERE (((d.doc_id % 2147483648) * 2654435761) % 4294967296)::DOUBLE / 4294967296.0 < r.rate""".stripMargin,
    "q145_epoch_shuffle" ->
      """WITH d AS (
        |  SELECT doc_id, epoch,
        |    (((doc_id + epoch * 1000003) % 2147483648) * 2654435761) % 4294967296 AS h
        |  FROM documents, unnest([1, 2]) AS t(epoch)
        |), p AS (
        |  SELECT epoch, doc_id,
        |    (row_number() OVER (PARTITION BY epoch ORDER BY h, doc_id) - 1)::BIGINT AS pos
        |  FROM d
        |)
        |SELECT epoch, doc_id, pos, (pos % 8)::BIGINT AS shard FROM p""".stripMargin,
    "q94_weighted_sample" ->
      """SELECT doc_id, source,
        |  (substr(source, 4)::INT + 1)::DOUBLE / 20.0::DOUBLE AS rate
        |FROM documents
        |WHERE (((doc_id % 2147483648) * 2654435761) % 4294967296)::DOUBLE / 4294967296.0
        |    < (substr(source, 4)::INT + 1)::DOUBLE / 20.0::DOUBLE""".stripMargin,
    "q67_dedup_corpus" ->
      """WITH RECURSIVE d AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w FROM documents
        |), sh AS (
        |  SELECT doc_id, list_distinct(
        |    CASE WHEN len(w) <= 3 THEN [array_to_string(w, ' ')]
        |         ELSE list_transform(range(1, len(w) - 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END) AS toks
        |  FROM d
        |), p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE len(list_intersect(a.toks, b.toks))::DOUBLE
        |      / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) >= 0.8
        |), e AS (
        |  SELECT id_a AS src, id_b AS dst FROM p UNION SELECT id_b AS src, id_a AS dst FROM p
        |), lbl(id, l) AS (
        |  SELECT src, src FROM e
        |  UNION
        |  SELECT e.dst, lbl.l FROM lbl JOIN e ON lbl.id = e.src
        |), cc AS (
        |  SELECT id, min(l) AS cluster_id FROM lbl GROUP BY id
        |), assigned AS (
        |  SELECT doc_id, coalesce(cc.cluster_id, doc_id) AS cluster_id
        |  FROM documents LEFT JOIN cc ON doc_id = cc.id
        |), sizes AS (
        |  SELECT cluster_id, count(*)::BIGINT AS cluster_size FROM assigned GROUP BY 1
        |)
        |SELECT a.doc_id, doc.lang, doc.source, doc.n_chars, s.cluster_size
        |FROM assigned a JOIN sizes s USING (cluster_id) JOIN documents doc USING (doc_id)
        |WHERE a.doc_id = a.cluster_id""".stripMargin,
    "q68_decontaminated" ->
      ("""WITH t AS (
        |  SELECT doc_id, lang, n_chars,
        |    CASE WHEN doc_id % 13 = 0 THEN text || ' BP' ELSE text END AS text
        |  FROM documents
        |), w AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS words FROM t
        |), g AS (
        |  SELECT DISTINCT doc_id, array_to_string(words[i:i+7], ' ') AS gram
        |  FROM w, LATERAL (SELECT unnest(generate_series(1, len(words) - 7)) AS i) u
        |  WHERE len(words) >= 8
        |), bg AS (
        |  SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0
        |), sc AS (
        |  SELECT g.doc_id, count(*) AS n_grams, count(bg.gram) AS n_hit
        |  FROM g LEFT JOIN bg ON g.gram = bg.gram
        |  WHERE g.doc_id % 97 <> 0
        |  GROUP BY g.doc_id
        |)
        |SELECT d.doc_id, coalesce(sc.n_grams, 0)::BIGINT AS n_grams, d.lang, d.n_chars
        |FROM documents d LEFT JOIN sc USING (doc_id)
        |WHERE d.doc_id % 97 <> 0 AND coalesce(sc.n_hit, 0) = 0""".stripMargin
        .replace("' BP'", "' " + BenchPassage + "'")),
    "q69_quality_gate" ->
      """WITH w AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS words FROM documents
        |), w2 AS (
        |  SELECT doc_id, words, len(words) AS n FROM w WHERE len(words) >= 2
        |), g AS (
        |  SELECT doc_id, n, list_transform(range(1, n), i -> words[i] || ' ' || words[i+1]) AS grams
        |  FROM w2
        |), pd AS (
        |  SELECT doc_id, n::BIGINT AS n_tokens,
        |    (len(grams) - len(list_distinct(grams)))::DOUBLE / len(grams) AS dup2
        |  FROM g
        |), c AS (
        |  SELECT doc_id, w, count(*) AS c FROM (SELECT doc_id, unnest(words) AS w FROM w2) GROUP BY 1, 2
        |), t AS (
        |  SELECT doc_id, max(c) AS mc FROM c GROUP BY 1
        |)
        |SELECT pd.doc_id, pd.n_tokens,
        |  pd.n_tokens >= 20 AS len_ok,
        |  pd.dup2 <= 0.10 AS rep_ok,
        |  t.mc::DOUBLE / pd.n_tokens <= 0.12 AS top_ok,
        |  (pd.n_tokens >= 20 AND pd.dup2 <= 0.10 AND t.mc::DOUBLE / pd.n_tokens <= 0.12) AS keep
        |FROM pd JOIN t USING (doc_id)""".stripMargin,
    "q70_token_shards" ->
      """WITH d AS (
        |  SELECT doc_id, len(regexp_extract_all(lower(text), '[a-z0-9]+'))::BIGINT AS n_tokens
        |  FROM documents
        |)
        |SELECT doc_id, n_tokens,
        |  (sum(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS cum_tokens,
        |  ((sum(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens) // 20000)::BIGINT AS shard_id
        |FROM d""".stripMargin,
    "q71_kmeans_step" ->
      """WITH e AS (
        |  SELECT vec_id, label::BIGINT AS old_bucket, embedding::DOUBLE[] AS v FROM embeddings
        |), x AS (
        |  SELECT e.old_bucket AS bucket, u.i AS dim, avg(e.v[u.i]) AS m
        |  FROM e, LATERAL (SELECT unnest(generate_series(1, len(e.v))) AS i) u
        |  GROUP BY 1, 2
        |), c AS (
        |  SELECT bucket, list(m ORDER BY dim) AS centroid FROM x GROUP BY 1
        |), s AS (
        |  SELECT e.vec_id, e.old_bucket, c.bucket,
        |    floor((list_dot_product(e.v, c.centroid)
        |      / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.centroid, c.centroid))))*10000 + 0.5)/10000 AS simr
        |  FROM e CROSS JOIN c
        |), r AS (
        |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY simr DESC, bucket) AS rn FROM s
        |)
        |SELECT vec_id, old_bucket, bucket AS new_bucket, bucket <> old_bucket AS moved, simr AS sim
        |FROM r WHERE rn = 1""".stripMargin,
    "q72_cluster_exemplars" ->
      """WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        |), x AS (
        |  SELECT label::BIGINT AS bucket, u.i AS dim, avg(w.v[u.i]) AS m
        |  FROM (SELECT label, embedding::DOUBLE[] AS v FROM embeddings) w,
        |       LATERAL (SELECT unnest(generate_series(1, len(w.v))) AS i) u
        |  GROUP BY 1, 2
        |), c AS (
        |  SELECT bucket, list(m ORDER BY dim) AS centroid FROM x GROUP BY 1
        |), s AS (
        |  SELECT e.vec_id, c.bucket,
        |    floor((list_dot_product(e.v, c.centroid)
        |      / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.centroid, c.centroid))))*10000 + 0.5)/10000 AS simr
        |  FROM e CROSS JOIN c
        |), r AS (
        |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY simr DESC, bucket) AS rn FROM s
        |), a AS (
        |  SELECT vec_id, bucket, simr FROM r WHERE rn = 1
        |), t AS (
        |  SELECT *, row_number() OVER (PARTITION BY bucket ORDER BY simr DESC, vec_id) AS rnk FROM a
        |)
        |SELECT bucket, vec_id, simr AS sim, rnk::BIGINT AS rnk FROM t WHERE rnk <= 5""".stripMargin,
    "q73_winnow_fps" ->
      // byte-exact parity with the engine's UTF-8-byte gram hash:
      // decode bytes from hex(encode(text)) two nibbles at a time,
      // then fold each 8-byte gram with the same h=(h*257+b)%1e9+7
      // (fold-from-first == fold-from-zero since byte0 < mod).
      """WITH b AS (
        |  SELECT doc_id,
        |    list_transform(regexp_extract_all(hex(encode(text)), '..'),
        |      h -> (strpos('0123456789ABCDEF', h[1]) - 1) * 16
        |         + (strpos('0123456789ABCDEF', h[2]) - 1)) AS bs
        |  FROM documents
        |), g AS (
        |  SELECT doc_id,
        |    CASE WHEN len(bs) >= 8
        |      THEN list_transform(range(1, len(bs) - 6),
        |             i -> list_reduce(bs[i:i+7], (a, x) -> (a * 257 + x) % 1000000007))
        |      ELSE []::BIGINT[] END AS grams
        |  FROM b
        |), f AS (
        |  SELECT doc_id,
        |    CASE WHEN len(grams) >= 4
        |      THEN list_distinct(list_transform(range(1, len(grams) - 2), j -> list_min(grams[j:j+3])))
        |      WHEN len(grams) > 0 THEN [list_min(grams)]
        |      ELSE []::BIGINT[] END AS fps
        |  FROM g
        |), e AS (
        |  SELECT doc_id, unnest(fps) AS fp FROM f
        |)
        |SELECT fp, count(*)::BIGINT AS n_docs, min(doc_id) AS first_doc
        |FROM e GROUP BY 1 HAVING count(*) > 1""".stripMargin,
    "q74_mixture_sample" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |    len(regexp_extract_all(lower(text), '[a-z0-9]+'))::BIGINT AS n_tokens
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, source, n_tokens,
        |    (sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS cum_tokens
        |  FROM d
        |)
        |SELECT doc_id, source, n_tokens, cum_tokens
        |FROM c WHERE cum_tokens - n_tokens < 1000""".stripMargin
  )
}
