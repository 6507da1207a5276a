package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.TextAnalysis

/** Round-4 data-curation surface: benchmark-contamination checking,
  * PII redaction, corpus-mixture statistics, and bigram language-model
  * scoring — the remaining ops a training-data pipeline runs between
  * dedup and export. All oracle-checked against DuckDB.
  */
object CurationQueries {

  private def docs(s: SparkSession, dir: String) = Tables.documents(s, dir)

  /** See [[TextAnalysis.distinctNgrams]] (moved there in round 5 so
    * the streaming contamination gate can share it). */
  private[queries] def ngrams(words: Column, k: Int): Column =
    TextAnalysis.distinctNgrams(words, k)

  // q60 — benchmark-contamination check: every candidate document is
  // scored by how many of its distinct word-8-grams appear anywhere in
  // a "benchmark" set (docs with doc_id % 97 == 0 stand in for a
  // held-out eval set). The benchmark gram set is orders of magnitude
  // smaller than the corpus — BROADCAST it, so the scan-side work is
  // an in-memory hash probe per gram and the only shuffle is the
  // per-doc count aggregation. At 100 TB the gram strings would ride
  // as xxhash64 longs instead (same plan shape); strings are kept here
  // for oracle parity.
  // q114 — TRAIN/EVAL SPLIT DECONTAMINATION: q60's 8-gram overlap
  // check, but the reference set is the TRAIN SPLIT of the same
  // corpus (Sampling.split's deterministic id hash) instead of a
  // tiny benchmark table — "did any eval document leak into
  // training" asked the direction an LLM pipeline audits its held-out
  // sets. Scale shape deliberately differs from q60: the train gram
  // set is 80% of the corpus, NOT broadcastable, so eval grams (20%)
  // shuffle-join train grams on the gram key — one exchange each
  // side, both pruned map-side to distinct (doc, gram) first. Docs
  // under 8 tokens have no grams and are out of scope on both sides
  // (q60's contract).
  /** q114's core with the grams-as-hashes switch (the q163
    * noveltyProfile twin): the corpus-sized train-gram distinct AND
    * the eval-vs-train join both key on grams, and at the 100x probe
    * string keys cost 30-50x over 8-byte xxhash64 keys on this
    * machine (measured on q163's identical exchange). The declared
    * query keeps strings (oracle replay); CorpusOpsSpec pins
    * hashed ≡ string on both testdata corpora. */
  private[graft] def splitDecontam(d0: DataFrame, hashedGrams: Boolean): DataFrame = {
    val d = graft.functions.Sampling.split(
      d0.select(col("doc_id"),
        TextAnalysis.wordTokens(col("text")).as("words")), col("doc_id"))
    val grams = d.select(col("doc_id"), col("split"),
        explode(ngrams(col("words"), 8)).as("g0"))
      .select(col("doc_id"), col("split"),
        (if (hashedGrams) xxhash64(col("g0")) else col("g0")).as("gram"))
    val trainGrams = grams.filter(col("split") === "train")
      .select(col("gram")).distinct().withColumn("hit", lit(1))
    grams.filter(col("split") =!= "train")
      .join(trainGrams, Seq("gram"), "left")
      .groupBy(col("doc_id"), col("split"))
      .agg(count(lit(1)).as("n_grams"), count(col("hit")).as("n_hit"))
      .withColumn("leaked", col("n_hit") > 0)
  }

  private def q114(s: SparkSession, dir: String): DataFrame =
    splitDecontam(docs(s, dir), hashedGrams = false)

  private def q60(s: SparkSession, dir: String): DataFrame = {
    val grams = docs(s, dir)
      .select(col("doc_id"), TextAnalysis.wordTokens(col("text")).as("words"))
      .select(col("doc_id"), explode(ngrams(col("words"), 8)).as("gram"))
    val bench = grams.filter(col("doc_id") % 97 === 0).select(col("gram")).distinct()
    grams.filter(col("doc_id") % 97 =!= 0)
      .join(broadcast(bench.withColumn("hit", lit(1))), Seq("gram"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"), count(col("hit")).as("n_hit"))
      .withColumn("ratio", col("n_hit").cast("double") / col("n_grams"))
  }

  // q61 — PII detection + redaction: e-mail / phone patterns counted
  // and replaced, the redacted text fingerprinted (md5 — identical
  // hex on both engines) so the oracle verifies the full redacted
  // string without hauling it through the compare. The corpus is
  // synthetic and PII-free, so deterministic PII is injected first
  // (every 7th doc an e-mail, every 11th a phone) — the operator is
  // exercised on known ground truth. Pure per-row codegen'd column
  // ops: no shuffle at any scale.
  private def q61(s: SparkSession, dir: String): DataFrame = {
    val injected = concat(
      col("text"),
      when(col("doc_id") % 7 === 0, concat(lit(" contact u"), col("doc_id"), lit("@example.com"))).otherwise(lit("")),
      when(col("doc_id") % 11 === 0, concat(lit(" call 555-"), lpad(col("doc_id") % 10000, 4, "0"))).otherwise(lit("")))
    val emailPat = "[a-z0-9._]+@[a-z0-9.-]+\\.[a-z][a-z]+"
    val phonePat = "[0-9]{3}-[0-9]{4}"
    val redacted = regexp_replace(regexp_replace(injected, emailPat, "<EMAIL>"), phonePat, "<PHONE>")
    docs(s, dir).select(
      col("doc_id"),
      size(regexp_extract_all(injected, lit(emailPat), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(injected, lit(phonePat), lit(0))).cast("long").as("n_phones"),
      length(redacted).cast("long").as("n_chars_redacted"),
      md5(redacted).as("redacted_fp"))
  }

  // q62 — corpus-mixture statistics: per (lang, source) document and
  // token totals plus corpus share and cumulative share in token-count
  // order — the table a data-mixing decision reads. One partial-agg
  // shuffle to ~|lang|×|source| rows; the windows run on the tiny
  // aggregate. Shares are integer-ratio doubles (bitwise identical
  // cross-engine, no rounding needed).
  private def q62(s: SparkSession, dir: String): DataFrame = {
    val agg = docs(s, dir)
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(TextAnalysis.wordTokens(col("text"))).cast("long")).as("n_tokens"))
    val ord = Window.orderBy(col("n_tokens").desc, col("lang"), col("source"))
    agg
      .withColumn("total", sum(col("n_tokens")).over(Window.partitionBy()))
      .withColumn("cum_tokens",
        sum(col("n_tokens")).over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("lang"), col("source"), col("n_docs"), col("n_tokens"),
        (col("n_tokens").cast("double") / col("total")).as("share"),
        (col("cum_tokens").cast("double") / col("total")).as("cum_share"))
  }

  // q63 — bigram language model: corpus bigram counts, context counts
  // derived from the SAME bigram table (sum over w1 — no second corpus
  // pass), conditional probability, top-50. The heavy stage is one
  // explode + partial-agg shuffle keyed on the bigram; TakeOrdered
  // handles the top-k without a global sort.
  private def q63(s: SparkSession, dir: String): DataFrame = {
    val words = col("words") // materialized attribute — see ngrams() note
    val idx = when(size(words) >= 2, sequence(lit(1), size(words) - lit(1)))
      .otherwise(array().cast("array<int>"))
    val bigram = docs(s, dir)
      .select(TextAnalysis.wordTokens(col("text")).as("words"))
      .select(explode(
        transform(idx, i => struct(element_at(words, i).as("w1"), element_at(words, i + 1).as("w2")))).as("b"))
    val counts = bigram.groupBy(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .agg(count(lit(1)).as("c2"))
    counts
      .withColumn("c1", sum(col("c2")).over(Window.partitionBy(col("w1"))))
      .withColumn("p", col("c2").cast("double") / col("c1"))
      .orderBy(col("c2").desc, col("w1"), col("w2"))
      .limit(50)
  }

  // q64 — repetition quality signals (the Gopher-style filters): per
  // doc, the fraction of word-2-grams that are repeats and the mass of
  // the single most frequent word. The 2-gram fraction is pure
  // map-side array arithmetic; the top-word pass is one explode +
  // partial-agg shuffle keyed on (doc, word) then a min_by per doc
  // (ordering key struct(-count, word): largest count, smallest word
  // on ties — no window, no sort). Integer-ratio doubles throughout.
  private def q64(s: SparkSession, dir: String): DataFrame = {
    val words = col("words")
    val idx = when(size(words) >= 2, sequence(lit(1), size(words) - lit(1)))
      .otherwise(array().cast("array<int>"))
    val base = docs(s, dir)
      .select(col("doc_id"), TextAnalysis.wordTokens(col("text")).as("words"))
      .filter(size(col("words")) >= 2)
      .withColumn("grams", transform(idx, i => concat_ws(" ", slice(words, i, lit(2)))))
    val perDoc = base.select(col("doc_id"), size(col("words")).cast("long").as("n_words"),
      ((size(col("grams")) - size(array_distinct(col("grams")))).cast("double")
        / size(col("grams"))).as("dup_2gram_frac"))
    val topWord = base
      .select(col("doc_id"), explode(col("words")).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(min_by(struct(col("w"), col("c")), struct((-col("c")).as("nc"), col("w"))).as("t"))
      .select(col("doc_id"), col("t.w").as("top_word"), col("t.c").as("top_word_n"))
    perDoc.join(topWord, Seq("doc_id"))
      .withColumn("top_word_frac", col("top_word_n").cast("double") / col("n_words"))
  }

  // q65 — cross-document repeated blocks: 64-char aligned windows of
  // every document, fingerprinted (md5), kept where the same block
  // text appears in more than one document — the aligned-block
  // approximation of substring-level dedup (exact suffix-array dedup
  // is the full version; aligned blocks catch bulk copy-paste mass at
  // a fraction of the cost). Two-level aggregation — (fp, doc) partial
  // then fp — keeps countDistinct out of the heavy pass (a mixed
  // distinct aggregate would force an Expand over every block row).
  private def q65(s: SparkSession, dir: String): DataFrame = {
    val nBlocks = floor(length(col("text")) / lit(64)).cast("int")
    val blocks = docs(s, dir)
      .select(col("doc_id"), col("text"),
        explode(when(nBlocks >= 1, sequence(lit(0), nBlocks - 1))
          .otherwise(array().cast("array<int>"))).as("k"))
      .select(col("doc_id"),
        md5(call_function("substring", col("text"), (col("k") * 64 + 1).cast("int"), lit(64))).as("block_fp"))
    blocks.groupBy(col("block_fp"), col("doc_id")).agg(count(lit(1)).as("occ"))
      .groupBy(col("block_fp"))
      .agg(count(lit(1)).as("n_docs"), sum(col("occ")).as("n_occ"), min(col("doc_id")).as("first_doc"))
      .filter(col("n_docs") > 1)
  }

  // q66 — incremental near-dup (NearDup.minHashProbePairs): every
  // 10th doc plays the incoming batch, the rest the standing corpus;
  // the probe bands join the corpus bands and only probe×corpus pairs
  // are generated/verified — the per-batch dedup a continuously-
  // ingesting pipeline runs. Oracle is the unblocked brute-force
  // jaccard join between the two partitions (knows nothing about
  // LSH); at the default 128/32 geometry (the q22 geometry — 96/24
  // missed a pair at sf0.1, which is why 128/32 was adopted) LSH
  // output is exactly brute force on these corpora (same
  // finite-corpus argument as q22).
  private def q66(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    graft.functions.NearDup.minHashProbePairs(
      d.filter(col("doc_id") % 10 =!= 0), d.filter(col("doc_id") % 10 === 0),
      "doc_id", TextAnalysis.wordTokens(col("text")))
      .select(col("probe_id"), col("corpus_id"), r4(col("jaccard")).as("jaccard"))
  }

  // q91 — CROSS-DOCUMENT BOILERPLATE: word-3-grams occurring in >= 5
  // DISTINCT documents (headers/footers/templates — the shared text a
  // curation pipeline strips before training) and each doc's
  // boilerplate load: total 3-gram positions, positions covered by a
  // boilerplate gram, and the ratio a strip pass would remove. Scale
  // shape: the gram explode is map-side; ONE (gram, doc) partial-agg
  // shuffle builds document frequencies; the df >= 5 table is
  // threshold-pruned to a sliver of the gram space and broadcasts
  // back onto the position stream, so the 100 TB side is touched
  // twice map-side and shuffled once on the final per-doc count.
  private def q91(s: SparkSession, dir: String): DataFrame = {
    // round-16: tokenize + gram explode are heavy per-row work fused
    // into a row-group-bound scan stage (both gram consumers ran
    // single-task); the adaptive fan-out (no-op at real scale)
    // spreads them over the session's cores and both consumers reuse
    // the one exchange
    val toks = graft.operators.Skew.fanOut(docs(s, dir))
      .select(col("doc_id"), TextAnalysis.wordTokens(col("text")).as("w"))
      .filter(size(col("w")) >= 3)
    val grams = toks.select(col("doc_id"),
      explode(expr("transform(sequence(1, size(w) - 2), i -> concat_ws(' ', slice(w, i, 3)))")).as("gram"))
    val boiler = grams.groupBy(col("gram"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= 5)
    grams
      .join(broadcast(boiler.select(col("gram"), lit(1).as("hit"))), Seq("gram"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"), count(col("hit")).as("n_boiler"))
      .select(col("doc_id"), col("n_grams"), col("n_boiler"),
        r4(col("n_boiler").cast("double") / col("n_grams")).as("boiler_ratio"))
  }

  // q141 — DSIR-STYLE IMPORTANCE SCORING (Xie et al. 2023,
  // arXiv:2302.03169): score every raw-pool document by how
  // target-like its hashed-bigram bag is — the data-selection method
  // between heuristic gates (q69) and trained classifiers. The
  // "target" distribution is the src0 slice, the raw pool everything
  // else; features are bigrams hashed into B=4096 buckets (md5-15
  // long -> one affine slot — both engine-portable); each
  // distribution gets add-1-smoothed bucket probabilities and the
  // per-doc score is the summed log-likelihood ratio
  // sum_f c_f(doc) * [log2 p_t(f) - log2 p_r(f)], kept EXACT as
  // integer micro-log2 units (the q81 fixed-point-transcendental
  // rule: quantize each log once, sum integers — partition-order
  // free). keep = score > 0 (more target-like than raw-like).
  // Scale shape: one bigram->slot partial-agg shuffle builds the
  // 4096-row model, which BROADCASTS back onto the per-doc slot
  // counts — raw-pool scoring is one aggregate per doc, linear at
  // any corpus size, exactly how DSIR selects from 100 TB pools.
  // Shared machinery lives in [[graft.functions.Dsir]] (one code path
  // with the streaming ingest gate, StreamPipeline.importanceGate).
  private def q141(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Dsir
    val base = docs(s, dir)
      .select(col("doc_id"), (col("source") === "src0").as("is_t"), col("text"))
    Dsir.modelAndScore(Dsir.slots(base, col("doc_id"), col("text"), keep = Seq("is_t")))
      .withColumnRenamed("id", "doc_id")
  }

  // q142 — BLOCK-LEVEL EXACT-SUBSTRING DEDUP WITH RECONSTRUCTION (the
  // remove-and-rebuild step q65 stops short of; the aligned-block
  // practical form of Lee et al. 2021, arXiv:2107.06499 "Deduplicating
  // Training Data Makes Language Models Better"): every 64-char
  // aligned block of every document (INCLUDING the sub-64 tail, so
  // unique docs reconstruct losslessly) is fingerprinted; for each
  // distinct block content exactly ONE occurrence survives — the
  // first in (doc_id, offset) order — and each document is rebuilt
  // from its surviving blocks in offset order. Output is the cleaned
  // corpus's shape: per doc, blocks before/after and the md5 of the
  // reconstructed text (text itself stays out of the result set).
  // Scale shape: the block stream is map-side (explode + md5, no
  // text retained past the fingerprint); ONE corpus-wide partial-agg
  // shuffle keyed on the fingerprint computes each content's first
  // occurrence (min of a packed (doc_id, offset) long — no sort);
  // the survivors join is the same fp key (exchange reuse), the
  // kept-offsets aggregate is doc-keyed, and the rebuild slices the
  // original text map-side from the kept offsets — blocks never
  // carry their text through any exchange. Exactly the shuffle
  // economy a suffix-array dedup pass has at 100 TB, at aligned-block
  // granularity.
  // Machinery lives in [[graft.operators.BlockDedup]] (one code path
  // with the streaming ingest form, blockDedupOnIngest).
  private def q142(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.BlockDedup
    val d = docs(s, dir)
    val blk = BlockDedup.blocks(d, col("doc_id"), col("text"))
    BlockDedup.rebuild(d, col("doc_id"), col("text"), BlockDedup.keptOffsets(blk))
      .select(col("id").as("doc_id"), col("n_blocks"), col("n_kept"),
        length(col("clean")).cast("long").as("clean_len"),
        md5(col("clean")).as("clean_fp"))
  }

  // q146 — WORD-ENTROPY QUALITY SIGNAL: per-document Shannon entropy
  // of the word distribution, the information-theoretic repetition
  // gate that complements q64's heuristics (dup-2-gram fraction and
  // top-word mass are blunt; entropy collapses smoothly toward 0 as a
  // doc degenerates into repeats and peaks at log2(n) for all-distinct
  // text). Kept EXACT cross-engine via the q81/q141 fixed-point-
  // transcendental rule: H = log2(n) - (1/n)·Σ c·log2(c) is computed
  // as integer micro-log2 units — each log quantized ONCE, then only
  // integer multiply/sum (partition-order free); the single closing
  // division to bits happens on integers both engines hold exactly.
  // Scale shape: one (doc, word) partial-agg shuffle then a doc-keyed
  // aggregate — same two-level economy as q64's top-word pass; no
  // per-doc O(n²) array scans, so megabyte documents cost O(words).
  private def q146(s: SparkSession, dir: String): DataFrame = {
    def qlog2(x: Column): Column = floor(log2(x) * lit(1e6) + lit(0.5)).cast("long")
    docs(s, dir)
      .select(col("doc_id"), explode(TextAnalysis.wordTokens(col("text"))).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_words"),
        sum(col("c") * qlog2(col("c").cast("double"))).as("s_fp"))
      .withColumn("h_fp", qlog2(col("n_words").cast("double")) * col("n_words") - col("s_fp"))
      .select(col("doc_id"), col("n_words"), col("h_fp"),
        r4(col("h_fp").cast("double") / (col("n_words").cast("double") * lit(1e6))).as("h_bits"))
  }

  // q147 — PER-SOURCE VOCABULARY STATISTICS: token count, vocabulary
  // size, hapax legomena (words seen once), type-token ratio and
  // hapax fraction — the lexical-diversity readout (Heaps/Zipf
  // regime check) a corpus audit runs per feed: a scraped mirror or
  // template farm shows collapsed TTR; an OCR-noise feed shows an
  // inflated hapax fraction. Scale shape: one (source, word)
  // partial-agg shuffle then a |sources|-row aggregate — distinct
  // counting rides the first aggregate's keys, never an Expand over
  // raw token rows. Ratios are integer-ratio doubles (exact).
  private def q147(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("source"), explode(TextAnalysis.wordTokens(col("text"))).as("w"))
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("c"))
      .groupBy(col("source"))
      .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("vocab"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("hapax"))
      .select(col("source"), col("n_tokens"), col("vocab"), col("hapax"),
        r4(col("vocab").cast("double") / col("n_tokens")).as("ttr"),
        r4(col("hapax").cast("double") / col("vocab")).as("hapax_frac"))

  // q150 — PER-SOURCE KL DIVERGENCE from the corpus word
  // distribution: KL(p_src ‖ p_corpus) in bits/token — the
  // domain-shift readout that ranks feeds by how far their unigram
  // distribution sits from the mixture (the distributional
  // complement of q141's per-DOC importance score; support(p_src) ⊆
  // support(p_corpus) so no smoothing is needed). Exact cross-engine
  // via the q81/q141/q146 fixed-point rule: each log2 quantized once
  // to integer micro-log2 units, every downstream op integer until
  // the single closing division. Scale shape: ONE (source, word)
  // partial-agg shuffle; source totals and corpus word totals both
  // DERIVE from that table (q63's derive-don't-rescan rule), the
  // word-total join stays vocab-sized, and the final aggregate is
  // |sources| rows.
  private def q150(s: SparkSession, dir: String): DataFrame = {
    def qlog2(x: Column): Column = floor(log2(x) * lit(1e6) + lit(0.5)).cast("long")
    val sw = docs(s, dir)
      .select(col("source"), explode(TextAnalysis.wordTokens(col("text"))).as("w"))
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("c_sw"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val srcTot = sw.groupBy(col("source")).agg(sum(col("c_sw")).as("n_s"))
    val wTot = sw.groupBy(col("w")).agg(sum(col("c_sw")).as("c_w"))
    val nTot = wTot.agg(sum(col("c_w")).as("n"))
    sw.join(broadcast(srcTot), Seq("source"))
      .join(wTot, Seq("w"))
      .crossJoin(broadcast(nTot))
      .withColumn("term_fp", col("c_sw") *
        (qlog2(col("c_sw").cast("double") / col("n_s").cast("double"))
          - qlog2(col("c_w").cast("double") / col("n").cast("double"))))
      .groupBy(col("source"))
      .agg(max(col("n_s")).as("n_tokens"), sum(col("term_fp")).as("kl_fp"))
      .select(col("source"), col("n_tokens"), col("kl_fp"),
        r4(col("kl_fp").cast("double") / (col("n_tokens").cast("double") * lit(1e6))).as("kl_bits"))
  }

  // q161 — PER-SOURCE ADAPTIVE QUALITY GATE: instead of one global
  // quality cutoff (q69's shape), each source gets its OWN threshold —
  // the 25th percentile of ITS quality distribution — and keeps docs
  // at or above it. This is how production curation actually gates
  // mixed crawls (C4/Gopher-style rules tuned per domain): a global
  // bar would gut a low-register source entirely and pass every doc
  // of a high-register one, destroying the mixture q62/q143 then
  // tries to balance. The quality score is q24's exact expression,
  // quantized ONCE to integer micro-units (the q110 mu rule) so the
  // per-source rank, the cutoff, and the >= gate are all exact
  // integer comparisons — no ulp-order hazard between engines' ln()
  // at the rank boundary. The cutoff is a DISCRETE rank selection at
  // ceil(n/4) under (quality, doc_id) — the q136 convention. Scale
  // shape: NO per-source sort — the rank rides
  // ChunkedFrame.globalRank (sources x quality-bucket parallelism;
  // this feed's 10 fixed sources would otherwise serialize into 10
  // tasks at 100x, the exact q109 ceiling); the 10-row cutoff table
  // broadcasts back; everything else is map-side.
  private def q161(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.QualityGate
    // persist the scored frame: THREE consumers follow (per-source
    // counts, the rank selection, the final gate join) and the quality
    // expression is the battery's heaviest per-row chain (4 regex
    // extractions + a stopword scan) — recomputing it per consumer
    // measured 40 s at the 10x probe vs ~19 s scored once.
    // Scoring/cutoff/gate all live in operators.QualityGate — the ONE
    // code path the streaming ingest gate shares (stream ≡ batch is
    // spec-pinned on it).
    val base = QualityGate.scored(docs(s, dir))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    QualityGate.gate(base, QualityGate.cutoffs(base))
      .select(col("doc_id"), col("source"), col("quality_fp"), col("q_cut_fp"),
        col("kept"))
  }

  // q163 — DOCUMENT NOVELTY SCORE: per document, the fraction of its
  // distinct word-8-grams that appear in NO other document — the
  // self-corpus memorization/redundancy readout (Lee et al. 2021's
  // near-dup analysis measures exactly this overlap direction; a doc
  // whose grams all recur elsewhere adds nothing the corpus doesn't
  // already have, while novelty ~1.0 marks unique content worth
  // keeping through dedup). Same 8-gram unit as q60/q114 (the
  // contamination/decontamination convention), so the three queries
  // gate on one shared vocabulary of evidence. The ratio is one IEEE
  // division of exact integer counts. Scale shape: two linear
  // shuffles — (gram -> distinct-doc count) then (doc -> gram
  // aggregate); both partial-aggregate map-side, nothing is
  // quadratic, and at 100 TB grams ride as xxhash64 longs (the q60
  // note) so the exchange carries 8 bytes per gram, not strings.
  /** q163's core with a grams-as-hashes switch: the declared query
    * keeps STRING grams (the oracle replays them); `hashedGrams=true`
    * is the 100 TB path (8-byte xxhash64 keys on both shuffles instead
    * of ~50-byte strings — the q60 rule, here actually runnable), and
    * CorpusOpsSpec pins hashed ≡ string output on the testdata (a
    * collision would have to merge two grams ACROSS docs to change
    * any count; at 2^-64 per pair that is a non-event below ~2^30
    * distinct grams). */
  private[graft] def noveltyProfile(d: DataFrame, hashedGrams: Boolean): DataFrame = {
    val gramCol = explode(ngrams(TextAnalysis.wordTokens(col("text")), 8)).as("g0")
    // persisted once: two aggregations consume the exploded corpus
    val pairs = d.select(col("doc_id"), gramCol)
      .select(col("doc_id"),
        (if (hashedGrams) xxhash64(col("g0")) else col("g0")).as("gram"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val perDoc = pairs.groupBy(col("doc_id")).agg(count(lit(1)).as("n_grams"))
    // a gram with doc-count 1 belongs to exactly one doc — min(doc_id)
    // IS that doc, so the novel-gram ownership falls out of the same
    // aggregate and the corpus-sized gram->doc join the first cut paid
    // (68 s at 10x) disappears: two partial-agg shuffles total, the
    // per-doc novel counts join doc-keyed (tiny) on the left
    val novel = pairs.groupBy(col("gram"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("owner"))
      .filter(col("n_docs") === 1)
      .groupBy(col("owner").as("doc_id"))
      .agg(count(lit(1)).as("n_novel"))
    perDoc.join(novel, Seq("doc_id"), "left")
      .withColumn("n_novel", coalesce(col("n_novel"), lit(0L)))
      .withColumn("novelty", r4(col("n_novel").cast("double") / col("n_grams").cast("double")))
  }

  private def q163(s: SparkSession, dir: String): DataFrame =
    noveltyProfile(docs(s, dir), hashedGrams = false)

  // q194/q195 — the HASHED-GRAM twins of q114/q163, DECLARED: at the
  // 100× probe string gram keys cost 30–50× over 8-byte xxhash64 keys
  // on the identical exchange, so the hashed variant is the one a
  // 100 TB user must reach for — it belongs in the battery, not
  // behind a Scala-only flag. The OUTPUT of either twin carries no
  // hash (per-doc counts and ratios only), and hashed ≡ string output
  // exactly unless an xxhash64 collision merges two grams ACROSS
  // documents (2^-64 per pair — a non-event below ~2^30 distinct
  // grams; CorpusOpsSpec pins equality on the testdata corpora), so
  // the string twin's DuckDB oracle replays these verbatim.
  private def q194(s: SparkSession, dir: String): DataFrame =
    splitDecontam(docs(s, dir), hashedGrams = true)

  private def q195(s: SparkSession, dir: String): DataFrame =
    noveltyProfile(docs(s, dir), hashedGrams = true)

  // q168 — DUPLICATION PROFILE: the histogram of exact-duplicate
  // cluster sizes (how many contents appear exactly c times, and what
  // share of the corpus they carry) — the first chart of every dedup
  // paper (Lee et al. 2021 fig. 1) and the number that decides whether
  // dedup is worth running at all: a corpus where 40% of docs live in
  // c >= 2 clusters dedups to 60%, one where the c = 1 bar holds 99%
  // does not. Clusters come from the q20/q27 canonical fingerprint
  // (whitespace/case-normalized md5), so the profile agrees with what
  // the dedup pass would actually collapse. The corpus share is one
  // exact integer ratio against a broadcast 1-row total. Scale shape:
  // two partial-agg shuffles, the second over |distinct contents|
  // rows; output is histogram-sized (distinct cluster sizes) at any
  // volume.
  private def q168(s: SparkSession, dir: String): DataFrame = {
    val clusters = docs(s, dir)
      .groupBy(TextAnalysis.fingerprint(col("text")).as("fp"))
      .agg(count(lit(1)).as("c"))
    val total = docs(s, dir).agg(count(lit(1)).as("n_total"))
    clusters.groupBy(col("c").as("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))
      .crossJoin(broadcast(total))
      .select(col("cluster_size"), col("n_clusters"),
        (col("cluster_size") * col("n_clusters")).as("n_docs"),
        r4((col("cluster_size") * col("n_clusters")).cast("double")
          / col("n_total").cast("double")).as("corpus_share"))
  }

  // q173 — QUALITY-WEIGHTED SAMPLING: keep probability rises with the
  // doc's QUALITY QUARTILE within its source (1.0 / 0.75 / 0.5 / 0.25
  // from top to bottom) — the softer sibling of q161's hard cutoff
  // and the DCLM-style recipe when you want the quality signal to
  // BIAS the mixture instead of gate it (hard thresholds discard the
  // long tail entirely; weighted sampling keeps a calibrated sliver
  // of every stratum, which matters for distributional robustness).
  // Quartiles come from the same no-per-source-sort rank machinery as
  // q161 (globalRank; (rank·4) DIV n + 1 is exact integer
  // arithmetic), the keep decision is q94's deterministic unit-hash
  // Bernoulli — map-side, engine-portable, no rand(). Scale shape:
  // one scoring pass (persisted — three consumers), the rank
  // shuffle, then a broadcast join and a map-side filter.
  private def q173(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{ChunkedFrame, QualityGate}
    val base = QualityGate.scored(docs(s, dir))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = base.groupBy(col("source")).agg(count(lit(1)).as("cnt"))
    ChunkedFrame.globalRank(base, "source", expr("quality_fp DIV 1000000"),
        Seq("quality_fp", "doc_id"))
      .join(broadcast(counts), Seq("source"))
      .withColumn("quartile", expr("__g * 4 DIV cnt + 1"))
      .withColumn("rate", col("quartile").cast("double") * lit(0.25))
      .filter(graft.functions.Sampling.unitHash(col("doc_id")) < col("rate"))
      .select(col("doc_id"), col("source"), col("quality_fp"),
        col("quartile"), col("rate"))
  }

  // q174 — QUALITY-BASED SURVIVOR SELECTION: among exact duplicates
  // (q27's canonical fingerprint), keep the HIGHEST-QUALITY copy
  // instead of the min-id copy — the production dedup rule (the
  // copies differ in formatting noise the fingerprint normalized
  // away: stray whitespace/case; the q24 score ranks the cleanest
  // one) vs the battery's min-id convention (q20/q67), which is the
  // right DETERMINISM baseline but throws away the quality signal.
  // Survivor = arg-max (quality_fp, then MIN doc_id on ties) via ONE
  // min_by on a composite struct — exact integer comparisons (the
  // micro-quantized score), no window, no second pass. Scale shape:
  // scoring rides the scan map-side; one fingerprint-keyed
  // partial-agg shuffle picks every survivor.
  private def q174(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.QualityGate
    val scored = docs(s, dir).select(col("doc_id"),
      TextAnalysis.fingerprint(col("text")).as("fp"),
      // unscorable docs (no tokens) sentinel at -1: the q24 score is
      // provably >= 0 (log(1+n) >= 0, both penalty factors in [0,1]),
      // so -1 loses to every scored copy and negates safely
      coalesce(QualityGate.scoreFp(col("text")), lit(-1L)).as("quality_fp"))
    scored.groupBy(col("fp"))
      .agg(
        min_by(struct(col("doc_id"), col("quality_fp")),
          struct((-col("quality_fp")).as("nq"), col("doc_id"))).as("t"),
        count(lit(1)).as("n_copies"),
        min(col("doc_id")).as("min_id"))
      .select(col("fp"), col("t.doc_id").as("keep_id"),
        col("t.quality_fp").as("keep_quality_fp"),
        col("n_copies"), (col("t.doc_id") =!= col("min_id")).as("beat_min_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q174_quality_survivor" -> q174 _,
    "q173_quality_weighted" -> q173 _,
    "q168_dup_profile" -> q168 _,
    "q163_novelty" -> q163 _,
    "q161_adaptive_quality" -> q161 _,
    "q150_source_kl" -> q150 _,
    "q147_vocab_stats" -> q147 _,
    "q142_block_dedup" -> q142 _,
    "q146_word_entropy" -> q146 _,
    "q141_dsir_importance" -> q141 _,
    "q91_boilerplate" -> q91 _,
    "q66_incremental_neardup" -> q66 _,
    "q60_contamination" -> q60 _,
    "q114_split_decontam" -> q114 _,
    "q194_decontam_hashed" -> q194 _,
    "q195_novelty_hashed" -> q195 _,
    "q61_pii_redact" -> q61 _,
    "q62_mixture_stats" -> q62 _,
    "q63_bigram_lm" -> q63 _,
    "q64_repetition" -> q64 _,
    "q65_repeated_blocks" -> q65 _
  )

  private val oracleSqlBase: Map[String, String] = Map(
    "q174_quality_survivor" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
        |    text,
        |    regexp_extract_all(lower(text), '[a-z0-9]+') AS toks,
        |    regexp_extract_all(text, '[.,;:!?''"()\[\]{}]') AS punct
        |  FROM documents
        |), m AS (
        |  SELECT doc_id, fp,
        |    coalesce(floor(
        |      ln(1 + len(toks)) * (1 - len(punct)::DOUBLE / nullif(length(text), 0))
        |        * (1 - len(list_filter(toks, x -> list_contains(['the','a','an','of','to','and','in','is','for','on','with','that','as','at','by'], x)))::DOUBLE
        |            / nullif(len(toks), 0)) * 1e6 + 0.5)::BIGINT, -1) AS quality_fp
        |  FROM t
        |), r AS (
        |  SELECT *, row_number() OVER (PARTITION BY fp ORDER BY quality_fp DESC, doc_id) AS rn,
        |    count(*) OVER (PARTITION BY fp) AS n_copies,
        |    min(doc_id) OVER (PARTITION BY fp) AS min_id
        |  FROM m
        |)
        |SELECT fp, doc_id AS keep_id, quality_fp AS keep_quality_fp,
        |  n_copies::BIGINT AS n_copies, (doc_id <> min_id) AS beat_min_id
        |FROM r WHERE rn = 1""".stripMargin,
    "q173_quality_weighted" ->
      """WITH t AS (
        |  SELECT doc_id, source, text,
        |    regexp_extract_all(lower(text), '[a-z0-9]+') AS toks,
        |    regexp_extract_all(text, '[.,;:!?''"()\[\]{}]') AS punct
        |  FROM documents
        |), m AS (
        |  SELECT doc_id, source,
        |    ln(1 + len(toks)) * (1 - len(punct)::DOUBLE / nullif(length(text), 0))
        |      * (1 - len(list_filter(toks, x -> list_contains(['the','a','an','of','to','and','in','is','for','on','with','that','as','at','by'], x)))::DOUBLE
        |          / nullif(len(toks), 0)) AS q
        |  FROM t
        |), f AS (
        |  SELECT doc_id, source, floor(q * 1e6 + 0.5)::BIGINT AS quality_fp
        |  FROM m WHERE q IS NOT NULL
        |), n AS (
        |  SELECT source, count(*)::BIGINT AS cnt FROM f GROUP BY 1
        |), r AS (
        |  SELECT f.*, row_number() OVER (PARTITION BY source ORDER BY quality_fp, doc_id) AS rn, cnt
        |  FROM f JOIN n USING (source)
        |), k AS (
        |  SELECT doc_id, source, quality_fp,
        |    ((rn - 1) * 4 // cnt + 1)::BIGINT AS quartile,
        |    ((rn - 1) * 4 // cnt + 1)::DOUBLE * 0.25 AS rate
        |  FROM r
        |)
        |SELECT doc_id, source, quality_fp, quartile, rate
        |FROM k
        |WHERE (((doc_id % 2147483648) * 2654435761) % 4294967296)::DOUBLE / 4294967296.0 < rate""".stripMargin,
    "q168_dup_profile" ->
      """WITH cl AS (
        |  SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
        |    count(*) AS c
        |  FROM documents GROUP BY 1
        |), h AS (
        |  SELECT c AS cluster_size, count(*)::BIGINT AS n_clusters FROM cl GROUP BY 1
        |), t AS (SELECT count(*) AS n_total FROM documents)
        |SELECT cluster_size, n_clusters,
        |  (cluster_size * n_clusters)::BIGINT AS n_docs,
        |  floor((cluster_size * n_clusters)::DOUBLE / n_total::DOUBLE * 10000 + 0.5)/10000 AS corpus_share
        |FROM h, t""".stripMargin,
    "q163_novelty" ->
      """WITH w AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS words FROM documents
        |), g AS (
        |  SELECT DISTINCT doc_id, array_to_string(words[i:i+7], ' ') AS gram
        |  FROM w, LATERAL (SELECT unnest(generate_series(1, len(words) - 7)) AS i) u
        |  WHERE len(words) >= 8
        |), gd AS (
        |  SELECT gram, count(*) AS n_docs FROM g GROUP BY 1
        |)
        |SELECT g.doc_id, count(*)::BIGINT AS n_grams,
        |  sum(CASE WHEN gd.n_docs = 1 THEN 1 ELSE 0 END)::BIGINT AS n_novel,
        |  floor(sum(CASE WHEN gd.n_docs = 1 THEN 1 ELSE 0 END)::DOUBLE / count(*)::DOUBLE * 10000 + 0.5)/10000 AS novelty
        |FROM g JOIN gd USING (gram)
        |GROUP BY 1""".stripMargin,
    "q161_adaptive_quality" ->
      """WITH t AS (
        |  SELECT doc_id, source, text,
        |    regexp_extract_all(lower(text), '[a-z0-9]+') AS toks,
        |    regexp_extract_all(text, '[.,;:!?''"()\[\]{}]') AS punct
        |  FROM documents
        |), m AS (
        |  SELECT doc_id, source,
        |    ln(1 + len(toks)) * (1 - len(punct)::DOUBLE / nullif(length(text), 0))
        |      * (1 - len(list_filter(toks, x -> list_contains(['the','a','an','of','to','and','in','is','for','on','with','that','as','at','by'], x)))::DOUBLE
        |          / nullif(len(toks), 0)) AS q
        |  FROM t
        |), f AS (
        |  SELECT doc_id, source, floor(q * 1e6 + 0.5)::BIGINT AS quality_fp
        |  FROM m WHERE q IS NOT NULL
        |), r AS (
        |  SELECT *, row_number() OVER (PARTITION BY source ORDER BY quality_fp, doc_id) AS rn,
        |    count(*) OVER (PARTITION BY source) AS cnt
        |  FROM f
        |), c AS (
        |  SELECT source, quality_fp AS q_cut_fp FROM r WHERE rn = (cnt + 3) // 4
        |)
        |SELECT f.doc_id, f.source, f.quality_fp, c.q_cut_fp,
        |  (f.quality_fp >= c.q_cut_fp) AS kept
        |FROM f JOIN c USING (source)""".stripMargin,
    "q150_source_kl" ->
      """WITH w AS (
        |  SELECT source, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
        |  FROM documents
        |), sw AS (
        |  SELECT source, w, count(*)::BIGINT AS c_sw FROM w GROUP BY 1, 2
        |), st AS (
        |  SELECT source, sum(c_sw)::BIGINT AS n_s FROM sw GROUP BY 1
        |), wt AS (
        |  SELECT w, sum(c_sw)::BIGINT AS c_w FROM sw GROUP BY 1
        |), nt AS (
        |  SELECT sum(c_w)::BIGINT AS n FROM wt
        |), t AS (
        |  SELECT sw.source,
        |    c_sw * (floor(log2(c_sw::DOUBLE / n_s::DOUBLE) * 1e6 + 0.5)::BIGINT
        |      - floor(log2(c_w::DOUBLE / n::DOUBLE) * 1e6 + 0.5)::BIGINT) AS term_fp,
        |    n_s
        |  FROM sw JOIN st USING (source) JOIN wt USING (w) CROSS JOIN nt
        |)
        |SELECT source, max(n_s)::BIGINT AS n_tokens, sum(term_fp)::BIGINT AS kl_fp,
        |  floor(sum(term_fp)::DOUBLE / (max(n_s)::DOUBLE * 1e6) * 10000 + 0.5)/10000 AS kl_bits
        |FROM t GROUP BY 1""".stripMargin,
    "q147_vocab_stats" ->
      """WITH w AS (
        |  SELECT source, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
        |  FROM documents
        |), c AS (
        |  SELECT source, w, count(*)::BIGINT AS c FROM w GROUP BY 1, 2
        |)
        |SELECT source, sum(c)::BIGINT AS n_tokens, count(*)::BIGINT AS vocab,
        |  sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)::BIGINT AS hapax,
        |  floor(count(*)::DOUBLE / sum(c) * 10000 + 0.5)/10000 AS ttr,
        |  floor(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)::DOUBLE / count(*) * 10000 + 0.5)/10000 AS hapax_frac
        |FROM c GROUP BY 1""".stripMargin,
    "q142_block_dedup" ->
      """WITH d AS (
        |  SELECT doc_id, text, ((length(text) + 63) // 64)::BIGINT AS nb FROM documents
        |), blk AS (
        |  SELECT doc_id, k,
        |    substr(text, (k*64+1)::INT, 64) AS btxt,
        |    md5(substr(text, (k*64+1)::INT, 64)) AS fp,
        |    doc_id*1000000 + k AS pk
        |  FROM d, unnest(range(0, nb)) AS t(k)
        |), f AS (
        |  SELECT fp, min(pk) AS mpk FROM blk GROUP BY 1
        |), rec AS (
        |  SELECT b.doc_id, count(*)::BIGINT AS n_kept,
        |    string_agg(b.btxt, '' ORDER BY b.k) AS clean
        |  FROM blk b JOIN f ON b.fp = f.fp AND b.pk = f.mpk
        |  GROUP BY 1
        |)
        |SELECT d.doc_id, d.nb AS n_blocks,
        |  coalesce(r.n_kept, 0)::BIGINT AS n_kept,
        |  length(coalesce(r.clean, ''))::BIGINT AS clean_len,
        |  md5(coalesce(r.clean, '')) AS clean_fp
        |FROM d LEFT JOIN rec r USING (doc_id)""".stripMargin,
    "q146_word_entropy" ->
      """WITH w AS (
        |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, w, count(*)::BIGINT AS c FROM w GROUP BY 1, 2
        |), a AS (
        |  SELECT doc_id, sum(c)::BIGINT AS n_words,
        |    sum(c * floor(log2(c::DOUBLE) * 1e6 + 0.5)::BIGINT)::BIGINT AS s_fp
        |  FROM c GROUP BY 1
        |)
        |SELECT doc_id, n_words,
        |  (floor(log2(n_words::DOUBLE) * 1e6 + 0.5)::BIGINT * n_words - s_fp)::BIGINT AS h_fp,
        |  floor((floor(log2(n_words::DOUBLE) * 1e6 + 0.5)::BIGINT * n_words - s_fp)::DOUBLE
        |    / (n_words::DOUBLE * 1e6) * 10000 + 0.5)/10000 AS h_bits
        |FROM a""".stripMargin,
    "q141_dsir_importance" ->
      """WITH base AS (
        |  SELECT doc_id, source = 'src0' AS is_t,
        |    regexp_extract_all(lower(text), '[a-z0-9]+') AS w
        |  FROM documents
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
        |)
        |SELECT s.doc_id, count(*)::BIGINT AS n_bigrams,
        |  sum(l.lam_fp)::BIGINT AS score_fp,
        |  sum(l.lam_fp) > 0 AS keep
        |FROM sl s JOIN lam l USING (slot)
        |WHERE NOT s.is_t
        |GROUP BY 1""".stripMargin,
    "q91_boilerplate" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w FROM documents
        |), g AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(1, len(w) - 1),
        |      i -> list_aggr(w[i:i+2], 'string_agg', ' '))) AS gram
        |  FROM toks WHERE len(w) >= 3
        |), boiler AS (
        |  SELECT gram FROM (
        |    SELECT gram, count(DISTINCT doc_id) AS df FROM g GROUP BY 1
        |  ) WHERE df >= 5
        |)
        |SELECT g.doc_id, count(*)::BIGINT AS n_grams, count(b.gram)::BIGINT AS n_boiler,
        |  floor((count(b.gram)::DOUBLE / count(*))*10000 + 0.5)/10000 AS boiler_ratio
        |FROM g LEFT JOIN boiler b ON g.gram = b.gram
        |GROUP BY 1""".stripMargin,
    "q66_incremental_neardup" ->
      """WITH d AS (
        |  SELECT doc_id, list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+')) AS toks
        |  FROM documents
        |)
        |SELECT p.doc_id AS probe_id, c.doc_id AS corpus_id,
        |  floor((len(list_intersect(p.toks, c.toks))::DOUBLE
        |    / (len(p.toks) + len(c.toks) - len(list_intersect(p.toks, c.toks))))*10000 + 0.5)/10000 AS jaccard
        |FROM d p JOIN d c ON p.doc_id % 10 = 0 AND c.doc_id % 10 <> 0
        |WHERE len(list_intersect(p.toks, c.toks))::DOUBLE
        |    / (len(p.toks) + len(c.toks) - len(list_intersect(p.toks, c.toks))) >= 0.8""".stripMargin,
    "q114_split_decontam" ->
      """WITH w AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS words,
        |    CASE WHEN (((doc_id % 2147483648) * 2654435761) % 4294967296) % 100 < 80 THEN 'train'
        |         WHEN (((doc_id % 2147483648) * 2654435761) % 4294967296) % 100 < 90 THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM documents
        |), g AS (
        |  SELECT DISTINCT doc_id, split, array_to_string(words[i:i+7], ' ') AS gram
        |  FROM w, LATERAL (SELECT unnest(generate_series(1, len(words) - 7)) AS i) u
        |  WHERE len(words) >= 8
        |), tg AS (
        |  SELECT DISTINCT gram FROM g WHERE split = 'train'
        |)
        |SELECT g.doc_id, g.split, count(*) AS n_grams, count(tg.gram) AS n_hit,
        |  count(tg.gram) > 0 AS leaked
        |FROM g LEFT JOIN tg ON g.gram = tg.gram
        |WHERE g.split <> 'train'
        |GROUP BY 1, 2""".stripMargin,
    "q60_contamination" ->
      """WITH w AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS words FROM documents
        |), g AS (
        |  SELECT DISTINCT doc_id, array_to_string(words[i:i+7], ' ') AS gram
        |  FROM w, LATERAL (SELECT unnest(generate_series(1, len(words) - 7)) AS i) u
        |  WHERE len(words) >= 8
        |), bg AS (
        |  SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0
        |)
        |SELECT g.doc_id, count(*) AS n_grams, count(bg.gram) AS n_hit,
        |  count(bg.gram)::DOUBLE / count(*) AS ratio
        |FROM g LEFT JOIN bg ON g.gram = bg.gram
        |WHERE g.doc_id % 97 <> 0
        |GROUP BY g.doc_id""".stripMargin,
    "q61_pii_redact" ->
      """WITH inj AS (
        |  SELECT doc_id, text
        |    || CASE WHEN doc_id % 7 = 0 THEN ' contact u' || doc_id || '@example.com' ELSE '' END
        |    || CASE WHEN doc_id % 11 = 0 THEN ' call 555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0') ELSE '' END
        |    AS t
        |  FROM documents
        |), red AS (
        |  SELECT doc_id, t,
        |    regexp_replace(regexp_replace(t, '[a-z0-9._]+@[a-z0-9.-]+\.[a-z][a-z]+', '<EMAIL>', 'g'),
        |      '[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS r
        |  FROM inj
        |)
        |SELECT doc_id,
        |  len(regexp_extract_all(t, '[a-z0-9._]+@[a-z0-9.-]+\.[a-z][a-z]+'))::BIGINT AS n_emails,
        |  len(regexp_extract_all(t, '[0-9]{3}-[0-9]{4}'))::BIGINT AS n_phones,
        |  length(r)::BIGINT AS n_chars_redacted,
        |  md5(r) AS redacted_fp
        |FROM red""".stripMargin,
    "q62_mixture_stats" ->
      """WITH a AS (
        |  SELECT lang, source, count(*) AS n_docs,
        |    sum(len(regexp_extract_all(lower(text), '[a-z0-9]+')))::BIGINT AS n_tokens
        |  FROM documents GROUP BY 1, 2
        |)
        |SELECT lang, source, n_docs, n_tokens,
        |  n_tokens::DOUBLE / sum(n_tokens) OVER () AS share,
        |  (sum(n_tokens) OVER (ORDER BY n_tokens DESC, lang, source
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::DOUBLE
        |    / sum(n_tokens) OVER () AS cum_share
        |FROM a""".stripMargin,
    "q64_repetition" ->
      """WITH w AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS words FROM documents
        |), w2 AS (
        |  SELECT doc_id, words, len(words) AS n FROM w WHERE len(words) >= 2
        |), g AS (
        |  SELECT doc_id, n, list_transform(range(1, n), i -> words[i] || ' ' || words[i+1]) AS grams
        |  FROM w2
        |), pd AS (
        |  SELECT doc_id, n::BIGINT AS n_words,
        |    (len(grams) - len(list_distinct(grams)))::DOUBLE / len(grams) AS dup_2gram_frac
        |  FROM g
        |), wc AS (
        |  SELECT doc_id, unnest(words) AS w FROM w2
        |), c AS (
        |  SELECT doc_id, w, count(*) AS c FROM wc GROUP BY 1, 2
        |), t AS (
        |  SELECT doc_id, w AS top_word, c AS top_word_n FROM (
        |    SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, w) AS rn FROM c)
        |  WHERE rn = 1
        |)
        |SELECT pd.doc_id, pd.n_words, pd.dup_2gram_frac, t.top_word, t.top_word_n,
        |  t.top_word_n::DOUBLE / pd.n_words AS top_word_frac
        |FROM pd JOIN t USING (doc_id)""".stripMargin,
    "q65_repeated_blocks" ->
      """WITH b AS (
        |  SELECT doc_id, md5(substring(text, (u.k*64 + 1)::INT, 64)) AS block_fp
        |  FROM documents, LATERAL (SELECT unnest(generate_series(0, (length(text) // 64) - 1)) AS k) u
        |  WHERE length(text) >= 64
        |), pb AS (
        |  SELECT block_fp, doc_id, count(*) AS occ FROM b GROUP BY 1, 2
        |)
        |SELECT block_fp, count(*) AS n_docs, sum(occ)::BIGINT AS n_occ, min(doc_id) AS first_doc
        |FROM pb GROUP BY 1 HAVING count(*) > 1""".stripMargin,
    "q63_bigram_lm" ->
      """WITH w AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS words FROM documents
        |), b AS (
        |  SELECT words[i] AS w1, words[i+1] AS w2
        |  FROM w, LATERAL (SELECT unnest(generate_series(1, len(words) - 1)) AS i) u
        |  WHERE len(words) >= 2
        |), c AS (
        |  SELECT w1, w2, count(*) AS c2 FROM b GROUP BY 1, 2
        |)
        |SELECT w1, w2, c2, (sum(c2) OVER (PARTITION BY w1))::BIGINT AS c1,
        |  c2::DOUBLE / (sum(c2) OVER (PARTITION BY w1))::BIGINT AS p
        |FROM c
        |ORDER BY c2 DESC, w1, w2 LIMIT 50""".stripMargin
  )

  // the hashed twins' outputs are hash-free and bitwise-identical to
  // the string twins' (see q194/q195 header), so the string oracles
  // replay them verbatim
  val oracleSql: Map[String, String] = oracleSqlBase ++ Map(
    "q194_decontam_hashed" -> oracleSqlBase("q114_split_decontam"),
    "q195_novelty_hashed" -> oracleSqlBase("q163_novelty")
  )
}
