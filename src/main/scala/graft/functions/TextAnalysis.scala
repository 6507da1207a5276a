package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis column functions for training-data pipelines:
  * tokenization, quality scoring, language-ID heuristic, document
  * fingerprinting. Pure `org.apache.spark.sql.functions` compositions
  * (codegen'd, no UDFs) so everything stays inside whole-stage codegen
  * and is pushdown/prune-friendly at 100 TB.
  *
  * North-star extension (SURVEY.md §2.7/§7 step 6); no reference
  * counterpart — the reference has no text operators.
  */
object TextAnalysis {

  /** Lowercased word tokens: maximal [a-z0-9]+ runs. */
  def wordTokens(text: Column): Column =
    call_function("regexp_extract_all", lower(text), lit("[a-z0-9]+"), lit(0))

  /** Whitespace-delimited tokens (raw token count basis). */
  def wsTokens(text: Column): Column =
    call_function("regexp_extract_all", text, lit("\\S+"), lit(0))

  /** Word n-gram shingles over a token array: overlapping windows of
    * `n` tokens joined by a space — the standard MinHash unit for
    * near-dup detection (shingle → minhash → band): word-level
    * paraphrase reshuffles survive word-set jaccard but not shingle
    * jaccard, so shingles discriminate rewrites from true near-dups.
    * Documents shorter than `n` tokens yield their whole token string
    * as one shingle. Pure HOFs — computed map-side. */
  def shingles(tokens: Column, n: Int): Column = {
    require(n >= 1, s"shingle size must be >= 1, got $n")
    when(size(tokens) <= n, array(array_join(tokens, " ")))
      .otherwise(transform(
        sequence(lit(0), size(tokens) - n),
        i => array_join(slice(tokens, i + 1, lit(n)), " ")))
  }

  /** Distinct word `k`-grams over a token array, space-joined; EMPTY
    * for docs with fewer than `k` tokens — the contamination-check
    * unit (nothing to overlap), in contrast to [[shingles]] which
    * collapses short docs to one whole-string shingle for minhash.
    * `words` MUST be a materialized attribute, not the tokenizer
    * expression: an outer expression referenced inside a HOF lambda
    * re-evaluates per element (HOFs are excluded from subexpression
    * elimination), turning tokenization O(n) into O(n²) per doc. */
  def distinctNgrams(words: Column, k: Int): Column = {
    require(k >= 1, s"ngram size must be >= 1, got $k")
    val idx = when(size(words) >= k, sequence(lit(1), size(words) - lit(k - 1)))
      .otherwise(array().cast("array<int>"))
    array_distinct(transform(idx, i => concat_ws(" ", slice(words, i, lit(k)))))
  }

  /** BPE-ish subword token estimate: letter runs, single digits, and
    * single punctuation marks each count as one token — a cheap,
    * deterministic stand-in for a real BPE vocab. */
  def bpeishTokens(text: Column): Column =
    call_function("regexp_extract_all", lower(text), lit("[a-z]+|[0-9]|[^a-z0-9\\s]"), lit(0))

  private val stopwords =
    Seq("the", "a", "an", "of", "to", "and", "in", "is", "for", "on", "with", "that", "as", "at", "by")

  /** Count of stopword tokens (not distinct — frequency matters for
    * quality scoring). */
  def stopwordCount(tokens: Column): Column =
    size(filter(tokens, t => array_contains(array(stopwords.map(lit): _*), t))).cast("long")

  /** Punctuation character count. */
  def punctCount(text: Column): Column =
    size(call_function("regexp_extract_all", text, lit("[.,;:!?'\"()\\[\\]{}]"), lit(0))).cast("long")

  /** Sum of token lengths (for avg token length). */
  def totalTokenLen(tokens: Column): Column =
    aggregate(tokens, lit(0L), (acc, t) => acc + length(t).cast("long"))

  /** Composite quality score in the C4/Gopher style: rewards token
    * mass, penalizes punctuation soup and stopword stuffing.
    * score = ln(1 + n_tokens) * (1 - punct_ratio) * (1 - stop_ratio). */
  def qualityScore(nTokens: Column, punctRatio: Column, stopRatio: Column): Column =
    log(lit(1d) + nTokens) * (lit(1d) - punctRatio) * (lit(1d) - stopRatio)

  /** n-gram-free language-ID heuristic: CJK codepoint presence wins
    * for zh; otherwise the largest marker-stopword hit count wins with
    * a fixed priority order (en > de > fr > es) for determinism, and
    * 'und' (undetermined) when no marker hits at all. The DuckDB
    * oracle replicates this decision tree verbatim. */
  def langId(text: Column): Column = {
    val toks = wordTokens(text)
    def hits(markers: Seq[String]): Column =
      size(filter(toks, t => array_contains(array(markers.map(lit): _*), t)))
    val zh = size(call_function("regexp_extract_all", text, lit("[\\x{4e00}-\\x{9fff}]"), lit(0)))
    val en = hits(Seq("the", "a", "is", "and", "of"))
    val de = hits(Seq("der", "die", "das", "und", "ist"))
    val fr = hits(Seq("le", "la", "les", "et", "est"))
    val es = hits(Seq("el", "los", "las", "y", "es"))
    when(zh > 0, lit("zh"))
      .when((en >= de) && (en >= fr) && (en >= es) && (en > 0), lit("en"))
      .when((de >= fr) && (de >= es) && (de > 0), lit("de"))
      .when((fr >= es) && (fr > 0), lit("fr"))
      .when(es > 0, lit("es"))
      .otherwise(lit("und"))
  }

  /** Canonical fingerprint: md5 of whitespace-collapsed, lowercased,
    * trimmed text. Exact-dup detection that survives formatting noise. */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))

  /** Content-defined rolling-hash fingerprint (custom codegen'd
    * Catalyst expression — see RollingHash.scala). Not SQL-portable;
    * used by the Scala API + tests. */
  def rollingFingerprint(text: Column): Column = RollingHash.column(text)

  /** Fixed-size character chunks with overlap (context-window prep):
    * chunk i covers [i*(size-overlap), i*(size-overlap)+size); the
    * last chunk may be shorter. Returns an array; pair with
    * posexplode for (chunk_id, chunk) rows. `nChars` passed in (often
    * a stored column) to avoid recomputing length. */
  def chunks(text: Column, nChars: Column, size: Int, overlap: Int): Column = {
    require(overlap >= 0 && overlap < size, "need 0 <= overlap < size")
    val stride = size - overlap
    val lastIdx = greatest(
      ceil((nChars - lit(overlap)).cast("double") / lit(stride)).cast("int") - 1, lit(0))
    transform(sequence(lit(0), lastIdx),
      i => call_function("substring", text, i * stride + 1, lit(size)))
  }

  /** TF-IDF term weights per document: tf = term count / doc token
    * count, idf = ln((N+1)/(df+1)) + 1 (smoothed, sklearn-style), one
    * row per (doc, term). Docs with zero tokens vanish (no terms to
    * weight).
    *
    * Scale shape: explode -> one (doc, term) partial-agg shuffle is
    * the only pass over the raw corpus; doc lengths reduce off that
    * table keyed by doc, document frequencies keyed by term (both
    * narrow), and N arrives via a broadcast one-row cross join — kept
    * declarative so the whole thing is one job with no driver action.
    * The term-keyed df join is the skew point at 100 TB (stop words);
    * it is a join of two AGGREGATED tables (one row per (doc,term) /
    * per term), so the hot term fans out only as wide as its true
    * document frequency — AQE skew-join splits handle the rest. */
  def tfIdf(df: DataFrame, idCol: Column, tokensCol: Column): DataFrame = {
    val terms = df.select(idCol.as("doc_id"), explode(tokensCol).as("term"))
    val tf = terms.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("n"))
    val dlen = tf.groupBy(col("doc_id")).agg(sum(col("n")).as("dlen"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = df.agg(count(lit(1)).as("n_docs"))
    tf.join(dlen, Seq("doc_id"))
      .join(dfreq, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("term"), col("n"), col("df"),
        (col("n").cast("double") / col("dlen")).as("tf"),
        (log((col("n_docs") + lit(1)).cast("double") / (col("df") + lit(1))) + lit(1)).as("idf"))
      .withColumn("tfidf", col("tf") * col("idf"))
  }
}
