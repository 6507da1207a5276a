package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.{Sketches, TextAnalysis}

/** Deterministic sketch + model-scoring queries, round 6.
  *
  * The classic engine sketches (HLL, theta) are engine-internal and
  * can't be oracle-checked; these use EXPLICIT universal hashing
  * (h(k) = (a*k + b) mod P mod w with fixed odd constants), so the
  * whole sketch — not just its answers — is reproducible in ANSI SQL
  * and strictly hash-checked against DuckDB. The estimate-vs-truth
  * columns double as a self-audit: CMS estimates are provably >=
  * truth, Bloom hits are provably a superset of membership.
  */
object SketchQueries {

  private def li(s: SparkSession, dir: String) = Tables.lineitem(s, dir)
  private def docs(s: SparkSession, dir: String) = Tables.documents(s, dir)

  // q79 — COUNT-MIN SKETCH heavy hitters: a d=4 x w=1024 CMS over
  // lineitem part keys, then the top-10 true heavy hitters with their
  // CMS point estimates (min over the 4 rows). est_n >= true_n by
  // construction; the gap is the collision mass. Scale shape: the
  // sketch is built from the per-key PRE-aggregate (one partial-agg
  // shuffle of |keys| rows, then 4x|keys| -> 4096 cells — the classic
  // mergeable-summary property; cells, not raw rows, cross the wire;
  // per-batch partials merge by cell-wise sum, see StreamingSketchSpec).
  private def q79(s: SparkSession, dir: String): DataFrame = {
    val counts = li(s, dir).groupBy(col("l_partkey")).agg(count(lit(1)).as("true_n"))
    val cells = Sketches.countMinCells(li(s, dir), col("l_partkey"))
    val top = counts.orderBy(col("true_n").desc, col("l_partkey")).limit(10)
    Sketches.cmsEstimate(cells, top, col("l_partkey"))
      .join(top, col("key") === col("l_partkey"))
      .select(col("l_partkey"), col("true_n"), col("est_n"))
  }

  // q80 — BLOOM FILTER membership audit: k=3 bit positions over an
  // m=4096-bit filter built from the urgent-order customer set; every
  // customer is probed and reported with its bloom verdict AND ground
  // truth. bloom_hit ⊇ actual (no false negatives — spec-pinned);
  // false positives are the deterministic collision pattern of the
  // fixed hash family. Scale shape: the filter is |set|x3 -> <=4096
  // distinct ints (broadcast-sized regardless of corpus), the probe
  // is a broadcast join — membership for a 100 TB key stream without
  // shuffling it.
  private def q80(s: SparkSession, dir: String): DataFrame = {
    val urgent = Tables.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey")).distinct()
    val bits = Sketches.bloomBits(urgent, col("o_custkey"))
    val verdict = Sketches.bloomProbe(bits, Tables.customer(s, dir), col("c_custkey"))
      .withColumnRenamed("key", "c_custkey")
    verdict.join(urgent, verdict("c_custkey") === urgent("o_custkey"), "left")
      .select(col("c_custkey"), col("bloom_hit"), col("o_custkey").isNotNull.as("actual"))
  }

  // q81 — BIGRAM-LM DOCUMENT SCORING (the LM-quality filter of a
  // curation pipeline): every document scored by its mean negative
  // log2-probability (bits per bigram) under the corpus's own
  // add-one-smoothed bigram model — low-probability documents are
  // the incoherent/boilerplate tail a quality gate drops. Parity is
  // exact-by-construction: each term's log2 is rounded to 1e-6 BEFORE
  // summation (fixed-point longs), so the per-doc sum is
  // order/partition-invariant. Scale shape: bigram explode is
  // map-side; the model join shuffles on the bigram key (both sides
  // partial-agg'd); V is a scalar aggregate cross-joined in.
  private def q81(s: SparkSession, dir: String): DataFrame = {
    val toks = docs(s, dir)
      .select(col("doc_id"), TextAnalysis.wordTokens(col("text")).as("w"))
    val bigr = toks.filter(size(col("w")) >= 2)
      .select(col("doc_id"),
        explode(expr("transform(sequence(1, size(w) - 1), i -> struct(element_at(w, i) as w1, element_at(w, i + 1) as w2))")).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val c2 = bigr.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val c1 = c2.groupBy(col("w1")).agg(sum(col("c2")).as("c1"))
    val v = toks.select(explode(col("w")).as("t")).agg(countDistinct(col("t")).as("v"))
    val model = c2.join(c1, "w1").crossJoin(v)
      .select(col("w1"), col("w2"),
        // fixed-point per-term bits: floor(log2(p)*1e6+0.5) as a long
        floor(log(2.0, (col("c2") + 1).cast("double") / (col("c1") + col("v")).cast("double")) * 1e6 + 0.5)
          .cast("long").as("term_fp"))
    bigr.join(model, Seq("w1", "w2"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("term_fp")).as("fp_sum"))
      .select(col("doc_id"), col("n_bigrams"),
        r4(-col("fp_sum").cast("double") / (col("n_bigrams") * 1e6)).as("bits_per_bigram"))
  }

  // q84 — JOIN-CARDINALITY ESTIMATE via CMS inner product: the
  // lineitem⋈orders-on-orderkey size predicted from two 4x1024
  // sketches (per-depth sum of cell products, min over depths — true
  // size plus non-negative collision mass) next to the true count.
  // This is what a cost-based optimizer consults before picking a
  // 100 TB join strategy: the estimate costs |cells| work and never
  // touches either fact table.
  private def q84(s: SparkSession, dir: String): DataFrame = {
    // width 65536 (not q79's 1024): inner-product error is
    // ||a||1*||b||1/w, so width is chosen for the TARGET error — at
    // 60k x 15k rows, w=64k keeps the collision mass under ~25% of
    // the true size while 4 x 64k cells stay sketch-sized
    val cellsL = Sketches.countMinCells(li(s, dir), col("l_orderkey"), width = 65536L)
    val cellsO = Sketches.countMinCells(Tables.orders(s, dir), col("o_orderkey"), width = 65536L)
    val truth = li(s, dir).join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .agg(count(lit(1)).as("true_pairs"))
    Sketches.cmsInnerProduct(cellsL, cellsO).crossJoin(truth)
      .select(col("true_pairs"), col("est_pairs"))
  }

  // q85 — QUANTILE SKETCH (significant-digit buckets): the p25/50/75/
  // 90/99 of l_extendedprice from a mergeable bucket table next to the
  // exact discrete quantile. Bucketing rounds each value (in cents —
  // exact integer arithmetic, no libm log whose ulps could flip
  // boundary buckets across engines) down to 3 significant digits:
  // relative error < 1%, bucket count bounded by 900/decade however
  // large the input. The exact side reuses the same cumulative walk at
  // sig=15 (p=1 → buckets are the raw values), so sketch-vs-truth is
  // one code path at two resolutions. Scale shape: one partial-agg
  // shuffle to ~10^3 buckets, the quantile walk runs on the sketch
  // only; per-day partials merge by bucket-wise sum (StreamingSketchSpec).
  private def q85(s: SparkSession, dir: String): DataFrame = {
    val qs = Seq(0.25, 0.5, 0.75, 0.9, 0.99)
    // prices are stored double: floor(x*100 + 0.5) pins the cents
    // conversion to one explicit rounding (a bare bigint cast
    // TRUNCATES here but ROUNDS in DuckDB — off-by-a-cent at 1-ulp
    // products like 7919342.9999…)
    val cents = floor(col("l_extendedprice") * 100 + 0.5).cast("long")
    val sk = Sketches.sigQuantiles(Sketches.sigBuckets(li(s, dir), cents), qs)
    val exact = Sketches.sigQuantiles(Sketches.sigBuckets(li(s, dir), cents, sig = 15), qs)
      .withColumnRenamed("q_lo", "true_v")
    sk.join(exact, Seq("q")).select(col("q"), col("q_lo"), col("true_v"))
  }

  // q86 — EXACT HEAVY HITTERS behind a Count-Min gate: parts with
  // >= 40 lineitems and their exact counts. The CMS estimate is >=
  // truth (no false negatives), so gating rows on est >= 40 before
  // the exact count changes nothing about the answer — the oracle is
  // a plain GROUP BY/HAVING that knows nothing about the sketch —
  // but at scale only heavy-CANDIDATE rows reach the shuffle; the
  // light-key mass (the bulk of a Zipfian stream) is dropped map-side
  // against the broadcast cell maps.
  private def q86(s: SparkSession, dir: String): DataFrame =
    Sketches.heavyHitters(li(s, dir), col("l_partkey"), minCount = 40L)
      .withColumnRenamed("key", "l_partkey")

  // q92 — KMV DISTINCT-COUNT SKETCH: |distinct l_orderkey| estimated
  // from the 64 smallest explicit-hash values next to the exact
  // count. The sketch is 64 longs whatever the input size and merges
  // by re-taking the k-min of a union (StreamingSketchSpec); estimate
  // = (k-1)*P/h_k. k-min plans as TakeOrdered over the distinct-hash
  // stream — per-partition top-k, no global sort — so the 100 TB
  // build is one partial-distinct shuffle. Unlike HLL registers,
  // every sketch value replays in ANSI SQL (strict hash oracle).
  private def q92(s: SparkSession, dir: String): DataFrame = {
    val sk = Sketches.kmvSketch(li(s, dir), col("l_orderkey"))
    val truth = li(s, dir).agg(countDistinct(col("l_orderkey")).as("true_n"))
    Sketches.kmvEstimate(sk).crossJoin(truth)
      .select(r4(col("est_distinct")).as("est_distinct"), col("true_n"))
  }

  // q93 — GROUPED QUANTILE SKETCH: per-event_type p50/p90/p99 of the
  // value column (in cents) from per-key sig-digit bucket sketches,
  // next to the exact per-key discrete quantile (same walk at sig=15).
  // This is the per-key percentile shape a metrics pipeline needs at
  // 100 TB: ONE (key, bucket) partial-agg shuffle builds every key's
  // sketch; the quantile walk windows per key over sketch-sized
  // partitions — no global sort, no per-key full sort.
  private def q93(s: SparkSession, dir: String): DataFrame = {
    val qs = Seq(0.5, 0.9, 0.99)
    val cents = floor(col("value") * 100 + 0.5).cast("long")
    val ev = Tables.events(s, dir)
    val sk = Sketches.sigQuantilesBy(Sketches.sigBucketsBy(ev, col("event_type"), cents), qs)
    val exact = Sketches.sigQuantilesBy(
      Sketches.sigBucketsBy(ev, col("event_type"), cents, sig = 15), qs)
      .withColumnRenamed("q_lo", "true_v")
    sk.join(exact, Seq("grp", "q"))
      .select(col("grp").as("event_type"), col("q"), col("q_lo"), col("true_v"))
  }

  // q98 — PER-KEY KMV DISTINCT ESTIMATION: distinct users per
  // event_type from one 64-hash sketch per key, next to the exact
  // count. The per-group k-min keeps InferWindowGroupLimit eligible
  // (<=k hashes per group leave each map task), so the whole build is
  // one partial-limited shuffle — the per-key cardinality answer a
  // 100 TB stream summary needs without per-key sorts or HLL's
  // engine-internal registers (every value replays in the oracle).
  private def q98(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val est = Sketches.kmvEstimateBy(
      Sketches.kmvSketchBy(ev, col("event_type"), col("user_id")))
    val truth = ev.groupBy(col("event_type").as("tg"))
      .agg(countDistinct(col("user_id")).as("true_n"))
    est.join(truth, col("grp") === col("tg"))
      .select(col("grp").as("event_type"), r4(col("est_distinct")).as("est_distinct"),
        col("true_n"))
  }

  // q102 — INVERSE QUANTILE (CDF) from the sketch: for five fixed
  // price points, the fraction of lineitems at or below each, read
  // from the q85 bucket table next to the exact fraction — the "what
  // percentile is this value" direction that completes the quantile
  // pair. Sketch answer is exact up to bucket resolution (<1% at
  // sig=3); both columns replay deterministically in the oracle.
  private def q102(s: SparkSession, dir: String): DataFrame = {
    val cents = floor(col("l_extendedprice") * 100 + 0.5).cast("long")
    val probes = s.range(1).select(explode(array(
      Seq(100000L, 3000000L, 6000000L, 9000000L, 12000000L).map(lit(_)): _*)).as("x"))
    val sk = Sketches.sigCdf(Sketches.sigBuckets(li(s, dir), cents), probes)
    val exact = li(s, dir).select(cents.as("v")).crossJoin(broadcast(probes))
      .groupBy(col("x"))
      .agg((sum(when(col("v") <= col("x"), 1).otherwise(0)).cast("double")
        / count(lit(1)).cast("double")).as("true_cdf"))
    sk.join(exact, Seq("x"))
      .select(col("x"), r4(col("cdf")).as("cdf"), r4(col("true_cdf")).as("true_cdf"))
  }

  // q105 — KMV SET-OPERATION ESTIMATES: pairwise vocabulary overlap
  // between document sources (how much of source A's distinct word
  // set recurs in source B) computed three ways from the k=64
  // per-source sketches alone — union (k-min mergeability),
  // theta-style intersection (hash sample below the pair's min
  // k-th-minimum, scaled by P/theta), inclusion-exclusion — next to
  // the exact values. The one corpus pass is the sketch build; the
  // 190 pairwise estimates run on 64-row sketches (the 100 TB
  // corpus-overlap answer: sketch each source as it lands, compare
  // any pair later without re-reading either). Every hash replays in
  // ANSI SQL (md5-derived token hash -> squared-affine KMV hash), so
  // the oracle re-derives sketches, cuts, and estimates exactly;
  // SketchSpec pins the estimate error against truth.
  private def q105(s: SparkSession, dir: String): DataFrame = {
    // 3-gram shingles, not words: the corpus vocabulary is ~30 words
    // (every source would sketch exactly), while shingle sets run to
    // thousands per source — the estimation regime the sketch exists
    // for, with the exact-degenerate path still covered by SketchSpec
    // two corpus passes total: the sketch build (kmvSketchBy dedups
    // internally) and ONE per-shingle source-set aggregation that
    // feeds both exact-truth columns — per-source distinct counts
    // (explode the sets) and pairwise overlaps (map-side pair
    // expansion over sets bounded by |sources| = 20, instead of a
    // shingle self-join that would shuffle the corpus twice more)
    // tokens materialize as an attribute BEFORE shingles' HOF lambda
    // sees them (the wordTokens contract): the composed expression
    // re-runs the regex once PER SHINGLE — measured 10x slower on
    // this corpus pass
    val words = docs(s, dir)
      .select(col("source"), TextAnalysis.wordTokens(col("text")).as("toks"))
      .select(col("source"), explode(TextAnalysis.shingles(col("toks"), 3)).as("w"))
    // ONE materialized corpus pass feeds all three consumers (sketch
    // build, per-source counts, pairwise truth): without the eager
    // checkpoint each consumer re-runs the tokenize+shingle explode
    // over the corpus — measured 3 scans for 1. The checkpointed frame
    // is the distinct-shingle aggregate (vocabulary-sized, far below
    // corpus-sized), the same thing a production overlap job would
    // persist as its working table.
    val bySh = words.groupBy(col("w")).agg(sort_array(collect_set(col("source"))).as("ss"))
      .localCheckpoint(true)
    val dw = bySh.select(explode(col("ss")).as("source"), col("w"))
    // the sketch table is |sources| x 64 rows; kmvSetOps reads it from
    // three join arms, so materialize it once as well (this IS the
    // "sketch each source as it lands, compare later" artifact)
    val sk = Sketches.kmvSketchBy(
      dw, col("source"), graft.functions.NearDup.md5TokenHash(col("w")), 64)
      .localCheckpoint(true)
    val ops = Sketches.kmvSetOps(sk, 64)
    val counts = bySh.select(explode(col("ss")).as("source"))
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
    val tc = bySh
      .select(explode(expr(
        "flatten(transform(ss, x -> transform(filter(ss, y -> y > x), y -> struct(x AS a, y AS b))))")).as("p"))
      .groupBy(col("p.a").as("grp_a"), col("p.b").as("grp_b")).agg(count(lit(1)).as("tc"))
    ops
      .join(counts.select(col("source").as("grp_a"), col("n").as("na")), Seq("grp_a"))
      .join(counts.select(col("source").as("grp_b"), col("n").as("nb")), Seq("grp_b"))
      .join(tc, Seq("grp_a", "grp_b"), "left")
      .withColumn("true_common", coalesce(col("tc"), lit(0L)))
      .select(col("grp_a").as("source_a"), col("grp_b").as("source_b"),
        (col("na") + col("nb") - col("true_common")).as("true_union"), col("true_common"),
        r4(col("est_union")).as("est_union"),
        r4(col("est_common_ie")).as("est_common_ie"),
        r4(col("est_common_theta")).as("est_common_theta"),
        r4(col("est_jaccard")).as("est_jaccard"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q105_kmv_setops" -> q105 _,
    "q92_kmv_distinct" -> q92 _,
    "q102_sig_cdf" -> q102 _,
    "q98_kmv_by_key" -> q98 _,
    "q93_grouped_quantiles" -> q93 _,
    "q84_join_card" -> q84 _,
    "q85_sig_quantiles" -> q85 _,
    "q86_heavy_hitters" -> q86 _,
    "q79_countmin_hh" -> q79 _,
    "q80_bloom_member" -> q80 _,
    "q81_lm_score" -> q81 _
  )

  val oracleSql: Map[String, String] = Map(
    "q105_kmv_setops" ->
      """WITH tk AS (
        |  SELECT source, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents
        |), wx AS (
        |  SELECT source, unnest(
        |    CASE WHEN len(toks) <= 3 THEN [array_to_string(toks, ' ')]
        |         ELSE list_transform(range(1, len(toks) - 1), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) END) AS w
        |  FROM tk
        |), dw AS (SELECT DISTINCT source, w FROM wx),
        |th AS (SELECT DISTINCT source, ('0x' || substr(md5(w), 1, 15))::BIGINT AS t FROM dw),
        |hh AS (
        |  SELECT DISTINCT source,
        |    ((t % 2147483647) * (t % 2147483647) % 2147483647 * 1299721
        |      + (t % 2147483647) * 7 + 1) % 2147483647 AS h
        |  FROM th
        |),
        |rn AS (SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rn FROM hh),
        |sk AS (SELECT source, h FROM rn WHERE rn <= 64),
        |st AS (SELECT source, count(*)::BIGINT AS kk, max(h)::BIGINT AS hk FROM sk GROUP BY 1),
        |st2 AS (
        |  SELECT source, CASE WHEN kk < 64 THEN 2147483647 ELSE hk END AS theta,
        |    CASE WHEN kk < 64 THEN kk::DOUBLE ELSE (kk-1)::DOUBLE * 2147483647.0 / hk END AS est
        |  FROM st
        |),
        |pairs AS (
        |  SELECT a.source AS grp_a, b.source AS grp_b, least(a.theta, b.theta) AS theta,
        |    a.est AS est_a, b.est AS est_b
        |  FROM st2 a JOIN st2 b ON a.source < b.source
        |),
        |cm AS (
        |  SELECT x.source AS grp_a, y.source AS grp_b, x.h
        |  FROM sk x JOIN sk y ON x.h = y.h AND x.source < y.source
        |),
        |nc AS (
        |  SELECT p.grp_a, p.grp_b, p.theta, p.est_a, p.est_b,
        |    sum(CASE WHEN c.h IS NOT NULL AND c.h < p.theta THEN 1 ELSE 0 END)::BIGINT AS n_common
        |  FROM pairs p LEFT JOIN cm c ON p.grp_a = c.grp_a AND p.grp_b = c.grp_b
        |  GROUP BY 1, 2, 3, 4, 5
        |),
        |ux AS (
        |  SELECT DISTINCT p.grp_a, p.grp_b, s.h
        |  FROM pairs p JOIN sk s ON s.source = p.grp_a OR s.source = p.grp_b
        |),
        |ur AS (SELECT grp_a, grp_b, h, row_number() OVER (PARTITION BY grp_a, grp_b ORDER BY h) AS rn FROM ux),
        |us AS (SELECT grp_a, grp_b, count(*)::BIGINT AS kk, max(h)::BIGINT AS hk FROM ur WHERE rn <= 64 GROUP BY 1, 2),
        |ue AS (
        |  SELECT grp_a, grp_b,
        |    CASE WHEN kk < 64 THEN kk::DOUBLE ELSE (kk-1)::DOUBLE * 2147483647.0 / hk END AS est_union
        |  FROM us
        |),
        |tcnt AS (SELECT source, count(*)::BIGINT AS n FROM dw GROUP BY 1),
        |tc AS (
        |  SELECT x.source AS grp_a, y.source AS grp_b, count(*)::BIGINT AS true_common
        |  FROM dw x JOIN dw y ON x.w = y.w AND x.source < y.source GROUP BY 1, 2
        |)
        |SELECT n.grp_a AS source_a, n.grp_b AS source_b,
        |  (ta.n + tb.n - coalesce(tc.true_common, 0))::BIGINT AS true_union,
        |  coalesce(tc.true_common, 0)::BIGINT AS true_common,
        |  floor(u.est_union*10000 + 0.5)/10000 AS est_union,
        |  floor(greatest(n.est_a + n.est_b - u.est_union, 0)*10000 + 0.5)/10000 AS est_common_ie,
        |  floor((n.n_common::DOUBLE * 2147483647.0 / n.theta)*10000 + 0.5)/10000 AS est_common_theta,
        |  floor((n.n_common::DOUBLE * 2147483647.0 / n.theta / u.est_union)*10000 + 0.5)/10000 AS est_jaccard
        |FROM nc n
        |JOIN ue u ON n.grp_a = u.grp_a AND n.grp_b = u.grp_b
        |JOIN tcnt ta ON ta.source = n.grp_a
        |JOIN tcnt tb ON tb.source = n.grp_b
        |LEFT JOIN tc ON tc.grp_a = n.grp_a AND tc.grp_b = n.grp_b""".stripMargin,
    "q102_sig_cdf" ->
      """WITH v AS (SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS xc FROM lineitem),
        |qs AS (SELECT unnest([100000, 3000000, 6000000, 9000000, 12000000])::BIGINT AS x),
        |b AS (
        |  SELECT (xc // p) * p AS b_lo, count(*)::BIGINT AS n
        |  FROM (SELECT xc,
        |    CAST(power(10, greatest(length(CAST(xc AS VARCHAR)) - 3, 0)) AS BIGINT) AS p FROM v)
        |  GROUP BY 1
        |), sb AS (
        |  SELECT b_lo, n FROM b
        |  UNION ALL SELECT -9223372036854775807 - 1, 0
        |), cum AS (
        |  SELECT b_lo, sum(n) OVER (ORDER BY b_lo)::BIGINT AS cum_n,
        |    sum(n) OVER ()::BIGINT AS total_n FROM sb
        |), sk AS (
        |  SELECT x, max(cum_n)::DOUBLE / max(total_n)::DOUBLE AS cdf
        |  FROM qs JOIN cum ON b_lo <= x GROUP BY 1
        |), tr AS (
        |  SELECT x, sum(CASE WHEN xc <= x THEN 1 ELSE 0 END)::DOUBLE / count(*)::DOUBLE AS true_cdf
        |  FROM v CROSS JOIN qs GROUP BY 1
        |)
        |SELECT sk.x, floor(cdf*10000 + 0.5)/10000 AS cdf,
        |  floor(true_cdf*10000 + 0.5)/10000 AS true_cdf
        |FROM sk JOIN tr USING (x)""".stripMargin,
    "q98_kmv_by_key" ->
      """WITH h AS (
        |  SELECT DISTINCT event_type,
        |    ((user_id % 2147483647) * (user_id % 2147483647) % 2147483647
        |      * 1299721 + (user_id % 2147483647) * 7 + 1) % 2147483647 AS h
        |  FROM events
        |), r AS (
        |  SELECT event_type, h,
        |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn FROM h
        |), s AS (
        |  SELECT event_type, count(*)::BIGINT AS kk, max(h)::BIGINT AS hk
        |  FROM r WHERE rn <= 64 GROUP BY 1
        |), t AS (
        |  SELECT event_type, count(DISTINCT user_id)::BIGINT AS true_n
        |  FROM events GROUP BY 1
        |)
        |SELECT s.event_type,
        |  floor((CASE WHEN kk < 64 THEN kk::DOUBLE
        |         ELSE (kk - 1)::DOUBLE * 2147483647.0 / hk END)*10000 + 0.5)/10000
        |    AS est_distinct,
        |  t.true_n
        |FROM s JOIN t USING (event_type)""".stripMargin,
    "q93_grouped_quantiles" ->
      """WITH v AS (
        |  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS xc FROM events
        |), qs AS (SELECT unnest([0.5, 0.9, 0.99])::DOUBLE AS q),
        |b AS (
        |  SELECT event_type, (xc // p) * p AS b_lo, count(*)::BIGINT AS n
        |  FROM (SELECT event_type, xc,
        |    CAST(power(10, greatest(length(CAST(xc AS VARCHAR)) - 3, 0)) AS BIGINT) AS p FROM v)
        |  GROUP BY 1, 2
        |), cum AS (
        |  SELECT event_type, b_lo,
        |    sum(n) OVER (PARTITION BY event_type ORDER BY b_lo)::BIGINT AS cum_n,
        |    sum(n) OVER (PARTITION BY event_type)::BIGINT AS total_n FROM b
        |), sk AS (
        |  SELECT event_type, q, min(b_lo)::BIGINT AS q_lo FROM cum CROSS JOIN qs
        |  WHERE cum_n >= ceil(q * total_n::DOUBLE) GROUP BY 1, 2
        |), eb AS (SELECT event_type, xc, count(*)::BIGINT AS n FROM v GROUP BY 1, 2),
        |ecum AS (
        |  SELECT event_type, xc,
        |    sum(n) OVER (PARTITION BY event_type ORDER BY xc)::BIGINT AS cum_n,
        |    sum(n) OVER (PARTITION BY event_type)::BIGINT AS total_n FROM eb
        |), tr AS (
        |  SELECT event_type, q, min(xc)::BIGINT AS true_v FROM ecum CROSS JOIN qs
        |  WHERE cum_n >= ceil(q * total_n::DOUBLE) GROUP BY 1, 2
        |)
        |SELECT sk.event_type, sk.q, sk.q_lo, tr.true_v
        |FROM sk JOIN tr USING (event_type, q)""".stripMargin,
    "q92_kmv_distinct" ->
      """WITH h AS (
        |  SELECT DISTINCT
        |    ((l_orderkey % 2147483647) * (l_orderkey % 2147483647) % 2147483647
        |      * 1299721 + (l_orderkey % 2147483647) * 7 + 1) % 2147483647 AS h
        |  FROM lineitem
        |), kmin AS (SELECT h FROM h ORDER BY h LIMIT 64),
        |e AS (SELECT count(*)::BIGINT AS kk, max(h)::BIGINT AS hk FROM kmin)
        |SELECT
        |  floor((CASE WHEN kk < 64 THEN kk::DOUBLE
        |         ELSE (kk - 1)::DOUBLE * 2147483647.0 / hk END)*10000 + 0.5)/10000
        |    AS est_distinct,
        |  (SELECT count(DISTINCT l_orderkey)::BIGINT FROM lineitem) AS true_n
        |FROM e""".stripMargin,
    "q85_sig_quantiles" ->
      """WITH v AS (SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS xc FROM lineitem),
        |qs AS (SELECT unnest([0.25, 0.5, 0.75, 0.9, 0.99])::DOUBLE AS q),
        |b AS (
        |  SELECT (xc // p) * p AS b_lo, count(*)::BIGINT AS n
        |  FROM (SELECT xc,
        |    CAST(power(10, greatest(length(CAST(xc AS VARCHAR)) - 3, 0)) AS BIGINT) AS p FROM v)
        |  GROUP BY 1
        |), cum AS (
        |  SELECT b_lo, sum(n) OVER (ORDER BY b_lo)::BIGINT AS cum_n,
        |    (SELECT sum(n)::BIGINT FROM b) AS total_n FROM b
        |), sk AS (
        |  SELECT q, min(b_lo)::BIGINT AS q_lo FROM cum CROSS JOIN qs
        |  WHERE cum_n >= ceil(q * total_n::DOUBLE) GROUP BY 1
        |), eb AS (SELECT xc, count(*)::BIGINT AS n FROM v GROUP BY 1),
        |ecum AS (
        |  SELECT xc, sum(n) OVER (ORDER BY xc)::BIGINT AS cum_n,
        |    (SELECT sum(n)::BIGINT FROM eb) AS total_n FROM eb
        |), tr AS (
        |  SELECT q, min(xc)::BIGINT AS true_v FROM ecum CROSS JOIN qs
        |  WHERE cum_n >= ceil(q * total_n::DOUBLE) GROUP BY 1
        |)
        |SELECT sk.q, sk.q_lo, tr.true_v FROM sk JOIN tr USING (q)""".stripMargin,
    "q86_heavy_hitters" ->
      """SELECT l_partkey, count(*)::BIGINT AS true_n
        |FROM lineitem GROUP BY 1 HAVING count(*) >= 40""".stripMargin,
    "q84_join_card" ->
      """WITH d AS (SELECT unnest([0,1,2,3]) AS depth),
        |la AS (
        |  SELECT depth,
        |    CASE depth
        |      WHEN 0 THEN (l_orderkey * 1299721 + 7) % 2147483647 % 65536
        |      WHEN 1 THEN (l_orderkey * 15485863 + 101) % 2147483647 % 65536
        |      WHEN 2 THEN (l_orderkey * 32452843 + 1009) % 2147483647 % 65536
        |      ELSE (l_orderkey * 49979687 + 10007) % 2147483647 % 65536 END AS cslot,
        |    count(*)::BIGINT AS cell_n
        |  FROM lineitem CROSS JOIN d GROUP BY 1, 2
        |), ob AS (
        |  SELECT depth,
        |    CASE depth
        |      WHEN 0 THEN (o_orderkey * 1299721 + 7) % 2147483647 % 65536
        |      WHEN 1 THEN (o_orderkey * 15485863 + 101) % 2147483647 % 65536
        |      WHEN 2 THEN (o_orderkey * 32452843 + 1009) % 2147483647 % 65536
        |      ELSE (o_orderkey * 49979687 + 10007) % 2147483647 % 65536 END AS cslot,
        |    count(*)::BIGINT AS cell_n
        |  FROM orders CROSS JOIN d GROUP BY 1, 2
        |), ip AS (
        |  SELECT la.depth, sum(la.cell_n * ob.cell_n)::BIGINT AS ip
        |  FROM la JOIN ob ON la.depth = ob.depth AND la.cslot = ob.cslot
        |  GROUP BY 1
        |), est AS (SELECT min(ip)::BIGINT AS est_pairs FROM ip),
        |t AS (
        |  SELECT count(*)::BIGINT AS true_pairs
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |)
        |SELECT true_pairs, est_pairs FROM est CROSS JOIN t""".stripMargin,
    "q79_countmin_hh" ->
      """WITH counts AS (
        |  SELECT l_partkey, count(*)::BIGINT AS true_n FROM lineitem GROUP BY 1
        |), hashes AS (
        |  SELECT l_partkey, true_n, d.depth,
        |    CASE d.depth
        |      WHEN 0 THEN (l_partkey * 1299721 + 7) % 2147483647 % 1024
        |      WHEN 1 THEN (l_partkey * 15485863 + 101) % 2147483647 % 1024
        |      WHEN 2 THEN (l_partkey * 32452843 + 1009) % 2147483647 % 1024
        |      ELSE (l_partkey * 49979687 + 10007) % 2147483647 % 1024 END AS cslot
        |  FROM counts CROSS JOIN (SELECT unnest([0,1,2,3]) AS depth) d
        |), cells AS (
        |  SELECT depth, cslot, sum(true_n)::BIGINT AS cell_n FROM hashes GROUP BY 1, 2
        |), top AS (
        |  SELECT l_partkey, true_n FROM counts ORDER BY true_n DESC, l_partkey LIMIT 10
        |)
        |SELECT t.l_partkey, t.true_n, min(c.cell_n)::BIGINT AS est_n
        |FROM top t JOIN hashes h ON t.l_partkey = h.l_partkey
        |JOIN cells c ON h.depth = c.depth AND h.cslot = c.cslot
        |GROUP BY 1, 2""".stripMargin,
    "q80_bloom_member" ->
      """WITH urgent AS (
        |  SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |), bits AS (
        |  SELECT DISTINCT CASE j
        |    WHEN 0 THEN (o_custkey * 1299721 + 7) % 2147483647 % 4096
        |    WHEN 1 THEN (o_custkey * 15485863 + 101) % 2147483647 % 4096
        |    ELSE (o_custkey * 32452843 + 1009) % 2147483647 % 4096 END AS bit
        |  FROM urgent CROSS JOIN (SELECT unnest([0,1,2]) AS j) d
        |), probes AS (
        |  SELECT c_custkey, CASE j
        |    WHEN 0 THEN (c_custkey * 1299721 + 7) % 2147483647 % 4096
        |    WHEN 1 THEN (c_custkey * 15485863 + 101) % 2147483647 % 4096
        |    ELSE (c_custkey * 32452843 + 1009) % 2147483647 % 4096 END AS pbit
        |  FROM customer CROSS JOIN (SELECT unnest([0,1,2]) AS j) d
        |), verdict AS (
        |  SELECT p.c_custkey, count(b.bit) = 3 AS bloom_hit
        |  FROM probes p LEFT JOIN bits b ON p.pbit = b.bit
        |  GROUP BY 1
        |)
        |SELECT v.c_custkey, v.bloom_hit, u.o_custkey IS NOT NULL AS actual
        |FROM verdict v LEFT JOIN urgent u ON v.c_custkey = u.o_custkey""".stripMargin,
    "q81_lm_score" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w FROM documents
        |), bigr AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(w)),
        |    i -> struct_pack(w1 := w[i], w2 := w[i+1]))) AS b
        |  FROM toks WHERE len(w) >= 2
        |), bg AS (
        |  SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM bigr
        |), c2 AS (
        |  SELECT w1, w2, count(*)::BIGINT AS c2 FROM bg GROUP BY 1, 2
        |), c1 AS (
        |  SELECT w1, sum(c2)::BIGINT AS c1 FROM c2 GROUP BY 1
        |), vv AS (
        |  SELECT count(DISTINCT t)::BIGINT AS v FROM (SELECT unnest(w) AS t FROM toks)
        |), model AS (
        |  SELECT w1, w2,
        |    floor(log2((c2 + 1)::DOUBLE / (c1 + v)::DOUBLE) * 1e6 + 0.5)::BIGINT AS term_fp
        |  FROM c2 JOIN c1 USING (w1) CROSS JOIN vv
        |)
        |SELECT doc_id, count(*)::BIGINT AS n_bigrams,
        |  floor((-sum(term_fp)::DOUBLE / (count(*) * 1e6)) * 10000 + 0.5)/10000 AS bits_per_bigram
        |FROM bg JOIN model USING (w1, w2)
        |GROUP BY 1""".stripMargin
  )
}
