package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Round-11 distribution-audit + analytics surface (q229–q244): the
  * monitors a data platform runs CONTINUOUSLY over a 100 TB lake —
  * drift (q229 PSI, q241 Kolmogorov-Smirnov), association (q230
  * chi-square / Cramér's V, q234 functional-dependency g3), phonetic
  * entity blocking (q231 — the "finer blocking key" fix BASELINE.md
  * prescribes for q218's prefix blocks), HyperLogLog distinct
  * counting (q232 — the industry-standard register sketch next to
  * q92's KMV, with the leg-25 streaming maintainer), the seasonal
  * and conditional-variance members of the forecast-backtest family
  * (q233 additive Holt-Winters, q236 GARCH(1,1) — completing q203
  * EWMA → q210 Holt), corpus forensics (q237 Zipf fit, q238 Flesch
  * readability, q235 quantile-normalization lookup), navigation
  * predictability (q240 entropy rate), and the product-analytics
  * trio (q239 A/B readout, q242 cohort LTV, q244 DAU/MAU
  * stickiness) plus the q243 order-reconciliation audit.
  *
  * Exactness rules as everywhere in this battery: counts are exact
  * integers; per-band/cell transcendental terms are quantized to
  * fixed-point BIGINT BEFORE any cross-row sum (order-independent by
  * construction — the BM25/q163 discipline); closing formulas are ONE
  * shared IEEE sequence evaluated identically on both engines.
  */
object AuditQueries {

  private def docs(s: SparkSession, dir: String): DataFrame = Tables.documents(s, dir)

  // ---------------------------------------------------------------
  // q229 — POPULATION STABILITY INDEX (drift monitor): compare the
  // value distribution of each event_type between the first and
  // second half of the observed date range — THE score a feature
  // platform alarms on (PSI < 0.1 stable, > 0.25 shifted). Bands are
  // log2 buckets of the value (micro-log2 fixed point first, then an
  // exact integer DIV — no raw double boundary decides a band);
  // non-positive values pool in band -999. Laplace-smoothed shares
  // (n + 0.5) / (N + 0.5·B) keep every band's ratio finite, so the
  // PSI terms (p_b − p_a)·ln(p_b/p_a) ≥ 0 are defined everywhere;
  // each term quantizes to 1e-12 fixed point BEFORE the band sum
  // (integer — order-free), and the rounded psi closes in integer
  // arithmetic. Scale shape: ONE partial-agg shuffle to (type, band)
  // grain; the date-bounds row broadcasts; output is |types| rows.
  private def q229(s: SparkSession, dir: String): DataFrame =
    psiDrift(Tables.events(s, dir)
      .select(col("event_type"), to_date(col("ts")).as("day"), col("value")))

  /** The log2 value band — shared by the declared q229 and the
    * streaming grid maintainer (StreamPipeline.psiMaintain): micro-
    * log2 fixed point first, then an exact integer-domain floor — no
    * raw double boundary decides a band. */
  private[graft] def valueBand(value: Column): Column = {
    val lv = when(value > 0, floor(log2(value) * lit(1e6) + lit(0.5)).cast("long"))
    when(lv.isNotNull, floor(lv.cast("double") / lit(1000000.0)).cast("long"))
      .otherwise(lit(-999L))
  }

  /** The additive (event_type, day, band) count grid — ≤ |types| ×
    * |days| × |bands| rows at any volume, merge-by-addition: the
    * state a live drift monitor maintains. */
  private[graft] def psiGrid(e: DataFrame): DataFrame =
    e.groupBy(col("event_type"), col("day"), valueBand(col("value")).as("band"))
      .agg(count(lit(1)).as("x"))

  /** PSI kernel over (event_type, day, value) rows. */
  private[graft] def psiDrift(e: DataFrame): DataFrame = psiFromGrid(psiGrid(e))

  /** q229's closing over any (event_type, day, band, x) grid — ONE
    * code path with the streaming serve (StreamPipeline.psiServe
    * over the maintained grid store). The date split derives from
    * the grid's own bounds, so serve ≡ batch is structural once the
    * maintained counts equal the batch grid. */
  private[graft] def psiFromGrid(grid: DataFrame): DataFrame = {
    val bounds = grid.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val banded = grid.crossJoin(broadcast(bounds))
      .withColumn("late",
        datediff(col("day"), col("d0")) >= expr("(datediff(d1, d0) + 1) DIV 2"))
    val cells = banded.groupBy(col("event_type"), col("band"))
      .agg(coalesce(sum(when(!col("late"), col("x"))), lit(0L)).as("na"),
        coalesce(sum(when(col("late"), col("x"))), lit(0L)).as("nb"))
    val tot = cells.groupBy(col("event_type"))
      .agg(sum(col("na")).as("ta"), sum(col("nb")).as("tb"),
        count(lit(1)).as("nbands"))
    val pa = (col("na").cast("double") + lit(0.5)) /
      (col("ta").cast("double") + lit(0.5) * col("nbands").cast("double"))
    val pb = (col("nb").cast("double") + lit(0.5)) /
      (col("tb").cast("double") + lit(0.5) * col("nbands").cast("double"))
    val term = (pb - pa) * log(pb / pa) // natural log; term >= 0 always
    cells.join(tot, Seq("event_type"))
      .withColumn("tfp", floor(term * lit(1e12) + lit(0.5)).cast("long"))
      .groupBy(col("event_type"))
      .agg(max(col("ta")).as("n_early"), max(col("tb")).as("n_late"),
        max(col("nbands")).as("n_bands"), sum(col("tfp")).as("sfp"))
      .select(col("event_type"), col("n_early"), col("n_late"), col("n_bands"),
        (expr("(sfp + 500000) DIV 1000000").cast("double") / lit(1e6)).as("psi_r6"))
  }

  // ---------------------------------------------------------------
  // q230 — CHI-SQUARE ASSOCIATION / CRAMÉR'S V: are two categorical
  // columns independent? Tested over two relations — (event_type ×
  // day-of-week) on the event stream (does activity mix shift by
  // weekday?) and (market segment × order priority) on the joined
  // orders (does segment predict priority?). Per-cell terms
  // enter via the algebraic identity chi² = Σ_cells (O−E)²/E =
  // Σ_observed O²/E − n, which counts UNOBSERVED (O = 0) cells —
  // each contributes its E — without ever enumerating them (the
  // naive observed-only sum understates chi² whenever a cell is
  // empty; the perfect-association spec pins exactly this).
  // Per-cell O²/E ≤ n quantizes to 1e-8 fixed point before the cell
  // sum (order-free integer); E = rowTot·colTot/n is exact-integer
  // product → one IEEE divide, identical both engines. Scale shape:
  // each relation is one partial agg to CELL grain (r·c rows — the
  // categorical domain, not the row count); margins re-aggregate the
  // cell table; the 1-row totals broadcast. Output: 2 rows.
  private[graft] def cramers(obs: DataFrame, rel: String): DataFrame = {
    val cells = obs.groupBy(col("rk"), col("ck")).agg(count(lit(1)).as("o"))
    val rt = cells.groupBy(col("rk")).agg(sum(col("o")).as("rt"))
    val ct = cells.groupBy(col("ck")).agg(sum(col("o")).as("ct"))
    val dims = cells.agg(sum(col("o")).as("n"))
      .crossJoin(rt.agg(count(lit(1)).as("r_levels")))
      .crossJoin(ct.agg(count(lit(1)).as("c_levels")))
    // margins widen to double BEFORE the product (rt·ct is a
    // LONG×LONG that wraps past 2^63 at ~3e9-row margins); double
    // multiply of two exactly-representable ints rounds the same real
    // value the old integer-product cast did, so parity is unchanged
    // where both are defined. tfp = O²/E·1e8 itself exceeds LONG for
    // n > ~9e10, so the fixed-point term is decimal (HUGEINT oracle).
    val ee = col("rt").cast("double") * col("ct").cast("double") /
      col("n").cast("double")
    val term = (col("o").cast("double") * col("o").cast("double")) / ee
    val chi2 = col("sfp").cast("double") / lit(1e8) - col("n").cast("double")
    cells.join(broadcast(rt), Seq("rk")).join(broadcast(ct), Seq("ck"))
      .crossJoin(broadcast(dims))
      .withColumn("tfp", floor(term * lit(1e8) + lit(0.5)).cast("decimal(38,0)"))
      .groupBy(lit(rel).as("relation"))
      .agg(max(col("n")).as("n"), max(col("r_levels")).as("r_levels"),
        max(col("c_levels")).as("c_levels"), sum(col("tfp")).as("sfp"))
      .select(col("relation"), col("n"), col("r_levels"), col("c_levels"),
        (floor(chi2 * lit(1e4) + lit(0.5)) / lit(1e4)).as("chi2_r4"),
        (floor(sqrt(greatest(chi2, lit(0.0)) /
          (col("n").cast("double") *
            (least(col("r_levels"), col("c_levels")).cast("double") - lit(1.0))))
          * lit(1e6) + lit(0.5)) / lit(1e6)).as("v_r6"))
  }

  private def q230(s: SparkSession, dir: String): DataFrame = {
    val evObs = Tables.events(s, dir)
      .select(col("event_type").as("rk"),
        (dayofweek(col("ts")) - lit(1)).cast("string").as("ck"))
    val ordObs = Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("rk"), col("o_orderpriority").as("ck"))
    cramers(evObs, "events.event_type~dow")
      .unionByName(cramers(ordObs, "customer.mktsegment~orders.priority"))
  }

  // ---------------------------------------------------------------
  // q231 — PHONETIC ENTITY BLOCKING: q218's fuzzy matcher with the
  // blocking key BASELINE.md prescribes when prefix blocks go
  // quadratic — a Soundex-style phonetic key of the phrase's first
  // word (head letter + the first three collapsed consonant-class
  // digits; vowels/h/w/y and digits drop as class 0). Spelling
  // variants that a 2-char prefix separates (konnect/connect) now
  // meet, and a vocabulary that floods one prefix (the q218 salt
  // note) spreads across its phonetic classes. The key is built from
  // engine-portable string ops ONLY (translate → seven per-digit run
  // collapses → zero strip → rpad) so both engines derive the
  // identical key; the verify threshold is the same quantized
  // Jaro-Winkler integer as q218. Scale shape: vocabulary-bound
  // phrase table (content growth, not row growth); candidate fan-out
  // is Σ_blocks |block|² over (phonetic, length±3) cells.
  private[graft] def phonKey(w: Column): Column = {
    val d1 = translate(w, "abcdefghijklmnopqrstuvwxyz0123456789",
      "012301200224550126230102020000000000")
    val collapsed = (0 to 6).foldLeft(d1) { (c, d) =>
      regexp_replace(c, s"$d{2,}", s"$d")
    }
    val sig = regexp_replace(collapsed.substr(lit(2), length(collapsed)), "0", "")
    concat(upper(w.substr(1, 1)), rpad(sig.substr(1, 3), 3, "0"))
  }

  private def q231(s: SparkSession, dir: String): DataFrame =
    phoneticMatch(docs(s, dir))

  private[graft] def phoneticMatch(d: DataFrame): DataFrame = {
    // Phonetic classes are COARSER than 2-char prefixes for common
    // sound patterns, so one (key, length) cell can dominate the
    // verify stage (measured 3.4x med->max task skew at the 100x
    // probe). The b-side salts each cell 4 ways by phrase hash and
    // the a-side explodes all 4 salts — same candidate pairs, same
    // output, hot cell split across 4 tasks (the q47 bucket-cap /
    // q218 length-band discipline, one level finer).
    val S = 4
    val keyed = GovernQueries.phraseVocab(d)
      .withColumn("blk", phonKey(element_at(split(col("p"), " "), 1)))
    val a = keyed.select(col("p").as("pa"), col("blk"), length(col("p")).as("la"))
      .withColumn("lb", explode(expr("sequence(la - 3, la + 3)")))
      .withColumn("salt", explode(lit((0 until S).toArray)))
    val b = keyed.select(col("p").as("pb"), col("blk"), length(col("p")).as("lb"))
      .withColumn("salt", pmod(xxhash64(col("pb")), lit(S.toLong)).cast("int"))
    a.join(b, Seq("blk", "lb", "salt"))
      .filter(col("pa") < col("pb"))
      .withColumn("jw6",
        floor(graft.functions.JaroWinkler.column(col("pa"), col("pb")) * lit(1e6)
          + lit(0.5d)).cast("long"))
      .filter(col("jw6") >= 850000L)
      .select(col("pa").as("phrase_a"), col("pb").as("phrase_b"),
        col("blk").as("block_key"),
        (col("jw6").cast("double") / lit(1e6)).as("jw_r6"))
  }

  // ---------------------------------------------------------------
  // q232 — HYPERLOGLOG DISTINCT (Flajolet et al. 2007): per-source
  // distinct-word estimates from a 512-register HLL, audited against
  // the exact count. The register build is the scale story: the
  // volume-sized word stream collapses MAP-SIDE to (source, bucket)
  // max(rho) — at most |sources|·512 rows ever cross the exchange
  // (vs the vocabulary-sized shuffle the exact twin pays), and
  // registers merge by max, so the sketch is embarrassingly
  // distributable and streamable. Engine parity: the hash is the
  // battery's md5-15 60-bit integer (identical hex → identical
  // BIGINT both engines); bucket/remainder are integer ops; rho
  // counts leading zeros of the 51-bit remainder via bin()-length
  // (exact string logic, no log2); the harmonic denominator
  // Σ 2^(-M_j) is summed as EXACT integers (1 << (52 − M), ≤ 2^61
  // total) so no float-sum order hazard exists; the closing
  // α·m²·2^52/S (+ linear-counting small-range correction
  // m·ln(m/V)) is one shared IEEE sequence.
  private def q232(s: SparkSession, dir: String): DataFrame =
    hllDistinct(docs(s, dir))

  /** The per-(source, bucket) max-rho register table from a word
    * stream — the mergeable HLL state (max commutes/idempotent, so
    * the same build serves batch q232 and the streaming maintainer,
    * StreamPipeline.hllMaintain). */
  private[graft] def hllRegisters(words: DataFrame): DataFrame =
    words
      .withColumn("h", expr("CAST(conv(substring(md5(w), 1, 15), 16, 10) AS BIGINT)"))
      .withColumn("bucket", col("h") % 512)
      .withColumn("wb", expr("h DIV 512"))
      .withColumn("rho", when(col("wb") === 0, lit(52))
        .otherwise(lit(52) - length(expr("bin(wb)"))).cast("int"))
      .groupBy(col("source"), col("bucket"))
      .agg(max(col("rho")).as("m"))

  /** The HLL closing over any (source, bucket, m) register table —
    * ONE code path with the streaming serve (StreamPipeline.hllServe):
    * (source, n_buckets_used, hll_est_r2). */
  private[graft] def hllEstimate(regs: DataFrame): DataFrame = {
    val agg = regs.groupBy(col("source"))
      .agg(count(lit(1)).as("used"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), 52 - m)")).as("sp"))
      .withColumn("v", lit(512L) - col("used"))
      .withColumn("sfp", col("sp") + col("v") * expr("shiftleft(CAST(1 AS BIGINT), 52)"))
    val raw = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(512.0)) *
      lit(262144.0) * lit(4503599627370496.0) / col("sfp").cast("double")
    agg.withColumn("__est_raw",
        when(raw <= lit(1280.0) && col("v") > 0,
          lit(512.0) * log(lit(512.0) / col("v").cast("double")))
          .otherwise(raw))
      .select(col("source"), col("used").as("n_buckets_used"),
        (floor(col("__est_raw") * lit(100.0) + lit(0.5)) / lit(100.0)).as("hll_est_r2"),
        col("__est_raw"))
  }

  private[graft] def hllDistinct(d: DataFrame): DataFrame = {
    val words = d.select(col("source"),
      explode(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).as("w"))
    // ONE tokenize scan feeds both legs: registers are max-merged, so
    // building them from the DISTINCT (source, word) set — the exact
    // twin's input, vocabulary-sized — changes nothing (duplicates
    // never move a max), and the persist makes the shared subtree
    // materialize once instead of the two full corpus scans the stage
    // histogram showed. Release is caller-owned (harness clearCache).
    val dw = words.distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val est = hllEstimate(hllRegisters(dw))
    val exact = dw.groupBy(col("source")).agg(count(lit(1)).as("n_exact"))
    est.join(exact, Seq("source"))
      .select(col("source"), col("n_exact"), col("n_buckets_used"), col("hll_est_r2"),
        (floor(abs(col("__est_raw") - col("n_exact").cast("double")) /
          col("n_exact").cast("double") * lit(1e4) + lit(0.5)) / lit(1e4)).as("rel_err_r4"))
  }

  // ---------------------------------------------------------------
  // q233 — ADDITIVE HOLT-WINTERS BACKTEST: the seasonal member of
  // the forecast family (q203 EWMA = level, q210 Holt = level+trend,
  // q233 = level+trend+weekly season). Initialization is the classic
  // first-period recipe (l₀ = mean of the first 7 closes — summed in
  // ONE written order — b₀ = 0, sᵢ = xᵢ − l₀); the recursion scores
  // one-step-ahead forecasts f = l + b + s_slot for t = 8..n with
  // α = 0.2, β = 0.1, γ = 0.3, against BOTH the naive walk and the
  // SEASONAL naive (x_{t−7} — the honest bar for a weekly model).
  // The whole recursion is ONE sequential fold in array order: Spark
  // `aggregate` with a named_struct{l, b, s[7], sae, sse, t}
  // accumulator, DuckDB list_reduce over 12-element LIST states with
  // a prepended seed (the q210 same-type trick); every arithmetic
  // step is the identical IEEE expression on both sides. Scale
  // shape: q210's — day-grid arrays after DailyCloses' one partial
  // agg, volume-independent folds, |types| output rows.
  private def q233(s: SparkSession, dir: String): DataFrame =
    holtWinters(graft.operators.DailyCloses.closes(
      graft.operators.DailyCloses.state(Tables.events(s, dir))))

  private[graft] def holtWinters(cl: DataFrame): DataFrame = {
    val slot = "a.t % 7"
    val lNew = s"0.2 * (x - a.s[$slot]) + 0.8 * (a.l + a.b)"
    val fc = s"(a.l + a.b) + a.s[$slot]"
    val base = cl
      .select(col("event_type"), struct(col("day"), col("close_lv")).as("pr"))
      .groupBy(col("event_type"))
      .agg(sort_array(collect_list(col("pr"))).as("ps"))
      .withColumn("xs", expr("transform(ps, p -> CAST(p.close_lv AS DOUBLE))"))
      .withColumn("m7", expr(
        "IF(size(xs) >= 9, ((((((xs[0] + xs[1]) + xs[2]) + xs[3]) + xs[4]) + xs[5]) + xs[6])" +
          " / CAST(7 AS DOUBLE), CAST(NULL AS DOUBLE))"))
      .withColumn("s0", expr(
        "IF(size(xs) >= 9, transform(slice(xs, 1, 7), x -> x - m7), CAST(NULL AS array<double>))"))
      .withColumn("hw", expr(
        "IF(size(xs) >= 9, aggregate(slice(xs, 8, size(xs) - 7), " +
          "named_struct('l', m7, 'b', CAST(0.0 AS DOUBLE), 's', s0, " +
          "'sae', CAST(0.0 AS DOUBLE), 'sse', CAST(0.0 AS DOUBLE), 't', 7), " +
          "(a, x) -> named_struct(" +
          s"'l', $lNew, " +
          s"'b', 0.1 * (($lNew) - a.l) + 0.9 * a.b, " +
          s"'s', transform(sequence(0, 6), i -> IF(i = $slot, " +
          s"0.3 * (x - ($lNew)) + 0.7 * a.s[i], a.s[i])), " +
          s"'sae', a.sae + abs(x - ($fc)), " +
          s"'sse', a.sse + (x - ($fc)) * (x - ($fc)), " +
          "'t', a.t + 1)), NULL)"))
      .withColumn("en", expr("IF(size(xs) >= 9, " +
        "transform(sequence(7, size(xs) - 1), k -> xs[k] - xs[k - 1]), " +
        "CAST(array() AS array<double>))"))
      .withColumn("esn", expr("IF(size(xs) >= 9, " +
        "transform(sequence(7, size(xs) - 1), k -> xs[k] - xs[k - 7]), " +
        "CAST(array() AS array<double>))"))
      .withColumn("san", expr("aggregate(en, CAST(0.0 AS DOUBLE), (a, e) -> a + abs(e))"))
      .withColumn("ssn", expr("aggregate(esn, CAST(0.0 AS DOUBLE), (a, e) -> a + abs(e))"))
    val nf = when(size(col("xs")) >= 9, (size(col("xs")) - 7).cast("long")).otherwise(lit(0L))
    val n = nf.cast("double")
    base.select(col("event_type"), nf.as("n_fc"),
      when(nf > 0, r4(col("hw.sae") / n / lit(1e6))).as("mae_hw"),
      when(nf > 0, r4(sqrt(col("hw.sse") / n) / lit(1e6))).as("rmse_hw"),
      when(nf > 0, r4(col("san") / n / lit(1e6))).as("mae_naive"),
      when(nf > 0, r4(col("ssn") / n / lit(1e6))).as("mae_snaive"),
      when(col("san") > 0, r4(col("hw.sae") / col("san"))).as("skill_vs_naive"),
      when(col("ssn") > 0, r4(col("hw.sae") / col("ssn"))).as("skill_vs_snaive"))
  }

  // ---------------------------------------------------------------
  // q234 — FUNCTIONAL-DEPENDENCY DISCOVERY (g3 strength): for each
  // candidate FD A→B, the fraction of rows that survive if every A
  // keeps only its MODAL B — the classic g3 measure (Kivinen &
  // Mannila 1995) a profiler runs to find undeclared keys, derived
  // columns, and near-constant relationships before anyone trusts a
  // join. 1.0 = exact FD (the PK row is the built-in sanity check);
  // values near 1 flag "almost-FDs" whose violations are usually
  // data bugs. Exactness: pure integer counts, ONE closing divide.
  // Scale shape: per candidate, one partial-agg shuffle to (A, B)
  // cell grain, a second to A grain — key-grain both, the q216
  // discipline; output is one row per candidate FD.
  private[graft] def fdStrength(obs: DataFrame, rel: String): DataFrame = {
    val cells = obs.groupBy(col("a"), col("b")).agg(count(lit(1)).as("cab"))
    val amax = cells.groupBy(col("a"))
      .agg(max(col("cab")).as("mx"), sum(col("cab")).as("na"), count(lit(1)).as("np"))
    amax.agg(sum(col("na")).as("n_rows"), count(lit(1)).as("n_lhs"),
        sum(col("np")).as("n_pairs"), sum(col("mx")).as("smx"))
      .select(lit(rel).as("fd"), col("n_rows"), col("n_lhs"), col("n_pairs"),
        (floor(col("smx").cast("double") / col("n_rows").cast("double")
          * lit(1e6) + lit(0.5)) / lit(1e6)).as("g3_r6"))
  }

  private def q234(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val l = Tables.lineitem(s, dir)
    val e = Tables.events(s, dir)
    fdStrength(o.select(col("o_orderkey").cast("string").as("a"),
        col("o_custkey").cast("string").as("b")), "orders.o_orderkey->o_custkey")
      .unionByName(fdStrength(o.select(col("o_custkey").cast("string").as("a"),
        col("o_orderpriority").as("b")), "orders.o_custkey->o_orderpriority"))
      .unionByName(fdStrength(o.select(col("o_orderdate").cast("string").as("a"),
        col("o_orderstatus").as("b")), "orders.o_orderdate->o_orderstatus"))
      .unionByName(fdStrength(l.select(col("l_partkey").cast("string").as("a"),
        col("l_suppkey").cast("string").as("b")), "lineitem.l_partkey->l_suppkey"))
      .unionByName(fdStrength(e.select(col("user_id").cast("string").as("a"),
        col("event_type").as("b")), "events.user_id->event_type"))
  }

  // ---------------------------------------------------------------
  // q235 — QUANTILE-NORMALIZATION LOOKUP TABLE: the per-source
  // decile → quality-score-range table a curation pipeline joins
  // against to apply ONE global quality bar across sources whose raw
  // score distributions differ (a P90 web doc and a P90 wiki doc
  // should survive the same gate even though their absolute scores
  // differ — the cross-source comparability problem q161 solves with
  // per-source cutoffs, generalized to the full distribution).
  // Decile assignment is exact integer arithmetic on the global rank
  // ((g·10) DIV n — the q173 quartile rule), ranks ride
  // ChunkedFrame.globalRank (sources × quality-bucket parallelism,
  // no per-source sort task). Output: |sources| × 10 rows of pure
  // integers — min/max score per decile IS the lookup table.
  private def q235(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{ChunkedFrame, QualityGate}
    val base = QualityGate.scored(docs(s, dir))
    val counts = base.groupBy(col("source")).agg(count(lit(1)).as("cnt"))
    ChunkedFrame.globalRank(base, "source", expr("quality_fp DIV 1000000"),
        Seq("quality_fp", "doc_id"))
      .join(broadcast(counts), Seq("source"))
      .withColumn("decile", expr("__g * 10 DIV cnt"))
      .groupBy(col("source"), col("decile"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("quality_fp")).as("min_q_fp"), max(col("quality_fp")).as("max_q_fp"))
  }

  // ---------------------------------------------------------------
  // q236 — GARCH(1,1) VOLATILITY FORECAST BACKTEST: the conditional-
  // variance member of the forecast ladder (q203/q210/q233 forecast
  // the LEVEL; this forecasts the RISK) — σ²_t = ω + α·r²_{t−1} +
  // β·σ²_{t−1} with α=0.1, β=0.85 and variance targeting (ω =
  // 0.05·σ²_unconditional, so the recursion mean-reverts to the
  // sample variance), scored one-step-ahead with the QLIKE loss
  // (r²/σ² + ln σ² — the standard robust vol-forecast loss) against
  // the constant-variance baseline. The unconditional seed comes
  // from EXACT integer sums (micro-log2 return squares in decimal);
  // the recursion is ONE sequential 3-field fold in day order (both
  // engines run the identical IEEE sequence — the q210/q222 class);
  // the baseline closes in EXACT integer arithmetic (Σr² / s2 +
  // (n−1)·ln s2 — no per-day float sum at all). Scale shape: day-
  // grid arrays after the DailyCloses partial agg.
  private def q236(s: SparkSession, dir: String): DataFrame =
    garchBacktest(graft.operators.DailyCloses.closes(
      graft.operators.DailyCloses.state(Tables.events(s, dir))))

  private[graft] def garchBacktest(cl: DataFrame): DataFrame = {
    val base = cl
      .select(col("event_type"), struct(col("day"), col("close_lv")).as("pr"))
      .groupBy(col("event_type"))
      .agg(sort_array(collect_list(col("pr"))).as("ps"))
      .withColumn("xs", expr("transform(ps, p -> p.close_lv)"))
      // micro-log2 integer returns, then squares summed EXACTLY
      .withColumn("rs", expr(
        "IF(size(xs) > 1, transform(sequence(1, size(xs) - 1), k -> xs[k] - xs[k - 1]), " +
          "CAST(array() AS array<bigint>))"))
      .withColumn("n_r", size(col("rs")).cast("long"))
      .withColumn("ss2", expr(
        "aggregate(rs, CAST(0 AS DECIMAL(38,0)), (a, r) -> a + CAST(r AS DECIMAL(38,0)) * CAST(r AS DECIMAL(38,0)))"))
      .withColumn("s2", expr("CAST(ss2 AS DOUBLE) / CAST(n_r AS DOUBLE)"))
      // tail squares (t >= 2) for the exact-baseline closing. The
      // slice is guarded: size(rs) = 0 (a single-close instrument)
      // would hand slice a negative length, which Spark rejects at
      // runtime — the q210 family keeps every slice inside its
      // size-gated IF for the same reason.
      .withColumn("ss2t", expr(
        "IF(size(rs) > 1, aggregate(slice(rs, 2, size(rs) - 1), CAST(0 AS DECIMAL(38,0)), " +
          "(a, r) -> a + CAST(r AS DECIMAL(38,0)) * CAST(r AS DECIMAL(38,0))), " +
          "CAST(0 AS DECIMAL(38,0)))"))
      // fold state [sigma2_prev, prev_r, qlsum] over r_2..r_n
      .withColumn("g", expr(
        "IF(size(rs) > 1 AND s2 > 0, aggregate(slice(rs, 2, size(rs) - 1), " +
          "named_struct('v', s2, 'p', CAST(rs[0] AS DOUBLE), 'ql', CAST(0.0 AS DOUBLE)), " +
          "(a, r) -> named_struct(" +
          "'v', 0.05 * s2 + 0.1 * a.p * a.p + 0.85 * a.v, " +
          "'p', CAST(r AS DOUBLE), " +
          "'ql', a.ql + (CAST(r AS DOUBLE) * CAST(r AS DOUBLE)) / " +
          "(0.05 * s2 + 0.1 * a.p * a.p + 0.85 * a.v) + " +
          "ln(0.05 * s2 + 0.1 * a.p * a.p + 0.85 * a.v))), NULL)"))
    val nf = when(col("n_r") > 1 && col("s2") > 0, col("n_r") - 1).otherwise(lit(0L))
    val n = nf.cast("double")
    val qlc = expr("CAST(ss2t AS DOUBLE)") / col("s2") + n * log(col("s2"))
    base.select(col("event_type"), nf.as("n_fc"),
      when(nf > 0, r4(col("g.ql") / n)).as("qlike_garch_r4"),
      when(nf > 0, r4(qlc / n)).as("qlike_const_r4"),
      when(nf > 0, r4(col("g.ql") / qlc)).as("vol_skill_r4"),
      when(nf > 0, r4(sqrt(col("g.v")) / lit(1e6))).as("last_sigma_r4"))
  }

  // ---------------------------------------------------------------
  // q237 — ZIPF LAW FIT per source: OLS of ln(freq) on ln(rank) over
  // each source's top-1000 terms — the statistical signature of
  // natural text (slope ≈ −1); templated/synthetic/spam corpora bend
  // it, which is why corpus forensics fits it before training on a
  // new source. Ranks ride ChunkedFrame.globalRank on (−tf, term) —
  // no per-source sort task; each term's (ln rank, ln freq) pair
  // quantizes to 1e-8 fixed point BEFORE the OLS sums (the q163
  // discipline), and the five sums ride DECIMAL(38,0) (products of
  // 1e8-scaled logs exceed long). Closing slope/intercept/R² is ONE
  // shared IEEE sequence. Scale: term counting is the vocabulary
  // partial agg; the fit reads 1000 rows per source.
  private def q237(s: SparkSession, dir: String): DataFrame =
    zipfFit(docs(s, dir))

  private[graft] def zipfFit(corpus: DataFrame): DataFrame = {
    val tf = corpus
      .select(col("source"),
        explode(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).as("w"))
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("tf"))
      .withColumn("neg_tf", -col("tf"))
    val ranked = graft.operators.ChunkedFrame.globalRank(
      tf, "source", col("neg_tf"), Seq("neg_tf", "w"))
      .filter(col("__g") < 1000)
      .withColumn("x8", floor(log(col("__g").cast("double") + lit(1.0)) * lit(1e8) + lit(0.5)).cast("long"))
      .withColumn("y8", floor(log(col("tf").cast("double")) * lit(1e8) + lit(0.5)).cast("long"))
    def dec(c: Column) = c.cast("decimal(38,0)")
    val g = ranked.groupBy(col("source"))
      .agg(count(lit(1)).as("n_terms"),
        sum(dec(col("x8"))).as("sx"), sum(dec(col("y8"))).as("sy"),
        sum(dec(col("x8")) * dec(col("y8"))).as("sxy"),
        sum(dec(col("x8")) * dec(col("x8"))).as("sxx"),
        sum(dec(col("y8")) * dec(col("y8"))).as("syy"))
    def d(c: Column) = c.cast("double")
    val nn = d(col("n_terms"))
    val num = nn * d(col("sxy")) - d(col("sx")) * d(col("sy"))
    val den = nn * d(col("sxx")) - d(col("sx")) * d(col("sx"))
    val deny = nn * d(col("syy")) - d(col("sy")) * d(col("sy"))
    g.select(col("source"), col("n_terms"),
      when(col("n_terms") > 1, r4(num / den)).as("zipf_slope_r4"),
      when(col("n_terms") > 1,
        r4((d(col("sy")) - num / den * d(col("sx"))) / nn / lit(1e8))).as("intercept_r4"),
      when(col("n_terms") > 1 && deny > 0,
        r4(num / den * (num / deny))).as("r2_r4"))
  }

  // ---------------------------------------------------------------
  // q278 — HEAPS/HERDAN LAW FIT: how fast does each source's
  // vocabulary grow with document length — V ≈ K·mᵝ (Herdan 1960,
  // Heaps 1978), the corpus-forensics companion to q237's Zipf fit
  // (Zipf reads the FREQUENCY profile of one vocabulary; Heaps reads
  // vocabulary GROWTH — natural text sits at β ≈ 0.5–0.8, template/
  // boilerplate text collapses toward 0, random-token soup toward 1):
  // per document, m = tokens and v = distinct tokens (the SAME
  // [a-z0-9]+ tokenizer as q96/q237); β̂ is the OLS slope of ln v on
  // ln m across each source's documents. Exactness: q237's exact
  // discipline verbatim — per-doc ln's quantize to 1e-8 fixed point
  // BEFORE the regression sums (order-free integer sums, decimal-
  // widened per factor), the slope/intercept/r² close in ONE shared
  // IEEE sequence. Single-token docs (m < 2) drop — ln m = 0 makes
  // x degenerate. Scale shape: ONE map-side pass computes both
  // per-doc counts (no explode — size() of the match array), one
  // partial agg to source grain, |sources| output rows. Output:
  // source, n_docs, herdan_beta_r4, ln_k_r4, r2_r4.
  private def q278(s: SparkSession, dir: String): DataFrame =
    heapsFit(docs(s, dir))

  private[graft] def heapsFit(corpus: DataFrame): DataFrame = {
    val per = corpus.select(col("source"),
        expr("size(regexp_extract_all(lower(text), '[a-z0-9]+', 0))")
          .cast("long").as("m"),
        expr("size(array_distinct(regexp_extract_all(lower(text), '[a-z0-9]+', 0)))")
          .cast("long").as("v"))
      .filter(col("m") >= 2 && col("v") >= 1)
      .withColumn("x8", floor(log(col("m").cast("double")) * lit(1e8) + lit(0.5)).cast("long"))
      .withColumn("y8", floor(log(col("v").cast("double")) * lit(1e8) + lit(0.5)).cast("long"))
    def dec(c: Column) = c.cast("decimal(38,0)")
    val g = per.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(dec(col("x8"))).as("sx"), sum(dec(col("y8"))).as("sy"),
        sum(dec(col("x8")) * dec(col("y8"))).as("sxy"),
        sum(dec(col("x8")) * dec(col("x8"))).as("sxx"),
        sum(dec(col("y8")) * dec(col("y8"))).as("syy"))
    def d(c: Column) = c.cast("double")
    val nn = d(col("n_docs"))
    val num = nn * d(col("sxy")) - d(col("sx")) * d(col("sy"))
    val den = nn * d(col("sxx")) - d(col("sx")) * d(col("sx"))
    val deny = nn * d(col("syy")) - d(col("sy")) * d(col("sy"))
    g.select(col("source"), col("n_docs"),
      when(col("n_docs") > 1 && den > 0, r4(num / den)).as("herdan_beta_r4"),
      when(col("n_docs") > 1 && den > 0,
        r4((d(col("sy")) - num / den * d(col("sx"))) / nn / lit(1e8))).as("ln_k_r4"),
      when(col("n_docs") > 1 && den > 0 && deny > 0,
        r4(num / den * (num / deny))).as("r2_r4"))
  }

  // ---------------------------------------------------------------
  // q238 — READABILITY PROFILE per source (Flesch reading ease +
  // Flesch-Kincaid grade): the classic curation signal between
  // q24-style surface quality and q81's LM score — too-easy text is
  // boilerplate/listicles, too-hard is OCR garbage or formula soup.
  // All three counts are regexp_extract_all LENGTHS (words =
  // letter runs, sentences = [.!?] runs min 1, syllables = vowel
  // groups min 1 per word) — exact integers on both engines; each
  // doc's scores close in ONE shared IEEE sequence and quantize to
  // integer cents BEFORE the per-source averaging sum (order-free).
  // The syllable count is computed FLAT, not per word: a vowel run
  // cannot span two words (a non-letter always separates letter
  // runs), so Σ_w max(groups(w), 1) = groups(text) + |words with no
  // vowel| — three text-level regexps instead of a nested per-word
  // scan (the nested form posted a 41.6 s uniform map task at the
  // 100x probe; this one is ~7x cheaper, values identical).
  // Scale shape: pure map pass + one source-grain partial agg.
  private def q238(s: SparkSession, dir: String): DataFrame =
    readability(docs(s, dir))

  private[graft] def readability(d: DataFrame): DataFrame = {
    val words = expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
    val base = d
      .withColumn("nw", size(words).cast("long"))
      .filter(col("nw") > 0)
      .withColumn("ns", greatest(
        size(expr("regexp_extract_all(text, '[.!?]+', 0)")).cast("long"), lit(1L)))
      .withColumn("syl",
        size(expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)")).cast("long")
          + col("nw")
          - size(expr("regexp_extract_all(lower(text), '[a-z]*[aeiouy][a-z]*', 0)")).cast("long"))
      .withColumn("wps", col("nw").cast("double") / col("ns").cast("double"))
      .withColumn("spw", col("syl").cast("double") / col("nw").cast("double"))
      .withColumn("flesch_c", floor(
        (lit(206.835) - lit(1.015) * col("wps") - lit(84.6) * col("spw"))
          * lit(100.0) + lit(0.5)).cast("long"))
      .withColumn("fk_c", floor(
        (lit(0.39) * col("wps") + lit(11.8) * col("spw") - lit(15.59))
          * lit(100.0) + lit(0.5)).cast("long"))
    base.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("flesch_c")).as("sf"), sum(col("fk_c")).as("sk"),
        count(when(col("flesch_c") < 3000L, lit(1))).as("n_hard"))
      .select(col("source"), col("n_docs"),
        (floor(col("sf").cast("double") / col("n_docs").cast("double") + lit(0.5))
          / lit(100.0)).as("mean_flesch_r2"),
        (floor(col("sk").cast("double") / col("n_docs").cast("double") + lit(0.5))
          / lit(100.0)).as("mean_grade_r2"),
        col("n_hard"))
  }

  // ---------------------------------------------------------------
  // q239 — A/B TEST READOUT: the two-sample analysis every
  // experimentation platform runs — a two-proportion z-test on user
  // conversion (≥1 purchase) and a Welch t-test on per-user revenue
  // (Σ value over purchase events, zero for non-purchasers), with
  // the deterministic arm assignment user_id % 2 standing in for the
  // platform's hash bucketing. Exactness: every input to both
  // statistics is an exact integer (user counts, converter counts,
  // revenue in cents summed in decimal, square-cents in decimal);
  // each statistic closes in ONE shared IEEE sequence, and the
  // significance call tests the quantized |z|·1e4 > 19600 integer —
  // no raw float boundary. Scale shape: one user-grain partial agg,
  // then a 2-row arm rollup.
  private def q239(s: SparkSession, dir: String): DataFrame =
    abTest(Tables.events(s, dir))

  private[graft] def abTest(events: DataFrame): DataFrame = {
    val users = events
      .groupBy((col("user_id") % 2).as("arm"), col("user_id"))
      .agg(max(when(col("event_type") === "purchase", lit(1)).otherwise(lit(0))).as("conv"),
        sum(when(col("event_type") === "purchase",
          floor(col("value") * lit(100d) + lit(0.5d)).cast("long")).otherwise(lit(0L))
          .cast("decimal(38,0)")).as("cents"))
    val arms = users.groupBy(col("arm"))
      .agg(count(lit(1)).as("n"), sum(col("conv")).cast("long").as("c"),
        sum(col("cents")).as("s1"),
        sum(col("cents") * col("cents")).as("s2"))
    val a0 = arms.filter(col("arm") === 0).select(col("n").as("n0"), col("c").as("c0"),
      col("s1").as("s10"), col("s2").as("s20"))
    val a1 = arms.filter(col("arm") === 1).select(col("n").as("n1"), col("c").as("c1"),
      col("s1").as("s11"), col("s2").as("s21"))
    def d(c: Column) = c.cast("double")
    val joined = a0.crossJoin(broadcast(a1))
    val p0 = d(col("c0")) / d(col("n0"))
    val p1 = d(col("c1")) / d(col("n1"))
    val pp = (d(col("c0")) + d(col("c1"))) / (d(col("n0")) + d(col("n1")))
    val zConv = (p1 - p0) / sqrt(pp * (lit(1.0) - pp) *
      (lit(1.0) / d(col("n0")) + lit(1.0) / d(col("n1"))))
    // Welch t on per-user revenue cents: sample variance from exact
    // decimal power sums, the q175 moment construction
    val m0 = d(col("s10")) / d(col("n0"))
    val m1 = d(col("s11")) / d(col("n1"))
    val v0 = (d(col("s20")) - d(col("s10")) * d(col("s10")) / d(col("n0"))) /
      (d(col("n0")) - lit(1.0))
    val v1 = (d(col("s21")) - d(col("s11")) * d(col("s11")) / d(col("n1"))) /
      (d(col("n1")) - lit(1.0))
    val tRev = (m1 - m0) / sqrt(v0 / d(col("n0")) + v1 / d(col("n1")))
    val z4 = floor(zConv * lit(1e4) + lit(0.5)).cast("long")
    joined.select(col("n0"), col("n1"), col("c0"), col("c1"),
      r4(p0).as("p0_r4"), r4(p1).as("p1_r4"),
      (z4.cast("double") / lit(1e4)).as("z_conv_r4"),
      (abs(z4) > 19600L).as("significant"),
      r4(m0 / lit(100.0)).as("rev0_r4"), r4(m1 / lit(100.0)).as("rev1_r4"),
      r4(tRev).as("t_rev_r4"))
  }

  // ---------------------------------------------------------------
  // q240 — NAVIGATION ENTROPY RATE: how PREDICTABLE is each state's
  // next step — the Shannon entropy of every row of the q185
  // transition matrix (H_i = −Σ_j P_ij ln P_ij, reported in bits)
  // plus the plug-in entropy RATE of the whole chain (visit-share-
  // weighted average — the behavioral-predictability number next to
  // q200's importance ranking: PageRank says WHERE flow concentrates,
  // this says how DETERMINISTIC it is once there). Exactness: P_ij
  // are exact-integer ratios; each cell's −P ln P ≥ 0 term quantizes
  // to 1e-12 fixed point BEFORE the row sum (order-free); the
  // overall rate weights the per-state integer sums by exact counts
  // in DECIMAL; bits divide by the LITERAL nearest-double of ln 2
  // (no engine's ln(2) call in the closing). Scale shape: the heavy
  // work is the SAME chunked session pass as q185/q200; everything
  // after is ≤ |types|² cells.
  private def q240(s: SparkSession, dir: String): DataFrame =
    navEntropy(Tables.events(s, dir))

  private[graft] def navEntropy(events: DataFrame): DataFrame = {
    val ln2 = 0.6931471805599453
    val cnt = graft.operators.Transitions.counts(events, chunked = true)
    val outs = cnt.groupBy(col("from_type")).agg(sum(col("n_trans")).as("out_n"))
    val p = col("n_trans").cast("double") / col("out_n").cast("double")
    val cells = cnt.join(broadcast(outs), Seq("from_type"))
      .withColumn("tfp", floor(-(p * log(p)) * lit(1e12) + lit(0.5)).cast("long"))
    val per = cells.groupBy(col("from_type"))
      .agg(max(col("out_n")).as("out_trans"), count(lit(1)).as("n_next_states"),
        sum(col("tfp")).as("sfp"))
    val perOut = per.select(col("from_type").as("state"), col("out_trans"),
      col("n_next_states"),
      (floor(col("sfp").cast("double") / lit(1e12) / lit(ln2) * lit(1e6) + lit(0.5))
        / lit(1e6)).as("h_bits_r6"))
    val overall = per.agg(
      sum(col("out_trans")).as("t_total"),
      sum(col("n_next_states")).as("n_cells"),
      // widen EACH factor before the product: out_trans·sfp is a
      // LONG×LONG that wraps once a state has ~5-6M outgoing
      // transitions (sfp ~ H·1e12); the oracle multiplies in HUGEINT,
      // so the decimal widening must happen pre-multiply here too
      sum(col("out_trans").cast("decimal(19,0)") *
        col("sfp").cast("decimal(19,0)")).as("wsum"))
      .select(lit("__overall").as("state"), col("t_total").as("out_trans"),
        col("n_cells").as("n_next_states"),
        (floor(col("wsum").cast("double") / col("t_total").cast("double") / lit(1e12)
          / lit(ln2) * lit(1e6) + lit(0.5)) / lit(1e6)).as("h_bits_r6"))
    perOut.unionByName(overall)
  }

  // ---------------------------------------------------------------
  // q241 — KOLMOGOROV-SMIRNOV TWO-SAMPLE DRIFT TEST: PSI's
  // order-statistic companion — the max ECDF gap between each
  // event_type's early-half and late-half value distributions, at
  // cent resolution (the q227 quantization), with the classic
  // α = 0.05 rejection bound 1.36·√((n₁+n₂)/(n₁n₂)). PSI sees bin
  // mass move; KS sees ANY distributional change, binning-free.
  // Exactness: the statistic is the exact integer
  // max\|n₂·C₁(v) − n₁·C₂(v)\| over observed values (cumulative
  // counts are integers; no float ECDF), and the rejection decision
  // CROSS-SQUARES the bound so no sqrt enters the comparison —
  // D² > 1.36²·(n₁+n₂)·n₁n₂ with both sides exact-integer-derived
  // doubles. Scale shape: one partial agg to (type, cent-value)
  // grain, then cumulative sums via ChunkedFrame.withRunningSum
  // (type × value-band parallelism — no per-type sort task), one
  // max rollup. Output: \|types\| rows.
  private def q241(s: SparkSession, dir: String): DataFrame =
    ksDrift(Tables.events(s, dir)
      .select(col("event_type"), to_date(col("ts")).as("day"), col("value")))

  private[graft] def ksDrift(e: DataFrame): DataFrame = {
    val bounds = e.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val vals = e.crossJoin(broadcast(bounds))
      .withColumn("late",
        datediff(col("day"), col("d0")) >= expr("(datediff(d1, d0) + 1) DIV 2"))
      .filter(col("value").isNotNull)
      .withColumn("vc", floor(col("value") * lit(100d) + lit(0.5d)).cast("long"))
      .groupBy(col("event_type"), col("vc"))
      .agg(count(when(!col("late"), lit(1))).as("a"),
        count(when(col("late"), lit(1))).as("b"))
    val cum1 = graft.operators.ChunkedFrame.withRunningSum(
      vals, "event_type", expr("vc DIV 100"), Seq("vc"), "a", "ca")
    val cum = graft.operators.ChunkedFrame.withRunningSum(
      cum1, "event_type", expr("vc DIV 100"), Seq("vc"), "b", "cb")
    val tot = vals.groupBy(col("event_type"))
      .agg(sum(col("a")).as("na"), sum(col("b")).as("nb"))
    // all integer products widen to decimal BEFORE multiplying:
    // nb·ca (and n_early·n_late) are LONG×LONG that wrap silently
    // once each half exceeds ~3e9 rows per event_type — the oracle
    // mirrors with HUGEINT so the exact-integer parity holds at scale
    val d38 = (c: Column) => c.cast("decimal(19,0)")
    val nn = (d38(col("n_early")) * d38(col("n_late"))).cast("double")
    val dD = col("d_int").cast("double")
    cum.join(broadcast(tot), Seq("event_type"))
      .withColumn("dint",
        abs(d38(col("nb")) * d38(col("ca")) - d38(col("na")) * d38(col("cb"))))
      .groupBy(col("event_type"))
      .agg(max(col("na")).as("n_early"), max(col("nb")).as("n_late"),
        max(col("dint")).as("d_int"))
      .select(col("event_type"), col("n_early"), col("n_late"),
        (floor(dD / nn * lit(1e6) + lit(0.5)) / lit(1e6)).as("ks_r6"),
        (dD * dD > lit(1.8496) *
          ((col("n_early") + col("n_late")).cast("double") * nn)).as("reject"))
  }

  // ---------------------------------------------------------------
  // q242 — COHORT LTV CURVES: cumulative purchase revenue per user
  // by (signup-week cohort, weeks-since-first-event) — the
  // lifetime-value readout next to q184's retention counts (retention
  // says users came back, LTV says what that was worth). Cohorts and
  // ages are exact integer week indices off the feed's global first
  // day (datediff DIV 7 — no timezone-dependent week truncation);
  // revenue quantizes ONCE to cents; the cumulative sum runs over
  // the ≤|weeks|² cohort grid, never over events. Exactness: pure
  // integers + ONE closing divide per cell. Scale shape: one
  // user-grain first-event agg, one (user, age) partial agg, then
  // grid-sized work.
  private def q242(s: SparkSession, dir: String): DataFrame =
    cohortLtv(Tables.events(s, dir))

  private[graft] def cohortLtv(events: DataFrame): DataFrame = {
    val e = events.select(col("user_id"), to_date(col("ts")).as("day"),
      col("event_type"), col("value"))
    val d0t = e.agg(min(col("day")).as("d0"))
    val first = e.groupBy(col("user_id")).agg(min(col("day")).as("first_day"))
    val cohorts = first.crossJoin(broadcast(d0t))
      .select(col("user_id"),
        expr("CAST(datediff(first_day, d0) DIV 7 AS BIGINT)").as("cohort_wk"),
        col("first_day"))
    val sizes = cohorts.groupBy(col("cohort_wk")).agg(count(lit(1)).as("n_users"))
    val rev = e.filter(col("event_type") === "purchase")
      .join(cohorts, Seq("user_id"))
      .groupBy(col("cohort_wk"),
        expr("CAST(datediff(day, first_day) DIV 7 AS BIGINT)").as("age_wk"))
      .agg(sum(floor(col("value") * lit(100d) + lit(0.5d)).cast("long")).as("rev_cents"))
    // dense age axis per cohort so the cumulative curve has no holes
    val maxAge = rev.groupBy(col("cohort_wk")).agg(max(col("age_wk")).as("mx"))
    val grid = maxAge.select(col("cohort_wk"),
        explode(expr("sequence(0L, mx)")).as("age_wk"))
      .join(rev, Seq("cohort_wk", "age_wk"), "left")
      .withColumn("rev_cents", coalesce(col("rev_cents"), lit(0L)))
    val w = Window.partitionBy(col("cohort_wk")).orderBy(col("age_wk"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.withColumn("cum_cents", sum(col("rev_cents")).over(w))
      .join(broadcast(sizes), Seq("cohort_wk"))
      .select(col("cohort_wk"), col("age_wk"), col("n_users"),
        (floor(col("rev_cents").cast("double") / lit(100.0) * lit(100.0) + lit(0.5))
          / lit(100.0)).as("week_rev_r2"),
        (floor(col("cum_cents").cast("double") / col("n_users").cast("double")
          + lit(0.5)) / lit(100.0)).as("ltv_per_user_r2"))
  }

  // ---------------------------------------------------------------
  // q243 — ORDER RECONCILIATION AUDIT: does the order header's total
  // match the sum of its lines (extendedprice·(1−discount)·(1+tax))?
  // — the financial-close consistency check every warehouse runs
  // between a fact and its rollup, reported as a histogram of
  // absolute-difference buckets (exact match / ≤ $1 / ≤ $100 /
  // larger / header with no lines). Exactness: each line's amount
  // quantizes to cents with the identical IEEE product before the
  // per-order integer sum; buckets are integer CASE thresholds — no
  // float boundary. Scale shape: one order-grain partial agg on the
  // fact, a key-grain join to headers (the q216 discipline), one
  // bucket rollup; output ≤ 5 rows.
  private def q243(s: SparkSession, dir: String): DataFrame =
    orderRecon(Tables.orders(s, dir), Tables.lineitem(s, dir))

  private[graft] def orderRecon(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val lines = lineitem
      .groupBy(col("l_orderkey"))
      .agg(sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
        (lit(1.0) + col("l_tax")) * lit(100.0) + lit(0.5)).cast("long")).as("line_cents"))
    val joined = orders
      .select(col("o_orderkey"),
        floor(col("o_totalprice") * lit(100d) + lit(0.5d)).cast("long").as("hdr_cents"))
      .join(lines, col("o_orderkey") === col("l_orderkey"), "left")
    val bucket = when(col("line_cents").isNull, lit("no_lines"))
      .when(col("hdr_cents") === col("line_cents"), lit("exact"))
      .when(abs(col("hdr_cents") - col("line_cents")) <= 100L, lit("within_1"))
      .when(abs(col("hdr_cents") - col("line_cents")) <= 10000L, lit("within_100"))
      .otherwise(lit("large"))
    val tot = joined.agg(count(lit(1)).as("n_orders"))
    joined.groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("n"),
        coalesce(sum(abs(col("hdr_cents") - col("line_cents"))), lit(0L)).as("abs_diff_cents"))
      .crossJoin(broadcast(tot))
      .select(col("bucket"), col("n"),
        r4(col("n").cast("double") / col("n_orders").cast("double")).as("share_r4"),
        (floor(col("abs_diff_cents").cast("double") / lit(100.0) * lit(100.0) + lit(0.5))
          / lit(100.0)).as("abs_diff_r2"))
  }

  // ---------------------------------------------------------------
  // q244 — STICKINESS (DAU/MAU): the engagement ratio every product
  // dashboard leads with — daily actives over trailing-30-day
  // actives, per day. The MAU side is exact (no sketch): each
  // user-day presence row CONTRIBUTES to the 30 target days it keeps
  // the user active in — an explode over the bounded presence table
  // (user-DAY grain, not event grain: the distinct collapses the
  // volume first, so the ×30 fan-out multiplies users×days, never
  // rows). Exactness: pure integer distinct counts, one closing
  // divide. Scale shape: one event→(user, day) distinct partial
  // agg is the only volume-sized work; everything after is
  // users×days×30.
  private def q244(s: SparkSession, dir: String): DataFrame =
    stickiness(Tables.events(s, dir))

  private[graft] def stickiness(events: DataFrame): DataFrame = {
    val pres = events.select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val bounds = pres.agg(max(col("day")).as("dmax"))
    val mau = pres
      .withColumn("day2", explode(expr("sequence(day, date_add(day, 29))")))
      .crossJoin(broadcast(bounds)).filter(col("day2") <= col("dmax"))
      .select(col("user_id"), col("day2")).distinct()
      .groupBy(col("day2").as("day")).agg(count(lit(1)).as("mau"))
    val dau = pres.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    mau.join(dau, Seq("day"), "left")
      .withColumn("dau", coalesce(col("dau"), lit(0L)))
      .select(col("day"), col("dau"), col("mau"),
        r4(col("dau").cast("double") / col("mau").cast("double")).as("stickiness_r4"))
  }

  // ---------------------------------------------------------------
  // q264 — JENSEN-SHANNON DRIFT: q229's early-vs-late distribution
  // comparison scored with the JS divergence (Lin 1991) instead of
  // PSI — the BOUNDED, symmetric member of the drift family (PSI
  // explodes when a band empties on one side; JS is capped at 1 bit
  // and is the square of a true metric), so one alarm threshold
  // works across features with wildly different band occupancy.
  // Exactness: counts ride q229's EXACT additive (type, day, band)
  // grid — the SAME psiGrid the streaming maintainer keeps, so the
  // live serve (StreamPipeline.jsServe) is a second closing over the
  // ONE maintained store (the trimmedServe pattern). Shares use
  // q229's Laplace smoothing; each band's term
  // ½p·log2(p/m) + ½q·log2(q/m) (m = (p+q)/2, ≥ 0 per band by
  // convexity) quantizes to 1e-12 fixed point BEFORE the band sum
  // (integer — order-free), and js_r6 closes in integer arithmetic.
  // Scale shape: q229's — one partial-agg shuffle to (type, day,
  // band) grain, |types| output rows.
  private def q264(s: SparkSession, dir: String): DataFrame =
    jsDrift(Tables.events(s, dir)
      .select(col("event_type"), to_date(col("ts")).as("day"), col("value")))

  private[graft] def jsDrift(e: DataFrame): DataFrame = jsFromGrid(psiGrid(e))

  /** q264's closing over any (event_type, day, band, x) grid — ONE
    * code path with the streaming serve (StreamPipeline.jsServe over
    * the SAME maintained grid store psiServe reads). */
  private[graft] def jsFromGrid(grid: DataFrame): DataFrame = {
    val bounds = grid.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val banded = grid.crossJoin(broadcast(bounds))
      .withColumn("late",
        datediff(col("day"), col("d0")) >= expr("(datediff(d1, d0) + 1) DIV 2"))
    val cells = banded.groupBy(col("event_type"), col("band"))
      .agg(coalesce(sum(when(!col("late"), col("x"))), lit(0L)).as("na"),
        coalesce(sum(when(col("late"), col("x"))), lit(0L)).as("nb"))
    val tot = cells.groupBy(col("event_type"))
      .agg(sum(col("na")).as("ta"), sum(col("nb")).as("tb"),
        count(lit(1)).as("nbands"))
    val pa = (col("na").cast("double") + lit(0.5)) /
      (col("ta").cast("double") + lit(0.5) * col("nbands").cast("double"))
    val pb = (col("nb").cast("double") + lit(0.5)) /
      (col("tb").cast("double") + lit(0.5) * col("nbands").cast("double"))
    val m = (pa + pb) / lit(2.0)
    val term = lit(0.5) * pa * log2(pa / m) + lit(0.5) * pb * log2(pb / m)
    cells.join(tot, Seq("event_type"))
      .withColumn("tfp", floor(term * lit(1e12) + lit(0.5)).cast("long"))
      .groupBy(col("event_type"))
      .agg(max(col("ta")).as("n_early"), max(col("tb")).as("n_late"),
        max(col("nbands")).as("n_bands"), sum(col("tfp")).as("sfp"))
      .select(col("event_type"), col("n_early"), col("n_late"), col("n_bands"),
        (expr("(sfp + 500000) DIV 1000000").cast("double") / lit(1e6)).as("js_r6"))
  }

  // ---------------------------------------------------------------
  // q268 — TWO-SAMPLE ANDERSON-DARLING DRIFT (tie-adjusted A²akN,
  // Scholz & Stephens 1987): the TAIL-SENSITIVE member that completes
  // the drift kit — PSI (q229) sees band mass, KS (q241) the single
  // largest ECDF gap, MWU (q250) a location shift, JS (q264) a
  // bounded symmetric score; AD up-weights the distribution's tails
  // by 1/(B(N−B)), which is exactly where risk lives and exactly
  // where KS is least powerful. Same early/late split as q250.
  // Exactness: on the (type, cent) grid the tie-adjusted statistic is
  // a sum of EXACT-INTEGER ratios — doubling clears the half-counts
  // (2B_j = 2·cum − l, 2M_ij = 2·cum_i − a_ij), and the paper's /4
  // in numerator and denominator cancels:
  //   term_ij = l_j·(N·m2_ij − n_i·b2_j)² / (den4_j·n_i·N),
  //   den4_j = b2_j(2N − b2_j) − N·l_j
  // with every product decimal-widened per factor (HUGEINT oracle);
  // the square alone would exceed decimal(38) at the 100 TB regime,
  // so each cell's term is ONE IEEE expression (the q230/q263 cell
  // discipline) quantized to 1e-13 fixed point BEFORE the grid sum —
  // the grid is domain-bounded (≤ ~1e6 cells/type), so the worst-case
  // quantization error ≤ 1e-7 stays below the r6 display. A
  // perfectly mirrored split gives EXACTLY 0 (N·m2 − n·b2 cancels
  // cell-by-cell — spec-pinned); E[A²] = 1 under H₀, so this is a
  // score like PSI/JS, not a fixed-boundary decision. Scale shape:
  // q250's — one partial agg to grid grain, then BOTH cumulatives
  // (pooled and early) from ONE chunk-banded pass
  // (ChunkedFrame.withRunningSums — a second sequential pass re-
  // windowed the grid and measured 35 vs 14 s at 100×), |types|
  // output rows.
  private def q268(s: SparkSession, dir: String): DataFrame =
    andersonDarling(Tables.events(s, dir)
      .select(col("event_type"), to_date(col("ts")).as("day"), col("value")))

  private[graft] def andersonDarling(e: DataFrame): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val dd = (c: Column) => c.cast("double")
    val bounds = e.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val vals = e.crossJoin(broadcast(bounds))
      .withColumn("late",
        datediff(col("day"), col("d0")) >= expr("(datediff(d1, d0) + 1) DIV 2"))
      .filter(col("value").isNotNull)
      .withColumn("vc", floor(col("value") * lit(100d) + lit(0.5d)).cast("long"))
      .groupBy(col("event_type"), col("vc"))
      .agg(count(when(!col("late"), lit(1))).as("a"),
        count(when(col("late"), lit(1))).as("b"))
      .withColumn("l", col("a") + col("b"))
    val cumA = graft.operators.ChunkedFrame.withRunningSums(
      vals, "event_type", expr("vc DIV 100"), Seq("vc"),
      Seq("l" -> "ct", "a" -> "ca"))
    val tot = vals.groupBy(col("event_type"))
      .agg(sum(col("a")).as("n1"), sum(col("b")).as("n2"))
    val g = cumA.join(broadcast(tot), Seq("event_type"))
      .withColumn("nn", col("n1") + col("n2"))
      .withColumn("b2", lit(2L) * col("ct") - col("l"))
      .withColumn("m2a", lit(2L) * col("ca") - col("a"))
      .withColumn("m2b", lit(2L) * (col("ct") - col("ca")) - col("b"))
      .withColumn("den4",
        d38(col("b2")) * d38(lit(2L) * col("nn") - col("b2")) -
          d38(col("nn")) * d38(col("l")))
      .withColumn("e1a",
        d38(col("nn")) * d38(col("m2a")) - d38(col("n1")) * d38(col("b2")))
      .withColumn("e1b",
        d38(col("nn")) * d38(col("m2b")) - d38(col("n2")) * d38(col("b2")))
    val termA = dd(col("l")) * dd(col("e1a")) * dd(col("e1a")) /
      (dd(col("den4")) * dd(col("n1")) * dd(col("nn")))
    val termB = dd(col("l")) * dd(col("e1b")) * dd(col("e1b")) /
      (dd(col("den4")) * dd(col("n2")) * dd(col("nn")))
    val per = g
      .withColumn("tfp",
        when(dd(col("den4")) > 0 && col("n1") > 0 && col("n2") > 0,
          floor((termA + termB) * lit(1e13) + lit(0.5)).cast("decimal(38,0)"))
          .otherwise(lit(0L).cast("decimal(38,0)")))
      .groupBy(col("event_type"))
      .agg(max(col("n1")).as("n1"), max(col("n2")).as("n2"),
        max(col("nn")).as("nn"), sum(col("tfp")).as("sfp"))
    val a2 = dd(col("nn") - lit(1L)) / dd(col("nn")) * (dd(col("sfp")) / lit(1e13))
    per.select(col("event_type"), col("n1").as("n_early"), col("n2").as("n_late"),
      when(col("n1") > 0 && col("n2") > 0,
        floor(a2 * lit(1e6) + lit(0.5)) / lit(1e6)).as("ad_r6"))
  }

  // ---------------------------------------------------------------
  // q265 — MUTUAL INFORMATION + G-TEST: how many BITS does one
  // categorical column carry about another — the information-theoretic
  // strength score next to q230's Cramér's V (V says "associated",
  // MI says how much you LEARN; the G statistic 2·Σo·ln(o/e) is the
  // likelihood-ratio χ² with df = (r−1)(c−1), the test every
  // log-linear-model text recommends over Pearson's χ² for sparse
  // tables). Same two relations as q230. Exactness: all counts are
  // exact integers off ONE (rk, ck) cell grid; margins and n widen
  // to double per factor (the q230 rule); each cell's MI term
  // (o/n)·log2(n·o/(rt·ct)) quantizes to 1e-12 fixed point and each
  // G term o·ln(n·o/(rt·ct)) to 1e-6 fixed point (decimal — o·ln(…)
  // is volume-scale) BEFORE the cell sums; totals clamp at 0 (MI and
  // G are ≥ 0 mathematically; quantization could leave a −ε) and
  // close in integer arithmetic. The α = 0.05 decision joins the
  // shared 40-row χ²(0.95) literal table (StatTables) on df — an
  // integer compare of the QUANTIZED g4, NULL past df 40. Scale
  // shape: q230's — one partial-agg shuffle to cell grain, broadcast
  // margins, 2 output rows.
  private def q265(s: SparkSession, dir: String): DataFrame = {
    val evObs = Tables.events(s, dir)
      .select(col("event_type").as("rk"),
        (dayofweek(col("ts")) - lit(1)).cast("string").as("ck"))
    val ordObs = Tables.orders(s, dir)
      .select(col("o_orderpriority").as("rk"), col("o_orderstatus").as("ck"))
    mutualInfo(evObs, "events.event_type~dow")
      .unionByName(mutualInfo(ordObs, "orders.priority~status"))
  }

  private[graft] def mutualInfo(obs: DataFrame, rel: String): DataFrame = {
    val dd = (c: Column) => c.cast("double")
    val cells = obs.groupBy(col("rk"), col("ck")).agg(count(lit(1)).as("o"))
    val rt = cells.groupBy(col("rk")).agg(sum(col("o")).as("rt"))
    val ct = cells.groupBy(col("ck")).agg(sum(col("o")).as("ct"))
    val dims = cells.agg(sum(col("o")).as("n"))
      .crossJoin(rt.agg(count(lit(1)).as("r_levels")))
      .crossJoin(ct.agg(count(lit(1)).as("c_levels")))
    val ratio = dd(col("n")) * dd(col("o")) / (dd(col("rt")) * dd(col("ct")))
    val miTerm = dd(col("o")) / dd(col("n")) * log2(ratio)
    val gTerm = dd(col("o")) * log(ratio)
    val agg = cells.join(broadcast(rt), Seq("rk")).join(broadcast(ct), Seq("ck"))
      .crossJoin(broadcast(dims))
      .withColumn("mfp", floor(miTerm * lit(1e12) + lit(0.5)).cast("decimal(38,0)"))
      .withColumn("gfp", floor(gTerm * lit(1e6) + lit(0.5)).cast("decimal(38,0)"))
      .groupBy(lit(rel).as("relation"))
      .agg(max(col("n")).as("n"), max(col("r_levels")).as("r_levels"),
        max(col("c_levels")).as("c_levels"),
        greatest(sum(col("mfp")), lit(0L).cast("decimal(38,0)")).as("smi"),
        greatest(sum(col("gfp")), lit(0L).cast("decimal(38,0)")).as("sg"))
      .withColumn("df", (col("r_levels") - lit(1L)) * (col("c_levels") - lit(1L)))
    val g4 = floor(lit(2.0) * (dd(col("sg")) / lit(1e6)) * lit(1e4) + lit(0.5))
      .cast("long")
    agg.join(StatTables.chi2Frame(obs.sparkSession), Seq("df"), "left")
      .select(col("relation"), col("n"), col("r_levels"), col("c_levels"),
        (expr("(smi + 500000) DIV 1000000").cast("double") / lit(1e6))
          .as("mi_bits_r6"),
        (g4.cast("double") / lit(1e4)).as("g_r4"),
        col("df"),
        when(col("q95x1e4").isNotNull, g4 > col("q95x1e4")).as("reject"))
  }

  // ---------------------------------------------------------------
  // q269 — ASSOCIATION RESIDUAL DRILL-DOWN: WHICH cells drive the
  // association — the adjusted standardized Pearson residuals
  // (Haberman 1973) r_ij = (o−e)/√(e(1−p_r)(1−p_c)), the number every
  // analyst reads right after q230 says "associated" and q265 says
  // "this many bits" (|r| > 2 ≈ a cell off its independence
  // expectation at the 5% level). Same two relations; top-10 cells
  // per relation by |r|. Exactness: counts/margins exact integers,
  // e and r close in ONE mirrored IEEE sequence (margins widened per
  // factor — the q230 rule), r quantizes to 1e4 BEFORE the top-k cut
  // and the cut orders by (|r₄|, rk, ck) — a total order, so the
  // selected set is deterministic; degenerate margins (a level
  // holding ALL rows) are excluded by the same guard in both
  // engines. Scale shape: q230's — one partial agg to cell grain,
  // broadcast margins, ≤ 20 output rows.
  private def q269(s: SparkSession, dir: String): DataFrame = {
    val evObs = Tables.events(s, dir)
      .select(col("event_type").as("rk"),
        (dayofweek(col("ts")) - lit(1)).cast("string").as("ck"))
    val ordObs = Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("rk"), col("o_orderpriority").as("ck"))
    assocResiduals(evObs, "events.event_type~dow")
      .unionByName(assocResiduals(ordObs, "customer.mktsegment~orders.priority"))
  }

  private[graft] def assocResiduals(obs: DataFrame, rel: String,
                                    k: Int = 10): DataFrame = {
    val dd = (c: Column) => c.cast("double")
    val cells = obs.groupBy(col("rk"), col("ck")).agg(count(lit(1)).as("o"))
    val rt = cells.groupBy(col("rk")).agg(sum(col("o")).as("rt"))
    val ct = cells.groupBy(col("ck")).agg(sum(col("o")).as("ct"))
    val nn = cells.agg(sum(col("o")).as("n"))
    val e = dd(col("rt")) * dd(col("ct")) / dd(col("n"))
    val resid = (dd(col("o")) - e) /
      sqrt(e * (lit(1.0) - dd(col("rt")) / dd(col("n"))) *
        (lit(1.0) - dd(col("ct")) / dd(col("n"))))
    val r4 = floor(resid * lit(1e4) + lit(0.5)).cast("long")
    cells.join(broadcast(rt), Seq("rk")).join(broadcast(ct), Seq("ck"))
      .crossJoin(broadcast(nn))
      .filter(col("rt") < col("n") && col("ct") < col("n"))
      .withColumn("resid4", r4)
      .orderBy(abs(col("resid4")).desc, col("rk"), col("ck"))
      .limit(k)
      .select(lit(rel).as("relation"), col("rk"), col("ck"), col("o"),
        (floor(e * lit(1e2) + lit(0.5)) / lit(1e2)).as("expected_r2"),
        (col("resid4").cast("double") / lit(1e4)).as("resid_r4"))
  }

  // ---------------------------------------------------------------
  // q270 — BENFORD FIRST-DIGIT AUDIT: does each monetary column's
  // first significant digit follow log10(1 + 1/d) (Newcomb 1881,
  // Benford 1938) — THE forensic-accounting screen for fabricated or
  // truncated amounts, run over orders.totalprice and events.value.
  // Exactness: the digit comes from the STRING head of the exact
  // cent-quantized amount (no float log10 anywhere near the binning);
  // counts are exact integers over the 9-digit domain (absent digits
  // materialize with o = 0 via the literal digit table); the Benford
  // expectation is the shared 1e-12 fixed-point LITERAL table
  // (StatTables.BenfordP1e12 ≡ the VALUES list in the oracle — no
  // engine-local log10); each digit's χ² term (o−e)²/e is ONE IEEE
  // expression quantized to 1e-6 fixed point BEFORE the 9-row sum,
  // and the α = 0.05 decision tests the QUANTIZED chi24 against the
  // FIXED df = 8 boundary 155073 (Chi2Q95x1e4(7) — the df is a
  // property of the 9-digit domain, not the data, so no table join).
  // Scale shape: ONE partial agg to digit grain per relation (9
  // cells), broadcast total, 18 output rows. Volume-independent
  // after the scan by construction.
  private def q270(s: SparkSession, dir: String): DataFrame = {
    val ordAmt = Tables.orders(s, dir)
      .filter(col("o_totalprice").isNotNull)
      .select(floor(col("o_totalprice") * lit(100d) + lit(0.5d))
        .cast("long").as("vc"))
    val evAmt = Tables.events(s, dir)
      .filter(col("value").isNotNull)
      .select(floor(col("value") * lit(100d) + lit(0.5d))
        .cast("long").as("vc"))
    benford(ordAmt, "orders.totalprice")
      .unionByName(benford(evAmt, "events.value"))
  }

  private[graft] def benford(amt: DataFrame, rel: String): DataFrame = {
    val dd = (c: Column) => c.cast("double")
    val cells = amt.filter(col("vc") > 0)
      .withColumn("digit",
        expr("CAST(substring(CAST(vc AS STRING), 1, 1) AS INT)"))
      .groupBy(col("digit")).agg(count(lit(1)).as("o0"))
    val dom = StatTables.benfordFrame(amt.sparkSession)
      .join(cells, Seq("digit"), "left")
      .withColumn("o", coalesce(col("o0"), lit(0L)))
    val tot = dom.agg(sum(col("o")).as("n"))
    val e = dd(col("n")) * (dd(col("p12")) / lit(1e12))
    val term = (dd(col("o")) - e) * (dd(col("o")) - e) / e
    val withT = dom.crossJoin(broadcast(tot))
      .withColumn("tfp", when(col("n") > 0,
        floor(term * lit(1e6) + lit(0.5)).cast("decimal(38,0)")))
    val chi = withT.agg(max(col("n")).as("n"), sum(col("tfp")).as("sfp"))
      .withColumn("chi24",
        floor(dd(col("sfp")) / lit(1e6) * lit(1e4) + lit(0.5)).cast("long"))
    withT.crossJoin(broadcast(chi.select(col("chi24"))))
      .select(lit(rel).as("relation"), col("digit"), col("o").as("n_d"),
        when(col("n") > 0,
          floor(dd(col("o")) / dd(col("n")) * lit(1e6) + lit(0.5)) / lit(1e6))
          .as("share_r6"),
        (expr("(p12 + 500000) DIV 1000000").cast("double") / lit(1e6))
          .as("benford_r6"),
        (col("chi24").cast("double") / lit(1e4)).as("chi2_r4"),
        (col("chi24") > lit(StatTables.Chi2Q95x1e4(7))).as("reject"))
  }

  // ---------------------------------------------------------------
  // q272 — CRAMÉR–VON MISES TWO-SAMPLE DRIFT: the L²-of-ECDF-gap
  // companion completing the drift trio — q241's KS reads the MAX
  // gap (one crossing point decides), q268's AD weights the tails,
  // CvM integrates the WHOLE squared gap (Cramér 1928, von Mises
  // 1931; two-sample form Anderson 1962): T = Σ_v l_v·d_v² /
  // (n₁·n₂·N²) with d_v = n₂·ca_v − n₁·cb_v over the SAME (type,
  // cent) grid and the SAME one fused ChunkedFrame.withRunningSums
  // pass as q268 (pooled ct and early ca together — cb = ct − ca).
  // Exactness: d_v is exact (every product decimal-widened per
  // factor — the square alone would exceed decimal(38) at the
  // 100 TB regime, so each cell's term is ONE IEEE expression
  // quantized to 1e-13 fixed point BEFORE the grid sum, the q268
  // discipline); a perfectly mirrored split gives EXACTLY 0 (d_v
  // cancels cell-by-cell — spec-pinned). E[T] ≈ (1 + 1/N)/6 under
  // H₀ — a score like PSI/JS/AD, not a fixed-boundary decision.
  // Scale shape: q268's — one partial agg to grid grain, one
  // chunk-banded pass, |types| output rows.
  private def q272(s: SparkSession, dir: String): DataFrame =
    cramerVonMises(Tables.events(s, dir)
      .select(col("event_type"), to_date(col("ts")).as("day"), col("value")))

  private[graft] def cramerVonMises(e: DataFrame): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val dd = (c: Column) => c.cast("double")
    val bounds = e.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val vals = e.crossJoin(broadcast(bounds))
      .withColumn("late",
        datediff(col("day"), col("d0")) >= expr("(datediff(d1, d0) + 1) DIV 2"))
      .filter(col("value").isNotNull)
      .withColumn("vc", floor(col("value") * lit(100d) + lit(0.5d)).cast("long"))
      .groupBy(col("event_type"), col("vc"))
      .agg(count(when(!col("late"), lit(1))).as("a"),
        count(when(col("late"), lit(1))).as("b"))
      .withColumn("l", col("a") + col("b"))
    val cumA = graft.operators.ChunkedFrame.withRunningSums(
      vals, "event_type", expr("vc DIV 100"), Seq("vc"),
      Seq("l" -> "ct", "a" -> "ca"))
    val tot = vals.groupBy(col("event_type"))
      .agg(sum(col("a")).as("n1"), sum(col("b")).as("n2"))
    val g = cumA.join(broadcast(tot), Seq("event_type"))
      .withColumn("nn", col("n1") + col("n2"))
      .withColumn("cb", col("ct") - col("ca"))
      .withColumn("dv",
        d38(col("n2")) * d38(col("ca")) - d38(col("n1")) * d38(col("cb")))
    val term = dd(col("l")) * dd(col("dv")) * dd(col("dv")) /
      (dd(col("n1")) * dd(col("n2")) * dd(col("nn")) * dd(col("nn")))
    val per = g
      .withColumn("tfp",
        when(col("n1") > 0 && col("n2") > 0,
          floor(term * lit(1e13) + lit(0.5)).cast("decimal(38,0)"))
          .otherwise(lit(0L).cast("decimal(38,0)")))
      .groupBy(col("event_type"))
      .agg(max(col("n1")).as("n1"), max(col("n2")).as("n2"),
        sum(col("tfp")).as("sfp"))
    per.select(col("event_type"), col("n1").as("n_early"), col("n2").as("n_late"),
      when(col("n1") > 0 && col("n2") > 0,
        floor(dd(col("sfp")) / lit(1e13) * lit(1e6) + lit(0.5)) / lit(1e6))
        .as("cvm_r6"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q270_benford" -> q270 _,
    "q272_cvm_drift" -> q272 _,
    "q278_heaps_fit" -> q278 _,
    "q264_js_drift" -> q264 _,
    "q265_mutual_info" -> q265 _,
    "q268_anderson_darling" -> q268 _,
    "q269_assoc_residuals" -> q269 _,
    "q244_stickiness" -> q244 _,
    "q242_cohort_ltv" -> q242 _,
    "q243_order_recon" -> q243 _,
    "q241_ks_drift" -> q241 _,
    "q240_nav_entropy" -> q240 _,
    "q239_ab_test" -> q239 _,
    "q236_garch_backtest" -> q236 _,
    "q237_zipf_fit" -> q237 _,
    "q238_readability" -> q238 _,
    "q229_psi_drift" -> q229 _,
    "q230_cramers_v" -> q230 _,
    "q231_phonetic_match" -> q231 _,
    "q232_hll_distinct" -> q232 _,
    "q233_holt_winters" -> q233 _,
    "q234_fd_discovery" -> q234 _,
    "q235_quantile_norm" -> q235 _
  )

  val oracleSql: Map[String, String] = Map(
    "q278_heaps_fit" ->
      """WITH per AS (
        |  SELECT source,
        |    len(regexp_extract_all(lower(text), '[a-z0-9]+'))::BIGINT AS m,
        |    len(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+')))::BIGINT AS v
        |  FROM documents
        |), f AS (
        |  SELECT source,
        |    floor(ln(m::DOUBLE) * 1e8 + 0.5)::BIGINT AS x8,
        |    floor(ln(v::DOUBLE) * 1e8 + 0.5)::BIGINT AS y8
        |  FROM per WHERE m >= 2 AND v >= 1
        |), g AS (
        |  SELECT source, count(*)::BIGINT AS n_docs,
        |    sum(x8::HUGEINT) AS sx, sum(y8::HUGEINT) AS sy,
        |    sum(x8::HUGEINT * y8::HUGEINT) AS sxy,
        |    sum(x8::HUGEINT * x8::HUGEINT) AS sxx,
        |    sum(y8::HUGEINT * y8::HUGEINT) AS syy
        |  FROM f GROUP BY 1
        |)
        |SELECT source, n_docs,
        |  CASE WHEN n_docs > 1
        |    AND n_docs::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE > 0 THEN
        |    floor((n_docs::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
        |      / (n_docs::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
        |      * 10000 + 0.5)/10000 END AS herdan_beta_r4,
        |  CASE WHEN n_docs > 1
        |    AND n_docs::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE > 0 THEN
        |    floor((sy::DOUBLE - (n_docs::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
        |        / (n_docs::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE) * sx::DOUBLE)
        |      / n_docs::DOUBLE / 1e8 * 10000 + 0.5)/10000 END AS ln_k_r4,
        |  CASE WHEN n_docs > 1
        |    AND n_docs::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE > 0
        |    AND n_docs::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE > 0 THEN
        |    floor((n_docs::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
        |      / (n_docs::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
        |      * ((n_docs::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
        |        / (n_docs::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE))
        |      * 10000 + 0.5)/10000 END AS r2_r4
        |FROM g""".stripMargin,
    "q270_benford" -> {
      def one(rel: String, src: String) =
        s"""SELECT '$rel' AS relation, digit, o AS n_d,
           |  CASE WHEN n > 0 THEN
           |    floor(o::DOUBLE / n::DOUBLE * 1e6 + 0.5) / 1e6 END AS share_r6,
           |  ((p12 + 500000) // 1000000)::DOUBLE / 1e6 AS benford_r6,
           |  chi24::DOUBLE / 1e4 AS chi2_r4,
           |  chi24 > 155073 AS reject
           |FROM (
           |  SELECT digit, p12, o, n,
           |    floor(sum(CASE WHEN n > 0 THEN
           |        floor((o::DOUBLE - n::DOUBLE * (p12::DOUBLE / 1e12))
           |          * (o::DOUBLE - n::DOUBLE * (p12::DOUBLE / 1e12))
           |          / (n::DOUBLE * (p12::DOUBLE / 1e12)) * 1e6 + 0.5)::HUGEINT END)
           |      OVER ()::DOUBLE / 1e6 * 1e4 + 0.5)::BIGINT AS chi24
           |  FROM (
           |    SELECT digit, p12, coalesce(o, 0)::BIGINT AS o,
           |      sum(coalesce(o, 0)::BIGINT) OVER () AS n
           |    FROM ${StatTables.benfordValuesSql}
           |    LEFT JOIN (
           |      SELECT CAST(substring(vc::VARCHAR, 1, 1) AS INT) AS digit,
           |        count(*)::BIGINT AS o
           |      FROM ($src) WHERE vc > 0 GROUP BY 1
           |    ) c USING (digit)
           |  )
           |)""".stripMargin
      one("orders.totalprice",
        "SELECT floor(o_totalprice * 100 + 0.5)::BIGINT AS vc FROM orders " +
          "WHERE o_totalprice IS NOT NULL") +
        "\nUNION ALL\n" +
        one("events.value",
          "SELECT floor(value * 100 + 0.5)::BIGINT AS vc FROM events " +
            "WHERE value IS NOT NULL")
    },
    "q272_cvm_drift" ->
      """WITH e AS (
        |  SELECT event_type, ts::TIMESTAMP::DATE AS day, value FROM events
        |), bd AS (SELECT min(day) AS d0, max(day) AS d1 FROM e),
        |v AS (
        |  SELECT event_type,
        |    date_diff('day', d0, day) >= (date_diff('day', d0, d1) + 1) // 2 AS late,
        |    floor(value * 100 + 0.5)::BIGINT AS vc
        |  FROM e, bd WHERE value IS NOT NULL
        |), g AS (
        |  SELECT event_type, vc,
        |    count(CASE WHEN NOT late THEN 1 END)::BIGINT AS a,
        |    count(CASE WHEN late THEN 1 END)::BIGINT AS b,
        |    count(*)::BIGINT AS l
        |  FROM v GROUP BY 1, 2
        |), c AS (
        |  SELECT *,
        |    (sum(l) OVER w)::BIGINT AS ct, (sum(a) OVER w)::BIGINT AS ca
        |  FROM g
        |  WINDOW w AS (PARTITION BY event_type ORDER BY vc
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |), t AS (
        |  SELECT event_type, sum(a)::BIGINT AS n1, sum(b)::BIGINT AS n2
        |  FROM g GROUP BY 1
        |), z AS (
        |  SELECT c.event_type, n1, n2, (n1 + n2)::BIGINT AS nn, l,
        |    (ct - ca)::BIGINT AS cb, ca
        |  FROM c JOIN t USING (event_type)
        |), w2 AS (
        |  SELECT *,
        |    (n2::HUGEINT * ca::HUGEINT - n1::HUGEINT * cb::HUGEINT) AS dv
        |  FROM z
        |), terms AS (
        |  SELECT event_type, n1, n2, nn,
        |    CASE WHEN n1 > 0 AND n2 > 0 THEN
        |      floor((l::DOUBLE * dv::DOUBLE * dv::DOUBLE
        |        / (n1::DOUBLE * n2::DOUBLE * nn::DOUBLE * nn::DOUBLE))
        |        * 1e13 + 0.5)::HUGEINT
        |    ELSE 0::HUGEINT END AS tfp
        |  FROM w2
        |)
        |SELECT event_type, max(n1) AS n_early, max(n2) AS n_late,
        |  CASE WHEN max(n1) > 0 AND max(n2) > 0 THEN
        |    floor(sum(tfp)::DOUBLE / 1e13 * 1e6 + 0.5) / 1e6 END AS cvm_r6
        |FROM terms GROUP BY 1""".stripMargin,
    "q269_assoc_residuals" -> {
      def one(rel: String, obs: String) =
        s"""(SELECT relation, rk, ck, o, expected_r2,
           |  resid4::DOUBLE / 1e4 AS resid_r4
           |FROM (
           |  SELECT '$rel' AS relation, rk, ck, o,
           |    floor(rt::DOUBLE * ct::DOUBLE / n::DOUBLE * 1e2 + 0.5) / 1e2
           |      AS expected_r2,
           |    floor((o::DOUBLE - rt::DOUBLE * ct::DOUBLE / n::DOUBLE)
           |      / sqrt((rt::DOUBLE * ct::DOUBLE / n::DOUBLE)
           |        * (1.0 - rt::DOUBLE / n::DOUBLE)
           |        * (1.0 - ct::DOUBLE / n::DOUBLE))
           |      * 1e4 + 0.5)::BIGINT AS resid4
           |  FROM (
           |    SELECT rk, ck, o, rt, ct, n FROM
           |      (SELECT rk, ck, count(*)::BIGINT AS o FROM ($obs) GROUP BY 1, 2) cells
           |      JOIN (SELECT rk, count(*)::BIGINT AS rt FROM ($obs) GROUP BY 1) r
           |        USING (rk)
           |      JOIN (SELECT ck, count(*)::BIGINT AS ct FROM ($obs) GROUP BY 1) c
           |        USING (ck)
           |      CROSS JOIN (SELECT count(*)::BIGINT AS n FROM ($obs)) d
           |    WHERE rt < n AND ct < n
           |  )
           |) ORDER BY abs(resid4) DESC, rk, ck LIMIT 10)""".stripMargin
      one("events.event_type~dow",
        "SELECT event_type AS rk, dayofweek(ts::TIMESTAMP)::VARCHAR AS ck FROM events") +
        "\nUNION ALL\n" +
        one("customer.mktsegment~orders.priority",
          "SELECT c_mktsegment AS rk, o_orderpriority AS ck FROM orders " +
            "JOIN customer ON o_custkey = c_custkey")
    },
    "q268_anderson_darling" ->
      """WITH e AS (
        |  SELECT event_type, ts::TIMESTAMP::DATE AS day, value FROM events
        |), bd AS (SELECT min(day) AS d0, max(day) AS d1 FROM e),
        |v AS (
        |  SELECT event_type,
        |    date_diff('day', d0, day) >= (date_diff('day', d0, d1) + 1) // 2 AS late,
        |    floor(value * 100 + 0.5)::BIGINT AS vc
        |  FROM e, bd WHERE value IS NOT NULL
        |), g AS (
        |  SELECT event_type, vc,
        |    count(CASE WHEN NOT late THEN 1 END)::BIGINT AS a,
        |    count(CASE WHEN late THEN 1 END)::BIGINT AS b,
        |    count(*)::BIGINT AS l
        |  FROM v GROUP BY 1, 2
        |), c AS (
        |  SELECT *,
        |    (sum(l) OVER w)::BIGINT AS ct, (sum(a) OVER w)::BIGINT AS ca
        |  FROM g
        |  WINDOW w AS (PARTITION BY event_type ORDER BY vc
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |), t AS (
        |  SELECT event_type, sum(a)::BIGINT AS n1, sum(b)::BIGINT AS n2
        |  FROM g GROUP BY 1
        |), z AS (
        |  SELECT c.event_type, n1, n2, (n1 + n2)::BIGINT AS nn, l, a, b, ct, ca,
        |    (2 * ct - l)::BIGINT AS b2,
        |    (2 * ca - a)::BIGINT AS m2a,
        |    (2 * (ct - ca) - b)::BIGINT AS m2b
        |  FROM c JOIN t USING (event_type)
        |), w2 AS (
        |  SELECT *,
        |    (b2::HUGEINT * (2 * nn - b2)::HUGEINT - nn::HUGEINT * l::HUGEINT) AS den4,
        |    (nn::HUGEINT * m2a::HUGEINT - n1::HUGEINT * b2::HUGEINT) AS e1a,
        |    (nn::HUGEINT * m2b::HUGEINT - n2::HUGEINT * b2::HUGEINT) AS e1b
        |  FROM z
        |), terms AS (
        |  SELECT event_type, n1, n2, nn,
        |    CASE WHEN den4::DOUBLE > 0 AND n1 > 0 AND n2 > 0 THEN
        |      floor((l::DOUBLE * e1a::DOUBLE * e1a::DOUBLE
        |          / (den4::DOUBLE * n1::DOUBLE * nn::DOUBLE)
        |        + l::DOUBLE * e1b::DOUBLE * e1b::DOUBLE
        |          / (den4::DOUBLE * n2::DOUBLE * nn::DOUBLE)) * 1e13 + 0.5)::HUGEINT
        |    ELSE 0::HUGEINT END AS tfp
        |  FROM w2
        |)
        |SELECT event_type, max(n1) AS n_early, max(n2) AS n_late,
        |  CASE WHEN max(n1) > 0 AND max(n2) > 0 THEN
        |    floor((max(nn) - 1)::DOUBLE / max(nn)::DOUBLE
        |      * (sum(tfp)::DOUBLE / 1e13) * 1e6 + 0.5) / 1e6 END AS ad_r6
        |FROM terms GROUP BY 1""".stripMargin,
    "q264_js_drift" ->
      """WITH e AS (
        |  SELECT event_type, ts::TIMESTAMP::DATE AS day, value FROM events
        |), bd AS (SELECT min(day) AS d0, max(day) AS d1 FROM e),
        |banded AS (
        |  SELECT event_type,
        |    date_diff('day', d0, day) >= (date_diff('day', d0, d1) + 1) // 2 AS late,
        |    CASE WHEN value > 0
        |      THEN CAST(floor(floor(log2(value) * 1e6 + 0.5)::BIGINT / 1000000.0) AS BIGINT)
        |      ELSE -999 END AS band
        |  FROM e, bd
        |), cells AS (
        |  SELECT event_type, band,
        |    count(CASE WHEN NOT late THEN 1 END)::BIGINT AS na,
        |    count(CASE WHEN late THEN 1 END)::BIGINT AS nb
        |  FROM banded GROUP BY 1, 2
        |), tot AS (
        |  SELECT event_type, sum(na)::BIGINT AS ta, sum(nb)::BIGINT AS tb,
        |    count(*)::BIGINT AS nbands
        |  FROM cells GROUP BY 1
        |), shares AS (
        |  SELECT c.event_type, ta, tb, nbands,
        |    (na::DOUBLE + 0.5) / (ta::DOUBLE + 0.5 * nbands::DOUBLE) AS pa,
        |    (nb::DOUBLE + 0.5) / (tb::DOUBLE + 0.5 * nbands::DOUBLE) AS pb
        |  FROM cells c JOIN tot t USING (event_type)
        |), terms AS (
        |  SELECT event_type, ta, tb, nbands,
        |    floor((0.5 * pa * log2(pa / ((pa + pb) / 2.0))
        |         + 0.5 * pb * log2(pb / ((pa + pb) / 2.0))) * 1e12 + 0.5)::BIGINT AS tfp
        |  FROM shares
        |)
        |SELECT event_type, max(ta) AS n_early, max(tb) AS n_late,
        |  max(nbands) AS n_bands,
        |  ((sum(tfp) + 500000) // 1000000)::DOUBLE / 1e6 AS js_r6
        |FROM terms GROUP BY 1""".stripMargin,
    "q265_mutual_info" -> {
      def one(rel: String, obs: String) =
        s"""SELECT '$rel' AS relation, n, r_levels, c_levels,
           |  ((greatest(smi, 0) + 500000) // 1000000)::DOUBLE / 1e6 AS mi_bits_r6,
           |  floor(2.0 * (greatest(sg, 0)::DOUBLE / 1e6) * 1e4 + 0.5)::BIGINT::DOUBLE
           |    / 1e4 AS g_r4,
           |  z.df AS df,
           |  CASE WHEN q95x1e4 IS NOT NULL THEN
           |    floor(2.0 * (greatest(sg, 0)::DOUBLE / 1e6) * 1e4 + 0.5)::BIGINT
           |      > q95x1e4 END AS reject
           |FROM (
           |  SELECT max(n)::BIGINT AS n, max(r_levels)::BIGINT AS r_levels,
           |    max(c_levels)::BIGINT AS c_levels,
           |    (max(r_levels) - 1)::BIGINT * (max(c_levels) - 1)::BIGINT AS df,
           |    sum(mfp) AS smi, sum(gfp) AS sg
           |  FROM (
           |    SELECT o, rt, ct, n, r_levels, c_levels,
           |      floor((o::DOUBLE / n::DOUBLE
           |          * log2(n::DOUBLE * o::DOUBLE / (rt::DOUBLE * ct::DOUBLE)))
           |        * 1e12 + 0.5)::HUGEINT AS mfp,
           |      floor((o::DOUBLE
           |          * ln(n::DOUBLE * o::DOUBLE / (rt::DOUBLE * ct::DOUBLE)))
           |        * 1e6 + 0.5)::HUGEINT AS gfp
           |    FROM (
           |      SELECT rk, ck, count(*)::BIGINT AS o FROM ($obs) GROUP BY 1, 2
           |    ) cells
           |    JOIN (SELECT rk, count(*)::BIGINT AS rt FROM ($obs) GROUP BY 1) r
           |      USING (rk)
           |    JOIN (SELECT ck, count(*)::BIGINT AS ct FROM ($obs) GROUP BY 1) c
           |      USING (ck)
           |    CROSS JOIN (
           |      SELECT count(*)::BIGINT AS n,
           |        count(DISTINCT rk)::BIGINT AS r_levels,
           |        count(DISTINCT ck)::BIGINT AS c_levels
           |      FROM ($obs)) d
           |  )
           |) z LEFT JOIN ${StatTables.chi2ValuesSql} ON chi2.df = z.df""".stripMargin
      one("events.event_type~dow",
        "SELECT event_type AS rk, dayofweek(ts::TIMESTAMP)::VARCHAR AS ck FROM events") +
        "\nUNION ALL\n" +
        one("orders.priority~status",
          "SELECT o_orderpriority AS rk, o_orderstatus AS ck FROM orders")
    },
    "q229_psi_drift" ->
      """WITH e AS (
        |  SELECT event_type, ts::TIMESTAMP::DATE AS day, value FROM events
        |), bd AS (SELECT min(day) AS d0, max(day) AS d1 FROM e),
        |banded AS (
        |  SELECT event_type,
        |    date_diff('day', d0, day) >= (date_diff('day', d0, d1) + 1) // 2 AS late,
        |    CASE WHEN value > 0
        |      THEN CAST(floor(floor(log2(value) * 1e6 + 0.5)::BIGINT / 1000000.0) AS BIGINT)
        |      ELSE -999 END AS band
        |  FROM e, bd
        |), cells AS (
        |  SELECT event_type, band,
        |    count(CASE WHEN NOT late THEN 1 END)::BIGINT AS na,
        |    count(CASE WHEN late THEN 1 END)::BIGINT AS nb
        |  FROM banded GROUP BY 1, 2
        |), tot AS (
        |  SELECT event_type, sum(na)::BIGINT AS ta, sum(nb)::BIGINT AS tb,
        |    count(*)::BIGINT AS nbands
        |  FROM cells GROUP BY 1
        |), terms AS (
        |  SELECT c.event_type, ta, tb, nbands,
        |    floor(((nb::DOUBLE + 0.5) / (tb::DOUBLE + 0.5 * nbands::DOUBLE)
        |         - (na::DOUBLE + 0.5) / (ta::DOUBLE + 0.5 * nbands::DOUBLE))
        |      * ln(((nb::DOUBLE + 0.5) / (tb::DOUBLE + 0.5 * nbands::DOUBLE))
        |          / ((na::DOUBLE + 0.5) / (ta::DOUBLE + 0.5 * nbands::DOUBLE)))
        |      * 1e12 + 0.5)::BIGINT AS tfp
        |  FROM cells c JOIN tot t USING (event_type)
        |)
        |SELECT event_type, max(ta) AS n_early, max(tb) AS n_late,
        |  max(nbands) AS n_bands,
        |  ((sum(tfp) + 500000) // 1000000)::DOUBLE / 1e6 AS psi_r6
        |FROM terms GROUP BY 1""".stripMargin,
    "q230_cramers_v" -> {
      def one(rel: String, obs: String) =
        s"""SELECT '$rel' AS relation, max(n) AS n, max(r_levels) AS r_levels,
           |  max(c_levels) AS c_levels,
           |  floor((sum(tfp)::DOUBLE / 1e8 - max(n)::DOUBLE) * 1e4 + 0.5) / 1e4 AS chi2_r4,
           |  floor(sqrt(greatest(sum(tfp)::DOUBLE / 1e8 - max(n)::DOUBLE, 0.0)
           |    / (max(n)::DOUBLE * (least(max(r_levels), max(c_levels))::DOUBLE - 1.0)))
           |    * 1e6 + 0.5) / 1e6 AS v_r6
           |FROM (
           |  SELECT o, rt, ct, n, r_levels, c_levels,
           |    floor((o::DOUBLE * o::DOUBLE)
           |      / (rt::DOUBLE * ct::DOUBLE / n::DOUBLE) * 1e8 + 0.5)::HUGEINT AS tfp
           |  FROM (
           |    SELECT rk, ck, count(*)::BIGINT AS o FROM ($obs) GROUP BY 1, 2
           |  ) cells
           |  JOIN (SELECT rk, sum(o2)::BIGINT AS rt FROM (
           |    SELECT rk, count(*)::BIGINT AS o2 FROM ($obs) GROUP BY 1) GROUP BY 1) r USING (rk)
           |  JOIN (SELECT ck, sum(o3)::BIGINT AS ct FROM (
           |    SELECT ck, count(*)::BIGINT AS o3 FROM ($obs) GROUP BY 1) GROUP BY 1) c USING (ck)
           |  CROSS JOIN (
           |    SELECT count(*)::BIGINT AS n,
           |      count(DISTINCT rk)::BIGINT AS r_levels,
           |      count(DISTINCT ck)::BIGINT AS c_levels
           |    FROM ($obs)) d
           |)""".stripMargin
      one("events.event_type~dow",
        "SELECT event_type AS rk, dayofweek(ts::TIMESTAMP)::VARCHAR AS ck FROM events") +
        "\nUNION ALL\n" +
        one("customer.mktsegment~orders.priority",
          "SELECT c_mktsegment AS rk, o_orderpriority AS ck FROM orders " +
            "JOIN customer ON o_custkey = c_custkey")
    },
    "q231_phonetic_match" ->
      """WITH t AS (
        |  SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS ts FROM documents
        |), ph AS (
        |  SELECT DISTINCT unnest(list_transform(range(1, len(ts)),
        |    i -> ts[i] || ' ' || ts[i + 1])) AS p
        |  FROM t WHERE len(ts) >= 2
        |), k1 AS (
        |  SELECT p, split_part(p, ' ', 1) AS w1 FROM ph
        |), k2 AS (
        |  SELECT p, w1, translate(w1, 'abcdefghijklmnopqrstuvwxyz0123456789',
        |    '012301200224550126230102020000000000') AS d1
        |  FROM k1
        |), k3 AS (
        |  SELECT p, w1,
        |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |      regexp_replace(regexp_replace(regexp_replace(d1,
        |      '0{2,}', '0', 'g'), '1{2,}', '1', 'g'), '2{2,}', '2', 'g'),
        |      '3{2,}', '3', 'g'), '4{2,}', '4', 'g'), '5{2,}', '5', 'g'),
        |      '6{2,}', '6', 'g') AS dc
        |  FROM k2
        |), k4 AS (
        |  SELECT p,
        |    upper(substr(w1, 1, 1)) ||
        |      rpad(substr(replace(substr(dc, 2), '0', ''), 1, 3), 3, '0') AS blk,
        |    len(p) AS lp
        |  FROM k3
        |), cand AS (
        |  SELECT a.p AS pa, b.p AS pb, a.blk,
        |    floor(jaro_winkler_similarity(a.p, b.p) * 1e6 + 0.5)::BIGINT AS jw6
        |  FROM k4 a JOIN k4 b ON a.blk = b.blk
        |  WHERE a.p < b.p AND abs(a.lp - b.lp) <= 3
        |)
        |SELECT pa AS phrase_a, pb AS phrase_b, blk AS block_key,
        |  jw6::DOUBLE / 1e6 AS jw_r6
        |FROM cand WHERE jw6 >= 850000""".stripMargin,
    "q232_hll_distinct" ->
      """WITH w AS (
        |  SELECT source, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
        |  FROM documents
        |), h AS (
        |  SELECT source, ('0x' || substr(md5(w), 1, 15))::BIGINT AS h FROM w
        |), reg AS (
        |  SELECT source, h % 512 AS bucket,
        |    max(CASE WHEN h // 512 = 0 THEN 52
        |        ELSE 52 - length(bin(h // 512)) END)::INTEGER AS m
        |  FROM h GROUP BY 1, 2
        |), ag AS (
        |  SELECT source, count(*)::BIGINT AS used,
        |    sum((1::BIGINT << (52 - m)))::BIGINT AS sp
        |  FROM reg GROUP BY 1
        |), s2 AS (
        |  SELECT source, used, 512 - used AS v,
        |    sp + (512 - used) * (1::BIGINT << 52) AS sfp
        |  FROM ag
        |), es AS (
        |  SELECT source, used, v,
        |    CASE WHEN 0.7213 / (1.0 + 1.079 / 512.0) * 262144.0 * 4503599627370496.0
        |             / sfp::DOUBLE <= 1280.0 AND v > 0
        |      THEN 512.0 * ln(512.0 / v::DOUBLE)
        |      ELSE 0.7213 / (1.0 + 1.079 / 512.0) * 262144.0 * 4503599627370496.0
        |             / sfp::DOUBLE END AS est
        |  FROM s2
        |), ex AS (
        |  SELECT source, count(*)::BIGINT AS n_exact
        |  FROM (SELECT DISTINCT source, w FROM w) GROUP BY 1
        |)
        |SELECT es.source, n_exact, used AS n_buckets_used,
        |  floor(est * 100.0 + 0.5) / 100.0 AS hll_est_r2,
        |  floor(abs(est - n_exact::DOUBLE) / n_exact::DOUBLE * 1e4 + 0.5) / 1e4 AS rel_err_r4
        |FROM es JOIN ex ON es.source = ex.source""".stripMargin,
    "q244_stickiness" ->
      """WITH p AS (
        |  SELECT DISTINCT user_id, ts::TIMESTAMP::DATE AS day FROM events
        |), bd AS (SELECT max(day) AS dmax FROM p),
        |t AS (
        |  SELECT DISTINCT user_id, day2
        |  FROM (SELECT user_id, unnest(generate_series(day, day + INTERVAL 29 DAY,
        |          INTERVAL 1 DAY))::DATE AS day2 FROM p), bd
        |  WHERE day2 <= dmax
        |), mau AS (
        |  SELECT day2 AS day, count(*)::BIGINT AS mau FROM t GROUP BY 1
        |), dau AS (
        |  SELECT day, count(*)::BIGINT AS dau FROM p GROUP BY 1
        |)
        |SELECT mau.day, coalesce(dau, 0)::BIGINT AS dau, mau,
        |  floor(coalesce(dau, 0)::DOUBLE / mau::DOUBLE * 10000 + 0.5)/10000 AS stickiness_r4
        |FROM mau LEFT JOIN dau ON mau.day = dau.day""".stripMargin,
    "q242_cohort_ltv" ->
      """WITH e AS (
        |  SELECT user_id, ts::TIMESTAMP::DATE AS day, event_type, value FROM events
        |), d0t AS (SELECT min(day) AS d0 FROM e),
        |f AS (SELECT user_id, min(day) AS first_day FROM e GROUP BY 1),
        |c AS (
        |  SELECT user_id, (date_diff('day', d0, first_day) // 7)::BIGINT AS cohort_wk,
        |    first_day
        |  FROM f, d0t
        |), sz AS (SELECT cohort_wk, count(*)::BIGINT AS n_users FROM c GROUP BY 1),
        |r AS (
        |  SELECT cohort_wk, (date_diff('day', first_day, day) // 7)::BIGINT AS age_wk,
        |    sum(floor(value * 100 + 0.5)::BIGINT)::BIGINT AS rev_cents
        |  FROM e JOIN c USING (user_id) WHERE event_type = 'purchase' GROUP BY 1, 2
        |), mx AS (SELECT cohort_wk, max(age_wk) AS mxa FROM r GROUP BY 1),
        |g AS (
        |  SELECT cohort_wk, unnest(range(0, mxa + 1))::BIGINT AS age_wk FROM mx
        |), g2 AS (
        |  SELECT g.cohort_wk, g.age_wk, coalesce(rev_cents, 0)::BIGINT AS rev_cents
        |  FROM g LEFT JOIN r ON g.cohort_wk = r.cohort_wk AND g.age_wk = r.age_wk
        |), cum AS (
        |  SELECT *, sum(rev_cents) OVER (PARTITION BY cohort_wk ORDER BY age_wk
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_cents
        |  FROM g2
        |)
        |SELECT cum.cohort_wk, age_wk, n_users,
        |  floor(rev_cents::DOUBLE / 100.0 * 100.0 + 0.5) / 100.0 AS week_rev_r2,
        |  floor(cum_cents::DOUBLE / n_users::DOUBLE + 0.5) / 100.0 AS ltv_per_user_r2
        |FROM cum JOIN sz ON cum.cohort_wk = sz.cohort_wk""".stripMargin,
    "q243_order_recon" ->
      """WITH l AS (
        |  SELECT l_orderkey,
        |    sum(floor(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) * 100.0
        |      + 0.5)::BIGINT)::BIGINT AS line_cents
        |  FROM lineitem GROUP BY 1
        |), j AS (
        |  SELECT o_orderkey, floor(o_totalprice * 100 + 0.5)::BIGINT AS hdr_cents,
        |    line_cents
        |  FROM orders LEFT JOIN l ON o_orderkey = l_orderkey
        |), t AS (SELECT count(*)::BIGINT AS n_orders FROM j),
        |b AS (
        |  SELECT CASE WHEN line_cents IS NULL THEN 'no_lines'
        |    WHEN hdr_cents = line_cents THEN 'exact'
        |    WHEN abs(hdr_cents - line_cents) <= 100 THEN 'within_1'
        |    WHEN abs(hdr_cents - line_cents) <= 10000 THEN 'within_100'
        |    ELSE 'large' END AS bucket,
        |    hdr_cents, line_cents
        |  FROM j
        |)
        |SELECT bucket, count(*)::BIGINT AS n,
        |  floor(count(*)::DOUBLE / (SELECT n_orders FROM t)::DOUBLE * 10000 + 0.5)/10000
        |    AS share_r4,
        |  floor(coalesce(sum(abs(hdr_cents - line_cents)), 0)::DOUBLE / 100.0 * 100.0
        |    + 0.5) / 100.0 AS abs_diff_r2
        |FROM b GROUP BY 1""".stripMargin,
    "q241_ks_drift" ->
      """WITH e AS (
        |  SELECT event_type, ts::TIMESTAMP::DATE AS day, value FROM events
        |), bd AS (SELECT min(day) AS d0, max(day) AS d1 FROM e),
        |v AS (
        |  SELECT event_type,
        |    date_diff('day', d0, day) >= (date_diff('day', d0, d1) + 1) // 2 AS late,
        |    floor(value * 100 + 0.5)::BIGINT AS vc
        |  FROM e, bd WHERE value IS NOT NULL
        |), g AS (
        |  SELECT event_type, vc,
        |    count(CASE WHEN NOT late THEN 1 END)::BIGINT AS a,
        |    count(CASE WHEN late THEN 1 END)::BIGINT AS b
        |  FROM v GROUP BY 1, 2
        |), c AS (
        |  SELECT *, sum(a) OVER w AS ca, sum(b) OVER w AS cb
        |  FROM g WINDOW w AS (PARTITION BY event_type ORDER BY vc
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |), t AS (
        |  SELECT event_type, sum(a)::BIGINT AS na, sum(b)::BIGINT AS nb FROM g GROUP BY 1
        |), d AS (
        |  SELECT c.event_type, na, nb,
        |    max(abs(nb::HUGEINT * ca::HUGEINT - na::HUGEINT * cb::HUGEINT)) AS d_int
        |  FROM c JOIN t USING (event_type) GROUP BY 1, 2, 3
        |)
        |SELECT event_type, na AS n_early, nb AS n_late,
        |  floor(d_int::DOUBLE / (na::HUGEINT * nb::HUGEINT)::DOUBLE * 1e6 + 0.5)/1e6 AS ks_r6,
        |  d_int::DOUBLE * d_int::DOUBLE
        |    > 1.8496 * ((na + nb)::DOUBLE * (na::HUGEINT * nb::HUGEINT)::DOUBLE) AS reject
        |FROM d""".stripMargin,
    "q240_nav_entropy" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, ts::TIMESTAMP AS ts FROM events
        |), g AS (
        |  SELECT *, lag(event_type) OVER w AS prev_type,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), cnt AS (
        |  SELECT prev_type AS f, event_type AS t2, count(*)::BIGINT AS n
        |  FROM g WHERE new_s = 0 AND prev_type IS NOT NULL GROUP BY 1, 2
        |), outs AS (
        |  SELECT f, sum(n)::BIGINT AS out_n FROM cnt GROUP BY 1
        |), cells AS (
        |  SELECT cnt.f, out_n,
        |    floor(-((n::DOUBLE / out_n::DOUBLE) * ln(n::DOUBLE / out_n::DOUBLE))
        |      * 1e12 + 0.5)::BIGINT AS tfp
        |  FROM cnt JOIN outs ON cnt.f = outs.f
        |), per AS (
        |  SELECT f, max(out_n)::BIGINT AS out_trans, count(*)::BIGINT AS n_next_states,
        |    sum(tfp)::BIGINT AS sfp
        |  FROM cells GROUP BY 1
        |)
        |SELECT f AS state, out_trans, n_next_states,
        |  floor(sfp::DOUBLE / 1e12 / 0.6931471805599453 * 1e6 + 0.5) / 1e6 AS h_bits_r6
        |FROM per
        |UNION ALL
        |SELECT '__overall', sum(out_trans)::BIGINT, sum(n_next_states)::BIGINT,
        |  floor(sum(out_trans::HUGEINT * sfp::HUGEINT)::DOUBLE / sum(out_trans)::DOUBLE
        |    / 1e12 / 0.6931471805599453 * 1e6 + 0.5) / 1e6
        |FROM per""".stripMargin,
    "q239_ab_test" ->
      """WITH u AS (
        |  SELECT user_id % 2 AS arm, user_id,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv,
        |    sum(CASE WHEN event_type = 'purchase'
        |        THEN floor(value * 100 + 0.5)::BIGINT ELSE 0 END)::HUGEINT AS cents
        |  FROM events GROUP BY 1, 2
        |), a AS (
        |  SELECT arm, count(*)::BIGINT AS n, sum(conv)::BIGINT AS c,
        |    sum(cents) AS s1, sum(cents * cents) AS s2
        |  FROM u GROUP BY 1
        |), j AS (
        |  SELECT a0.n AS n0, a0.c AS c0, a0.s1 AS s10, a0.s2 AS s20,
        |         a1.n AS n1, a1.c AS c1, a1.s1 AS s11, a1.s2 AS s21
        |  FROM (SELECT * FROM a WHERE arm = 0) a0
        |  CROSS JOIN (SELECT * FROM a WHERE arm = 1) a1
        |), z AS (
        |  SELECT *,
        |    floor((c1::DOUBLE / n1::DOUBLE - c0::DOUBLE / n0::DOUBLE)
        |      / sqrt(((c0::DOUBLE + c1::DOUBLE) / (n0::DOUBLE + n1::DOUBLE))
        |        * (1.0 - (c0::DOUBLE + c1::DOUBLE) / (n0::DOUBLE + n1::DOUBLE))
        |        * (1.0 / n0::DOUBLE + 1.0 / n1::DOUBLE))
        |      * 1e4 + 0.5)::BIGINT AS z4
        |  FROM j
        |)
        |SELECT n0, n1, c0, c1,
        |  floor(c0::DOUBLE / n0::DOUBLE * 10000 + 0.5)/10000 AS p0_r4,
        |  floor(c1::DOUBLE / n1::DOUBLE * 10000 + 0.5)/10000 AS p1_r4,
        |  z4::DOUBLE / 1e4 AS z_conv_r4,
        |  abs(z4) > 19600 AS significant,
        |  floor(s10::DOUBLE / n0::DOUBLE / 100.0 * 10000 + 0.5)/10000 AS rev0_r4,
        |  floor(s11::DOUBLE / n1::DOUBLE / 100.0 * 10000 + 0.5)/10000 AS rev1_r4,
        |  floor((s11::DOUBLE / n1::DOUBLE - s10::DOUBLE / n0::DOUBLE)
        |    / sqrt(((s20::DOUBLE - s10::DOUBLE * s10::DOUBLE / n0::DOUBLE) / (n0::DOUBLE - 1.0))
        |        / n0::DOUBLE
        |      + ((s21::DOUBLE - s11::DOUBLE * s11::DOUBLE / n1::DOUBLE) / (n1::DOUBLE - 1.0))
        |        / n1::DOUBLE)
        |    * 10000 + 0.5)/10000 AS t_rev_r4
        |FROM z""".stripMargin,
    "q236_garch_backtest" ->
      """WITH e AS (
        |  SELECT event_type, ts::TIMESTAMP AS ts, event_id, value,
        |    ts::TIMESTAMP::DATE AS day,
        |    floor(log2(value) * 1e6 + 0.5)::BIGINT AS lv
        |  FROM events WHERE value > 0
        |), r0 AS (
        |  SELECT *, row_number() OVER (PARTITION BY event_type, day ORDER BY ts, event_id) AS rn
        |  FROM e
        |), c AS (
        |  SELECT event_type, day, arg_max(lv, rn) AS close_lv FROM r0 GROUP BY 1, 2
        |), s AS (
        |  SELECT event_type, list(close_lv ORDER BY day) AS xs FROM c GROUP BY 1
        |), rr AS (
        |  SELECT event_type,
        |    CASE WHEN len(xs) > 1 THEN
        |      list_transform(range(2, len(xs) + 1), k -> xs[k] - xs[k - 1])
        |    ELSE CAST([] AS BIGINT[]) END AS rs
        |  FROM s
        |), m AS (
        |  SELECT event_type, rs, len(rs)::BIGINT AS n_r,
        |    list_reduce(list_prepend(0::HUGEINT,
        |      list_transform(rs, r -> r::HUGEINT * r::HUGEINT)), (a, b) -> a + b) AS ss2,
        |    list_reduce(list_prepend(0::HUGEINT,
        |      list_transform(rs[2:], r -> r::HUGEINT * r::HUGEINT)), (a, b) -> a + b) AS ss2t
        |  FROM rr
        |), v AS (
        |  SELECT event_type, rs, n_r, ss2t,
        |    ss2::DOUBLE / n_r::DOUBLE AS s2
        |  FROM m
        |), g AS (
        |  SELECT event_type, rs, n_r, ss2t, s2,
        |    CASE WHEN n_r > 1 AND s2 > 0 THEN list_reduce(
        |      list_prepend([s2, rs[1]::DOUBLE, 0.0],
        |        list_transform(rs[2:], r -> [r::DOUBLE, 0.0, 0.0])),
        |      (a, e) -> [
        |        0.05 * s2 + 0.1 * a[2] * a[2] + 0.85 * a[1],
        |        e[1],
        |        a[3] + (e[1] * e[1]) / (0.05 * s2 + 0.1 * a[2] * a[2] + 0.85 * a[1])
        |          + ln(0.05 * s2 + 0.1 * a[2] * a[2] + 0.85 * a[1])]) END AS h
        |  FROM v
        |)
        |SELECT event_type,
        |  CASE WHEN n_r > 1 AND s2 > 0 THEN n_r - 1 ELSE 0 END AS n_fc,
        |  CASE WHEN n_r > 1 AND s2 > 0 THEN
        |    floor(h[3] / (n_r - 1)::DOUBLE * 10000 + 0.5)/10000 END AS qlike_garch_r4,
        |  CASE WHEN n_r > 1 AND s2 > 0 THEN
        |    floor((ss2t::DOUBLE / s2 + (n_r - 1)::DOUBLE * ln(s2)) / (n_r - 1)::DOUBLE
        |      * 10000 + 0.5)/10000 END AS qlike_const_r4,
        |  CASE WHEN n_r > 1 AND s2 > 0 THEN
        |    floor(h[3] / (ss2t::DOUBLE / s2 + (n_r - 1)::DOUBLE * ln(s2))
        |      * 10000 + 0.5)/10000 END AS vol_skill_r4,
        |  CASE WHEN n_r > 1 AND s2 > 0 THEN
        |    floor(sqrt(h[1]) / 1e6 * 10000 + 0.5)/10000 END AS last_sigma_r4
        |FROM g""".stripMargin,
    "q237_zipf_fit" ->
      """WITH tf AS (
        |  SELECT source, w, count(*)::BIGINT AS tf
        |  FROM (SELECT source, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
        |        FROM documents)
        |  GROUP BY 1, 2
        |), r AS (
        |  SELECT source, tf,
        |    row_number() OVER (PARTITION BY source ORDER BY tf DESC, w) AS rn
        |  FROM tf
        |), q AS (
        |  SELECT source,
        |    floor(ln(rn::DOUBLE) * 1e8 + 0.5)::BIGINT AS x8,
        |    floor(ln(tf::DOUBLE) * 1e8 + 0.5)::BIGINT AS y8
        |  FROM r WHERE rn <= 1000
        |), g AS (
        |  SELECT source, count(*)::BIGINT AS n_terms,
        |    sum(x8::HUGEINT) AS sx, sum(y8::HUGEINT) AS sy,
        |    sum(x8::HUGEINT * y8::HUGEINT) AS sxy,
        |    sum(x8::HUGEINT * x8::HUGEINT) AS sxx,
        |    sum(y8::HUGEINT * y8::HUGEINT) AS syy
        |  FROM q GROUP BY 1
        |)
        |SELECT source, n_terms,
        |  CASE WHEN n_terms > 1 THEN
        |    floor((n_terms::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
        |      / (n_terms::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
        |      * 10000 + 0.5)/10000 END AS zipf_slope_r4,
        |  CASE WHEN n_terms > 1 THEN
        |    floor((sy::DOUBLE - (n_terms::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
        |        / (n_terms::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE) * sx::DOUBLE)
        |      / n_terms::DOUBLE / 1e8 * 10000 + 0.5)/10000 END AS intercept_r4,
        |  CASE WHEN n_terms > 1
        |    AND n_terms::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE > 0 THEN
        |    floor((n_terms::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
        |      / (n_terms::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
        |      * ((n_terms::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
        |        / (n_terms::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE))
        |      * 10000 + 0.5)/10000 END AS r2_r4
        |FROM g""".stripMargin,
    "q238_readability" ->
      """WITH d AS (
        |  SELECT source,
        |    len(regexp_extract_all(lower(text), '[a-z]+'))::BIGINT AS nw,
        |    greatest(len(regexp_extract_all(text, '[.!?]+')), 1)::BIGINT AS ns,
        |    (len(regexp_extract_all(lower(text), '[aeiouy]+'))
        |      + len(regexp_extract_all(lower(text), '[a-z]+'))
        |      - len(regexp_extract_all(lower(text), '[a-z]*[aeiouy][a-z]*')))::BIGINT AS syl
        |  FROM documents
        |), f AS (
        |  SELECT source,
        |    floor((206.835 - 1.015 * (nw::DOUBLE / ns::DOUBLE)
        |      - 84.6 * (syl::DOUBLE / nw::DOUBLE)) * 100.0 + 0.5)::BIGINT AS flesch_c,
        |    floor((0.39 * (nw::DOUBLE / ns::DOUBLE)
        |      + 11.8 * (syl::DOUBLE / nw::DOUBLE) - 15.59) * 100.0 + 0.5)::BIGINT AS fk_c
        |  FROM d WHERE nw > 0
        |)
        |SELECT source, count(*)::BIGINT AS n_docs,
        |  floor(sum(flesch_c)::DOUBLE / count(*)::DOUBLE + 0.5) / 100.0 AS mean_flesch_r2,
        |  floor(sum(fk_c)::DOUBLE / count(*)::DOUBLE + 0.5) / 100.0 AS mean_grade_r2,
        |  count(CASE WHEN flesch_c < 3000 THEN 1 END)::BIGINT AS n_hard
        |FROM f GROUP BY 1""".stripMargin,
    "q234_fd_discovery" -> {
      def one(fd: String, table: String, a: String, b: String) =
        s"""SELECT '$fd' AS fd, sum(na)::BIGINT AS n_rows, count(*)::BIGINT AS n_lhs,
           |  sum(np)::BIGINT AS n_pairs,
           |  floor(sum(mx)::DOUBLE / sum(na)::DOUBLE * 1e6 + 0.5) / 1e6 AS g3_r6
           |FROM (
           |  SELECT a, max(cab) AS mx, sum(cab) AS na, count(*) AS np
           |  FROM (SELECT $a AS a, $b AS b, count(*)::BIGINT AS cab
           |        FROM $table GROUP BY 1, 2)
           |  GROUP BY 1)""".stripMargin
      Seq(
        one("orders.o_orderkey->o_custkey", "orders", "o_orderkey", "o_custkey"),
        one("orders.o_custkey->o_orderpriority", "orders", "o_custkey", "o_orderpriority"),
        one("orders.o_orderdate->o_orderstatus", "orders", "o_orderdate", "o_orderstatus"),
        one("lineitem.l_partkey->l_suppkey", "lineitem", "l_partkey", "l_suppkey"),
        one("events.user_id->event_type", "events", "user_id", "event_type")
      ).mkString("\nUNION ALL\n")
    },
    "q235_quantile_norm" ->
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
        |  SELECT f.*, row_number() OVER (PARTITION BY source ORDER BY quality_fp, doc_id) - 1 AS g,
        |    cnt
        |  FROM f JOIN n USING (source)
        |)
        |SELECT source, (g * 10) // cnt AS decile, count(*)::BIGINT AS n_docs,
        |  min(quality_fp)::BIGINT AS min_q_fp, max(quality_fp)::BIGINT AS max_q_fp
        |FROM r GROUP BY 1, 2""".stripMargin,
    "q233_holt_winters" -> {
      val slot = "(CAST(a[12] AS BIGINT) % 7)"
      val lNew = s"0.2 * (e[1] - a[$slot + 3]) + 0.8 * (a[1] + a[2])"
      val fc = s"(a[1] + a[2]) + a[$slot + 3]"
      val sSlots = (0 to 6).map { k =>
        s"CASE WHEN $slot = $k THEN 0.3 * (e[1] - ($lNew)) + 0.7 * a[${k + 3}] ELSE a[${k + 3}] END"
      }.mkString(",\n        |        ")
      s"""WITH e AS (
         |  SELECT event_type, ts::TIMESTAMP AS ts, event_id, value,
         |    ts::TIMESTAMP::DATE AS day,
         |    floor(log2(value) * 1e6 + 0.5)::BIGINT AS lv
         |  FROM events WHERE value > 0
         |), r0 AS (
         |  SELECT *, row_number() OVER (PARTITION BY event_type, day ORDER BY ts, event_id) AS rn
         |  FROM e
         |), c AS (
         |  SELECT event_type, day, arg_max(lv, rn) AS close_lv FROM r0 GROUP BY 1, 2
         |), s AS (
         |  SELECT event_type, list(close_lv::DOUBLE ORDER BY day) AS xs FROM c GROUP BY 1
         |), m AS (
         |  SELECT event_type, xs,
         |    CASE WHEN len(xs) >= 9 THEN
         |      ((((((xs[1] + xs[2]) + xs[3]) + xs[4]) + xs[5]) + xs[6]) + xs[7]) / CAST(7 AS DOUBLE)
         |    END AS m7
         |  FROM s
         |), hh AS (
         |  SELECT event_type, xs,
         |    CASE WHEN len(xs) >= 9 THEN list_reduce(
         |      list_prepend([m7, 0.0, xs[1] - m7, xs[2] - m7, xs[3] - m7, xs[4] - m7,
         |          xs[5] - m7, xs[6] - m7, xs[7] - m7, 0.0, 0.0, 7.0],
         |        list_transform(xs[8:], x ->
         |          [x, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0])),
         |      (a, e) -> [
         |        $lNew,
         |        0.1 * (($lNew) - a[1]) + 0.9 * a[2],
         |        $sSlots,
         |        a[10] + abs(e[1] - ($fc)),
         |        a[11] + (e[1] - ($fc)) * (e[1] - ($fc)),
         |        a[12] + 1.0]) END AS h
         |  FROM m
         |), nn AS (
         |  SELECT event_type, xs, h,
         |    CASE WHEN len(xs) >= 9 THEN list_reduce(list_prepend(0.0,
         |      list_transform(range(8, len(xs) + 1), k -> abs(xs[k] - xs[k - 1]))),
         |      (a, b) -> a + b) END AS san,
         |    CASE WHEN len(xs) >= 9 THEN list_reduce(list_prepend(0.0,
         |      list_transform(range(8, len(xs) + 1), k -> abs(xs[k] - xs[k - 7]))),
         |      (a, b) -> a + b) END AS ssn
         |  FROM hh
         |)
         |SELECT event_type,
         |  CASE WHEN len(xs) >= 9 THEN (len(xs) - 7)::BIGINT ELSE 0 END AS n_fc,
         |  CASE WHEN len(xs) >= 9 THEN
         |    floor(h[10] / (len(xs) - 7)::DOUBLE / 1e6 * 10000 + 0.5)/10000 END AS mae_hw,
         |  CASE WHEN len(xs) >= 9 THEN
         |    floor(sqrt(h[11] / (len(xs) - 7)::DOUBLE) / 1e6 * 10000 + 0.5)/10000 END AS rmse_hw,
         |  CASE WHEN len(xs) >= 9 THEN
         |    floor(san / (len(xs) - 7)::DOUBLE / 1e6 * 10000 + 0.5)/10000 END AS mae_naive,
         |  CASE WHEN len(xs) >= 9 THEN
         |    floor(ssn / (len(xs) - 7)::DOUBLE / 1e6 * 10000 + 0.5)/10000 END AS mae_snaive,
         |  CASE WHEN san > 0 THEN floor(h[10] / san * 10000 + 0.5)/10000 END AS skill_vs_naive,
         |  CASE WHEN ssn > 0 THEN floor(h[10] / ssn * 10000 + 0.5)/10000 END AS skill_vs_snaive
         |FROM nn""".stripMargin
    }
  )
}
