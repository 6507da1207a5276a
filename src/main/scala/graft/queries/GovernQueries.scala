package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Round-11 data-governance + entity-resolution surface — the audits
  * and matchers a warehouse team runs over a 100 TB lake before any
  * model training touches it: referential-integrity orphan audits,
  * k-anonymity re-identification risk, fuzzy entity matching
  * (Jaro-Winkler over blocked candidates), sorted-neighborhood dedup
  * blocking (the classic ER alternative to LSH), and slowly-changing-
  * dimension (type 2) builds from an event change log.
  *
  * Parity rules as everywhere in this battery: counts are exact
  * integers; every similarity threshold tests QUANTIZED integers
  * (floor(x·1e6 + 0.5)) or cross-multiplied integer ratios, never a
  * raw double boundary; JaroWinklerExpr is pinned bitwise to DuckDB's
  * jaro_winkler_similarity (see functions/JaroWinkler.scala).
  */
object GovernQueries {

  // q216 — REFERENTIAL-INTEGRITY ORPHAN AUDIT: for each declared
  // FK→PK relation, how many child rows carry a NULL key, how many
  // point at a parent that does not exist (orphans), and how many
  // DISTINCT orphan keys there are — the first data-contract check
  // any warehouse load runs, and the one that catches a truncated
  // parent load before a silent inner-join row loss does. Exactness:
  // pure integer counts. Scale shape: each child scan collapses to
  // KEY GRAIN in one map-side partial agg before any join (the fact
  // table never meets the parent at row grain), and the parent side
  // is its distinct key set — the join is key-grain ⋈ key-grain,
  // AQE free to broadcast the dim-sized parents (part/supplier/
  // customer); output is 4 rows at any volume.
  private[graft] def riAudit(rel: String, child: DataFrame, fk: String,
                             parent: DataFrame, pk: String): DataFrame = {
    val ck = child.groupBy(col(fk).as("k")).agg(count(lit(1)).as("n"))
    val pks = parent.select(col(pk).as("pk_k")).distinct()
    val orphan = col("k").isNotNull && col("pk_k").isNull
    ck.join(pks, col("k") === col("pk_k"), "left")
      .agg(
        coalesce(sum(col("n")), lit(0L)).as("n_rows"),
        coalesce(sum(when(col("k").isNull, col("n"))), lit(0L)).as("n_null"),
        coalesce(sum(when(orphan, col("n"))), lit(0L)).as("n_orphan_rows"),
        count(when(orphan, lit(1))).as("n_orphan_keys"))
      .select(lit(rel).as("relation"), col("n_rows"), col("n_null"),
        col("n_orphan_rows"), col("n_orphan_keys"))
  }

  private def q216(s: SparkSession, dir: String): DataFrame = {
    def audit(rel: String, child: DataFrame, fk: String,
              parent: DataFrame, pk: String): DataFrame =
      riAudit(rel, child, fk, parent, pk)
    Seq(
      audit("lineitem.l_orderkey->orders.o_orderkey",
        Tables.lineitem(s, dir), "l_orderkey", Tables.orders(s, dir), "o_orderkey"),
      audit("lineitem.l_partkey->part.p_partkey",
        Tables.lineitem(s, dir), "l_partkey", Tables.part(s, dir), "p_partkey"),
      audit("lineitem.l_suppkey->supplier.s_suppkey",
        Tables.lineitem(s, dir), "l_suppkey", Tables.supplier(s, dir), "s_suppkey"),
      audit("orders.o_custkey->customer.c_custkey",
        Tables.orders(s, dir), "o_custkey", Tables.customer(s, dir), "c_custkey")
    ).reduce(_ unionByName _)
  }

  // q217 — K-ANONYMITY RISK AUDIT: the re-identification screen run
  // before any user-grain table leaves the lake — group by the
  // quasi-identifier tuple (nation, market segment, account-balance
  // band) and flag every cell whose population is below k = 5: a
  // row in such a cell is re-identifiable by an adversary who knows
  // just those attributes (Sweeney 2002). The dataset's k-anonymity
  // (the minimum cell size) rides along on every row. Exactness:
  // integer counts; the band is floor(bal/2000) — one double divide,
  // identical on both engines. Scale shape: ONE partial-agg shuffle
  // to QI-cell grain; the min-cell scalar broadcasts back; output is
  // |cells| rows (bounded by the QI domain, not the row count).
  private def q217(s: SparkSession, dir: String): DataFrame = {
    val cells = Tables.customer(s, dir)
      .groupBy(col("c_nationkey"),
        col("c_mktsegment"),
        floor(col("c_acctbal") / lit(2000d)).cast("long").as("bal_band"))
      .agg(count(lit(1)).as("n"))
    val kAnon = cells.agg(min(col("n")).as("k_anon"))
    cells.crossJoin(broadcast(kAnon))
      .select(col("c_nationkey"), col("c_mktsegment"), col("bal_band"),
        col("n"), (col("n") < 5).as("risky"), col("k_anon"))
  }

  // q218 — FUZZY ENTITY MATCHING (blocked Jaro-Winkler): find
  // spelling-variant phrase pairs in the corpus vocabulary — the
  // entity-resolution kernel (match product names / vendor strings /
  // author variants) expressed over this corpus's word-bigram
  // phrases. Candidate generation is standard ER BLOCKING: phrases
  // meet only inside a (2-char-prefix) block and only when their
  // lengths differ by ≤ 3 — the all-pairs quadratic never runs.
  // Match rule: Jaro-Winkler ≥ 0.85, tested on floor(jw·1e6 + 0.5)
  // ≥ 850000 so the boundary is an integer comparison (JaroWinklerExpr
  // is bitwise-pinned to DuckDB's jaro_winkler_similarity — verified
  // over 20k random pairs — so the quantized values agree exactly).
  // Scale shape: the phrase table is VOCABULARY-sized (distinct
  // bigrams, one partial-agg dedup of the exploded scan — content
  // growth, not row growth, is what scales it); the block join's
  // fan-out is Σ_blocks |block|², subquadratic under any real prefix
  // distribution (hot-block salting is the q47 machinery if a
  // degenerate prefix appears); output is the match set.
  private def q218(s: SparkSession, dir: String): DataFrame =
    entityMatch(Tables.documents(s, dir))

  private[graft] def entityMatch(docs: DataFrame): DataFrame = {
    val phr = docs
      .select(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)").as("ts"))
      .filter(size(col("ts")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(ts) - 2), i -> concat(ts[i], ' ', ts[i + 1]))")).as("p"))
      .distinct()
    // the candidate join is an EQUI-join on (block, length): the left
    // side explodes its length into the ±3 tolerance band, so the
    // planner shuffles on a compound key and a degenerate 2-char
    // prefix (many phrases, one block) still splits across length
    // cells — a bare-block join would funnel the whole block through
    // one task (the q47 hot-band lesson).
    val a = phr.select(col("p").as("pa"), substring(col("p"), 1, 2).as("blk"),
      length(col("p")).as("la"))
      .withColumn("lb", explode(expr("sequence(la - 3, la + 3)")))
    val b = phr.select(col("p").as("pb"), substring(col("p"), 1, 2).as("blk"),
      length(col("p")).as("lb"))
    a.join(b, Seq("blk", "lb"))
      .filter(col("pa") < col("pb"))
      .withColumn("jw6",
        floor(graft.functions.JaroWinkler.column(col("pa"), col("pb")) * lit(1e6)
          + lit(0.5d)).cast("long"))
      .filter(col("jw6") >= 850000L)
      .select(col("pa").as("phrase_a"), col("pb").as("phrase_b"),
        (col("jw6").cast("double") / lit(1e6)).as("jw_r6"))
  }

  // q219 — SORTED-NEIGHBORHOOD DEDUP BLOCKING: the classic
  // entity-resolution alternative to LSH (Hernández & Stolfo 1995) —
  // sort the corpus by a normalization key (first 16 alphanumeric
  // chars of the lowered text), slide a window of w = 3 over the
  // sorted sequence, and verify only rank-adjacent candidates. The
  // verify is word-set jaccard ≥ 0.5, tested as the exact integer
  // cross-multiplication 2·|∩| ≥ |∪| — no float boundary. The global
  // sort rank comes from ChunkedFrame.globalRank (key prefix as the
  // chunk), NOT a single-task row_number window — the 100 TB answer
  // to "sort the corpus": parallelism stays ∝ volume/chunk through
  // the rank. Candidates materialize by exploding each row into its
  // w following ranks and equi-joining on rank — an equi-join the
  // planner shuffles on an integer key, never a range-condition
  // nested loop. Output: verified pairs with their rank distance and
  // jaccard. Scale shape: rank + explode(w) + one equi-join — O(w·n)
  // candidates by construction, the blocking guarantee itself.
  private def q219(s: SparkSession, dir: String): DataFrame =
    sortedNeighborhood(Tables.documents(s, dir))

  private[graft] def sortedNeighborhood(docs: DataFrame): DataFrame = {
    val d0 = docs.select(
      col("doc_id"),
      expr("substring(regexp_replace(lower(text), '[^a-z0-9]', ''), 1, 16)").as("skey"),
      expr("array_distinct(regexp_extract_all(lower(text), '[a-z0-9]+', 0))").as("ws"))
      .withColumn("__all", lit("all"))
    val ranked = graft.operators.ChunkedFrame.globalRank(
      d0, keyCol = "__all", chunk = substring(col("skey"), 1, 1),
      orderCols = Seq("skey", "doc_id"))
    val l = ranked.select(col("doc_id").as("doc_a"), col("ws").as("wa"), col("__g").as("ga"))
      .filter(size(col("wa")) > 0)
      .withColumn("gb", explode(array(col("ga") + 1, col("ga") + 2, col("ga") + 3)))
    val r = ranked.select(col("doc_id").as("doc_b"), col("ws").as("wb"), col("__g").as("gb"))
      .filter(size(col("wb")) > 0)
    val m = size(array_intersect(col("wa"), col("wb")))
    l.join(r, Seq("gb"))
      .withColumn("m", m)
      .withColumn("u", size(col("wa")) + size(col("wb")) - col("m"))
      .filter(col("m") * 2 >= col("u"))
      .select(col("doc_a"), col("doc_b"), (col("gb") - col("ga")).as("rank_dist"),
        col("m").cast("long").as("n_common"),
        r4(col("m").cast("double") / col("u").cast("double")).as("jac_r4"))
  }

  // q220 — SCD TYPE-2 DIMENSION BUILD: compress each user's event
  // stream into validity intervals of their current state (the
  // event_type as the tracked attribute) — the slowly-changing-
  // dimension build every warehouse runs to turn a change log into
  // an as-of-joinable dimension: one row per state CHANGE, with
  // [valid_from, valid_to) and an is_current flag on the open
  // interval. Exactness: pure column motion — timestamps and strings
  // carry through untouched; version numbers are exact ranks over
  // the unique (ts, event_id) order. Scale shape: the declared plan
  // is CHUNKED end to end (see [[scd2]]) — no task ever sorts one
  // user's whole history, so a dominant-key feed (one user = half
  // the volume, the q182 bot regime) stays block-parallel; the
  // direct two-window form survives as the spec's bitwise twin.
  private def q220(s: SparkSession, dir: String): DataFrame =
    scd2(Tables.events(s, dir))

  /** SCD2 kernel. `chunked = true` (default, the declared plan) never
    * sorts one user's whole history in a single task: the
    * change-detect lag evaluates through ChunkedFrame.withTrailingEval
    * (halo 1 — parallelism ∝ volume/block), and on the compressed
    * change rows the version rank comes from ChunkedFrame.globalRank
    * with `valid_to` recovered by a rank+1 self-join — a dominant-key
    * feed (one user = half the events, the q182 bot regime) stays
    * block-parallel end to end. `chunked = false` is the textbook
    * two-window form, kept for the bitwise-equality spec. */
  private[graft] def scd2(events: DataFrame, chunked: Boolean = true): DataFrame = {
    val base = events.select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
    if (!chunked) {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      base
        .withColumn("prev", lag(col("event_type"), 1).over(w))
        .filter(col("prev").isNull || col("event_type") =!= col("prev"))
        .withColumn("version", row_number().over(w).cast("long"))
        .withColumn("valid_to", lead(col("ts"), 1).over(w))
        .select(col("user_id"), col("version"), col("event_type").as("state"),
          col("ts").as("valid_from"), col("valid_to"),
          col("valid_to").isNull.as("is_current"))
    } else {
      // user-keyed chunking: the offset tables are bounded by nonempty
      // (user, hour) pairs — near event grain on sparse feeds — so the
      // broadcast hint is dropped and AQE decides (the flagsChunked
      // advisory discipline).
      val changes = graft.operators.ChunkedFrame.withTrailingEval(
        base, keyCol = "user_id", chunk = date_trunc("hour", col("ts")),
        orderCols = Seq("ts", "event_id"), haloWidth = 1,
        broadcastOffsets = false) { (df, wBase) =>
        df.withColumn("prev", lag(col("event_type"), 1).over(wBase))
      }.filter(col("prev").isNull || col("event_type") =!= col("prev"))
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      val ranked = graft.operators.ChunkedFrame.globalRank(
        changes, keyCol = "user_id", chunk = date_trunc("hour", col("ts")),
        orderCols = Seq("ts", "event_id"), broadcastOffsets = false)
      val nxt = ranked.select(col("user_id").as("n_user"), col("__g").as("n_g"),
        col("ts").as("n_ts"))
      ranked.join(nxt,
          col("user_id") === col("n_user") && col("__g") + 1 === col("n_g"), "left")
        .select(col("user_id"), (col("__g") + 1).as("version"),
          col("event_type").as("state"), col("ts").as("valid_from"),
          col("n_ts").as("valid_to"), col("n_ts").isNull.as("is_current"))
    }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q216_ri_orphans" -> q216 _,
    "q217_k_anonymity" -> q217 _,
    "q218_entity_match" -> q218 _,
    "q219_sorted_neighborhood" -> q219 _,
    "q220_scd2_build" -> q220 _
  )

  val oracleSql: Map[String, String] = Map(
    "q216_ri_orphans" -> {
      def one(rel: String, child: String, fk: String, parent: String, pk: String) =
        s"""SELECT '$rel' AS relation,
           |  coalesce(sum(n), 0)::BIGINT AS n_rows,
           |  coalesce(sum(CASE WHEN c.k IS NULL THEN n END), 0)::BIGINT AS n_null,
           |  coalesce(sum(CASE WHEN c.k IS NOT NULL AND p.k IS NULL THEN n END), 0)::BIGINT AS n_orphan_rows,
           |  count(CASE WHEN c.k IS NOT NULL AND p.k IS NULL THEN 1 END)::BIGINT AS n_orphan_keys
           |FROM (SELECT $fk AS k, count(*) AS n FROM $child GROUP BY 1) c
           |LEFT JOIN (SELECT DISTINCT $pk AS k FROM $parent) p ON c.k = p.k""".stripMargin
      Seq(
        one("lineitem.l_orderkey->orders.o_orderkey", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        one("lineitem.l_partkey->part.p_partkey", "lineitem", "l_partkey", "part", "p_partkey"),
        one("lineitem.l_suppkey->supplier.s_suppkey", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
        one("orders.o_custkey->customer.c_custkey", "orders", "o_custkey", "customer", "c_custkey")
      ).mkString("\nUNION ALL\n")
    },
    "q217_k_anonymity" ->
      """WITH cells AS (
        |  SELECT c_nationkey, c_mktsegment,
        |    floor(c_acctbal / 2000)::BIGINT AS bal_band, count(*)::BIGINT AS n
        |  FROM customer GROUP BY 1, 2, 3
        |), ka AS (SELECT min(n) AS k_anon FROM cells)
        |SELECT c_nationkey, c_mktsegment, bal_band, n, n < 5 AS risky, k_anon
        |FROM cells CROSS JOIN ka""".stripMargin,
    "q218_entity_match" ->
      """WITH t AS (
        |  SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS ts FROM documents
        |), ph AS (
        |  SELECT DISTINCT unnest(list_transform(range(1, len(ts)),
        |    i -> ts[i] || ' ' || ts[i + 1])) AS p
        |  FROM t WHERE len(ts) >= 2
        |), a AS (SELECT p AS pa, substr(p, 1, 2) AS blk, len(p) AS la FROM ph),
        |b AS (SELECT p AS pb, substr(p, 1, 2) AS blk, len(p) AS lb FROM ph),
        |cand AS (
        |  SELECT pa, pb,
        |    floor(jaro_winkler_similarity(pa, pb) * 1e6 + 0.5)::BIGINT AS jw6
        |  FROM a JOIN b USING (blk)
        |  WHERE pa < pb AND abs(la - lb) <= 3
        |)
        |SELECT pa AS phrase_a, pb AS phrase_b, jw6::DOUBLE / 1e6 AS jw_r6
        |FROM cand WHERE jw6 >= 850000""".stripMargin,
    "q219_sorted_neighborhood" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    substr(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'), 1, 16) AS skey,
        |    list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+')) AS ws
        |  FROM documents
        |), r AS (
        |  SELECT *, row_number() OVER (ORDER BY skey, doc_id) - 1 AS g FROM d
        |), pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, b.g - a.g AS rank_dist,
        |    len(list_intersect(a.ws, b.ws))::BIGINT AS m,
        |    (len(a.ws) + len(b.ws) - len(list_intersect(a.ws, b.ws)))::BIGINT AS u
        |  FROM r a JOIN r b ON b.g >= a.g + 1 AND b.g <= a.g + 3
        |  WHERE len(a.ws) > 0 AND len(b.ws) > 0
        |)
        |SELECT doc_a, doc_b, rank_dist, m AS n_common,
        |  floor(m::DOUBLE / u::DOUBLE * 10000 + 0.5)/10000 AS jac_r4
        |FROM pairs WHERE 2 * m >= u""".stripMargin,
    "q220_scd2_build" ->
      """WITH e AS (
        |  SELECT user_id, ts::TIMESTAMP AS ts, event_id, event_type FROM events
        |), g AS (
        |  SELECT *, lag(event_type) OVER w AS prev FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), c AS (
        |  SELECT * FROM g WHERE prev IS NULL OR event_type <> prev
        |)
        |SELECT user_id, row_number() OVER w2 AS version, event_type AS state,
        |  ts AS valid_from, lead(ts) OVER w2 AS valid_to,
        |  lead(ts) OVER w2 IS NULL AS is_current
        |FROM c WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin
  )
}
