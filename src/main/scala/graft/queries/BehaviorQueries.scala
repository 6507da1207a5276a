package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Round-9 events-analytics surface — the behavioral queries every
  * event pipeline (the reference's `events` stream, post-ingest) runs
  * on top of the raw feed: data profiling, gap-based sessionization,
  * ordered funnel conversion, and cohort retention. Oracle-checked
  * against DuckDB under the battery's exactness discipline: counts
  * and durations stay integers until one final r4-quantized IEEE
  * division shared by both engines.
  */
object BehaviorQueries {

  private def ev(s: SparkSession, dir: String) = Tables.events(s, dir)

  // q181 — TABLE PROFILE: per-column row/null/exact-distinct counts
  // over lineitem — the data-quality readout every warehouse load
  // gates on (and the stats a cost-based optimizer or a skipping
  // catalog is built from; see sources.StatsCatalog for the file-
  // granular sibling). One pass: every column is stacked to (col,
  // value-as-string) rows map-side — the string cast is injectivity-
  // only (distinct counts survive any faithful formatting; values
  // never surface), then ONE (col, value) partial-agg shuffle counts
  // rows/nulls/distincts for all columns together (not one
  // count(DISTINCT) scan per column — 11 scans of 100 TB vs one).
  // Scale shape: the exploded stream is |cols|× the table but
  // map-side-combines to unique values per task before the exchange;
  // at 100 TB the exact-distinct shuffle is the honest cost — the
  // approximate path at volume is the q93 KMV sketch per column.
  /** THE lineitem column list both q181 sides profile — one shared
    * constant so the Spark plan and the DuckDB oracle can never
    * silently diverge (a renamed/added lineitem column previously
    * produced extra/missing profile rows on one side only); the
    * Spark side also asserts the runtime schema matches, so drift
    * fails loudly instead of hash-mismatching downstream. */
  private[queries] val ProfileColTypes: Seq[(String, String)] = Seq(
    "l_orderkey" -> "int", "l_partkey" -> "int", "l_suppkey" -> "int",
    "l_linenumber" -> "int",
    "l_quantity" -> "double", "l_extendedprice" -> "double",
    "l_discount" -> "double", "l_tax" -> "double",
    "l_returnflag" -> "str", "l_linestatus" -> "str", "l_shipdate" -> "ts")

  private[queries] val ProfileCols: Seq[String] = ProfileColTypes.map(_._1)

  private def q181(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val colsN = li.schema.fieldNames.toSeq
    require(colsN == ProfileCols,
      s"q181: lineitem schema drifted from the shared profile column list — " +
        s"got $colsN, oracle profiles $ProfileCols")
    // Round-16 optimization (guide §2.3 narrower types / project before
    // the exchange): the stacked stream is split into a LONG arm (int
    // and timestamp columns — the table's high-cardinality keys) and a
    // STRING arm (double and flag columns). An int column's long cast
    // and a timestamp's epoch-µs are BOTH injective maps of the value,
    // exactly as the oracle's ::VARCHAR rendering is — distinct counts
    // are invariant under any faithful injection, for EVERY input (no
    // corpus assumption; nulls map to null on both sides). Doubles
    // keep the string rendering: the one universally injective image
    // of an IEEE double here (a micro-unit long is injective only on
    // ≤2-decimal money data, and a raw double key would merge -0.0
    // with 0.0 where VARCHAR keeps them apart). The win: the distinct
    // exchange carries 8-byte longs instead of rendered key/timestamp
    // strings for 5 of 11 columns — including the near-unique
    // l_orderkey — and the scan-side explode skips number→string
    // formatting for them; each arm's scan column-prunes to its own
    // columns, so the two explodes together read each column once.
    // (a Skew.fanOut of the input was A/B-measured here and REJECTED:
    // with the long arm the per-row work is cheap enough that the
    // raw-row repartition costs more than the 3-task scan stage —
    // 1.4 s → 2.7 s at sf0.1; q193 keeps it because its md5 + object
    // aggregate per-row work dominates)
    def stackAgg(entries: Seq[(String, Column)]): DataFrame = {
      val stacked = li.select(explode(array(entries.map { case (c, e) =>
          struct(lit(c).as("col_name"), e.as("v")) }: _*)).as("e"))
        .select(col("e.col_name").as("col_name"), col("e.v").as("v"))
      stacked.groupBy(col("col_name"))
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_null"),
          countDistinct(col("v")).as("n_distinct"))
    }
    val longArm = ProfileColTypes.collect {
      case (c, "int") => c -> col(c).cast("long")
      case (c, "ts") => c -> unix_micros(col(c))
    }
    val strArm = ProfileColTypes.collect {
      case (c, k) if k == "double" || k == "str" => c -> col(c).cast("string")
    }
    // exhaustiveness over kind tags (r16 advice): a column added with
    // a NEW kind would silently vanish from the profile — the schema
    // require above checks names only
    require(longArm.size + strArm.size == ProfileColTypes.size,
      s"q181: unhandled profile column kind in $ProfileColTypes")
    stackAgg(longArm).unionByName(stackAgg(strArm))
  }

  // q193 — APPROXIMATE TABLE PROFILE: q181's scale twin. The exact
  // per-column distinct (q181) is the honest 100 TB cost — every
  // unique value of every column crosses one exchange AS A STRING.
  // This twin keeps the EXACT fields that are cheap at any scale
  // (n_rows and per-column n_null come from ONE aggregate row over
  // one scan — no explode, no value shuffle) and replaces the
  // distinct count with a per-column KMV estimate (the q98
  // machinery): each column canonicalizes to a BIGINT pre-hash —
  // numeric/timestamp columns map DIRECTLY (ints verbatim; doubles to
  // micro-units, injective on this ≤2-decimal money corpus;
  // timestamps to epoch-µs: pure codegen arithmetic, no string, no
  // md5), only true string columns pay the md5 detour — and feeds the
  // squared-affine KMV hash that replays exactly in ANSI SQL. The
  // sketch exchange then carries distinct 8-byte hashes (the q163
  // hashed-key rule) instead of q181's unique value STRINGS, and at
  // most k=64 per column reach the estimate. The first cut hashed the
  // STRING rendering of every cell through md5+conv — measured 117 s
  // vs q181's 49 s at 100×: the per-cell md5/conv dominated; the
  // direct-BIGINT canon removes it for 9 of 11 columns.
  // ProfileKmvSpec bounds the estimate error; the 100× probe in
  // BASELINE.md records the cost ratio vs the exact pass.
  /** Delegated to operators.TableProfile (round 10): the per-column
    * state — additive counters + KMV k-min sets — is exactly
    * mergeable, so ONE code path serves this batch query AND the
    * streaming maintainer (StreamPipeline.profileMaintain);
    * ProfileStreamSpec pins maintained ≡ declared bitwise under any
    * split order. */
  private def q193(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    require(li.schema.fieldNames.toSeq == ProfileCols,
      s"q193: lineitem schema drifted from the shared profile column list")
    graft.operators.TableProfile.profile(
      graft.operators.TableProfile.state(li, ProfileColTypes))
  }

  // q182 — GAP SESSIONIZATION (30-minute inactivity): the canonical
  // event-stream operator — consecutive events of a user belong to
  // one session while gaps stay under the timeout; a longer gap opens
  // a new session (the batch twin of streaming.Sessionize's
  // event-time-timeout flatMapGroupsWithState). Islands come from the
  // standard flag-and-running-sum: new-session flag on a >30 min gap
  // (exact integer microsecond comparison), session id as the running
  // flag sum. Summarized per user: session count, max session size,
  // and the mean session duration from exact integer microsecond
  // sums, closed by one shared IEEE division. Scale shape: the flag
  // pass routes through Transitions.flagsChunked (lag-1 via
  // withTrailingEval halo, session id via withRunningSum) — tasks
  // scale with volume/blockSize, so a single bot user carrying half
  // the feed cannot serialize its history into one task (the q109
  // dominant-key ceiling; bot probe recorded in BASELINE.md).
  /** One per-user window pass shared by q182/q185/q190 AND the
    * streaming transition maintainer — delegated to
    * operators.Transitions so stream ≡ batch is the same code, not a
    * copy. The batch queries route through the CHUNKED evaluation
    * (bitwise-equal, TransitionsChunkedSpec-pinned): a dominant bot
    * user — the realistic skew in event feeds — costs two extra
    * shuffles instead of serializing its whole history into one
    * task; the streaming maintainer keeps the direct window because
    * its frames are micro-batch-sized by construction. */
  private def sessionFlags(s: SparkSession, dir: String): DataFrame =
    graft.operators.Transitions.flags(ev(s, dir), chunked = true)

  private def q182(s: SparkSession, dir: String): DataFrame = {
    val sess = sessionFlags(s, dir)
      .groupBy(col("user_id"), col("sid"))
      .agg(count(lit(1)).as("n_ev"),
        (unix_micros(max(col("ts"))) - unix_micros(min(col("ts")))).as("dur_us"))
    sess.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("n_ev")).as("total_events"),
        max(col("n_ev")).as("max_session_events"),
        sum(col("dur_us")).as("sum_us"))
      .select(col("user_id"), col("n_sessions"), col("total_events"),
        col("max_session_events"),
        r4(col("sum_us").cast("double") / col("n_sessions").cast("double") / lit(1e6))
          .as("avg_session_secs"))
  }

  // q185 — SESSION TRANSITION MATRIX: the within-session next-event
  // Markov model — how often does a view lead to a click, a click to
  // a purchase, an error to an exit — the navigation-flow readout
  // product analytics builds from the same sessionized stream (and
  // the transition model behind Markov-chain attribution). A
  // transition is a consecutive event pair INSIDE one session: the
  // q182 window pass already carries the previous event's type and
  // the new-session flag, so transitions are exactly the rows with
  // new_s = 0 — no second window, no self-join. Counts are exact
  // integers; the row-conditional probability closes with one r4
  // division against the per-from-type total (a |types|²-row frame —
  // the tiny window is volume-independent). Scale shape: ONE per-user
  // window pass (shared with q182) + one (from, to) partial-agg
  // shuffle; output is |types|² at any volume.
  private def q185(s: SparkSession, dir: String): DataFrame = {
    val trans = graft.operators.Transitions.counts(ev(s, dir), chunked = true)
    trans
      .withColumn("from_total",
        sum(col("n_trans")).over(Window.partitionBy(col("from_type"))))
      .select(col("from_type"), col("to_type"), col("n_trans"),
        r4(col("n_trans").cast("double") / col("from_total").cast("double"))
          .as("p_trans"))
  }

  // q189 — RFM SEGMENTATION: recency / frequency / monetary per user
  // with discrete quartile scores (4 = best) and the composed RFM
  // segment — the standard customer-value model every events
  // warehouse materializes. Exactness: monetary is an exact decimal
  // sum r2-rounded BEFORE ranking (so rank ties are engine-portable),
  // recency is integer day arithmetic against the feed's max day,
  // and quartiles use the q173 discrete arithmetic (rank·4 DIV n —
  // no percentile interpolation, no ntile nondeterminism). Scale
  // shape: one user-keyed partial agg over the events, then THREE
  // rank passes on the |users| table via ChunkedFrame.globalRank
  // (metric-bucket chunks — no single-task global sort even at 1e9
  // users); the 1-row asof/count frames broadcast.
  /** Delegated to operators.Rfm (round 10): the user state (max day /
    * count / exact decimal sum) is order-insensitively mergeable, so
    * ONE code path serves this batch query AND the streaming
    * maintainer (StreamPipeline.rfmMaintain); RfmStreamSpec pins
    * maintained ≡ declared bitwise under shuffled splits. The ONE-
    * events-scan + eager-persist discipline (14.8 s -> 3.9 s at 100x)
    * lives in Rfm.segment. */
  private def q189(s: SparkSession, dir: String): DataFrame =
    graft.operators.Rfm.segment(graft.operators.Rfm.userState(ev(s, dir)))

  // q190 — SESSION CO-OCCURRENCE LIFT: the association-rules readout
  // over the sessionized stream — for every event-type pair, how much
  // more often do A and B share a session than independence predicts
  // (lift = P(A,B)/(P(A)·P(B)), support = P(A,B)) — the market-basket
  // primitive behind "users who error also churn" dashboards.
  // Composition: q182's session ids → distinct (session, type) →
  // a session-keyed self-join bounded by |types|² per session → exact
  // integer counts closed by two r4 divisions. Scale shape: one
  // per-user window pass (shared Transitions code), one distinct
  // shuffle on (user, sid, type), a self-join whose per-session
  // output is ≤ |types|² rows, and |types|-row presence tables
  // broadcast back; output is the |types|² matrix at any volume.
  private def q190(s: SparkSession, dir: String): DataFrame = {
    val st = graft.operators.Transitions.flags(ev(s, dir), chunked = true)
      .select(col("user_id"), col("sid"), col("event_type"))
      .distinct()
      .persist()
    st.count() // referenced four times below; session-type grain only
    val nSess = st.select(col("user_id"), col("sid")).distinct()
      .agg(count(lit(1)).as("n_sessions"))
    val singles = st.groupBy(col("event_type")).agg(count(lit(1)).as("n_single"))
    val pairs = st.select(col("user_id"), col("sid"), col("event_type").as("type_a"))
      .join(st.select(col("user_id"), col("sid"), col("event_type").as("type_b")),
        Seq("user_id", "sid"))
      .filter(col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n_both"))
    def d(c: Column) = c.cast("double")
    pairs
      .join(broadcast(singles.select(col("event_type").as("type_a"), col("n_single").as("n_a"))),
        Seq("type_a"))
      .join(broadcast(singles.select(col("event_type").as("type_b"), col("n_single").as("n_b"))),
        Seq("type_b"))
      .crossJoin(broadcast(nSess))
      .select(col("type_a"), col("type_b"), col("n_both"), col("n_a"), col("n_b"),
        r4(d(col("n_both")) / d(col("n_sessions"))).as("support"),
        r4(d(col("n_both")) * d(col("n_sessions")) / (d(col("n_a")) * d(col("n_b"))))
          .as("lift"))
  }

  // q183 — ORDERED FUNNEL (view → click → purchase): how many users
  // progress through the product funnel IN ORDER — a click counts
  // only after the user's first view, a purchase only after that
  // qualifying click (the strict-sequence semantics; unordered
  // "did-both" funnels overcount). Three per-user min-timestamp
  // aggregations, each gated on the previous stage's timestamp; the
  // four stage counts close into per-stage conversion rates. Scale
  // shape: three partial-agg shuffles on user_id plus user-keyed
  // joins (user cardinality scales with volume, so these are
  // well-distributed sort-merge joins); the four scalar counts
  // broadcast into the 4-row summary.
  /** Delegated to operators.Funnel (round 10): stageTimes + summary
    * are ONE code path with the streaming maintainer
    * (StreamPipeline.funnelMaintain), the Transitions pattern — the
    * stream folds batches through exactly this gating, so stream ≡
    * batch is structural. Output is unchanged: n0 = distinct users =
    * store rows; n1/n2/n3 = stage-time counts = the old per-stage
    * row counts. */
  private def q183(s: SparkSession, dir: String): DataFrame =
    graft.operators.Funnel.summary(graft.operators.Funnel.stageTimes(ev(s, dir)))

  // q191 — TIME-TO-CONVERT DISTRIBUTION: among users who complete
  // the strict q183 funnel (purchase after the qualifying click after
  // the first view), the latency from first view to that purchase —
  // count, mean, and EXACT discrete median / P90 (lower-median rank
  // selection, the q136 MAD discipline — no percentile
  // interpolation). Durations are exact integer microseconds; the
  // mean closes from an exact decimal sum; median/P90 are the values
  // at ranks (n+1) DIV 2 and ceil(0.9n) under (duration, user) order
  // — engine-portable even with tied durations. Scale shape: the
  // q183 stage aggregations, then rank selection on the converting-
  // users table via ChunkedFrame.globalRank (duration-bucket chunks;
  // no single-task sort at any user count); the three 1-row frames
  // broadcast into the single summary row.
  /** Delegated to operators.Funnel (round 10): stageTimes' t_view for
    * a completed user equals the old inline gating's carried min, so
    * the latency distribution can ALSO be served straight off the
    * funnelMaintain store at any time — one code path for batch query
    * and stream serving (FunnelStreamSpec pins store-served ≡
    * declared q191). */
  private def q191(s: SparkSession, dir: String): DataFrame =
    graft.operators.Funnel.timeToConvert(graft.operators.Funnel.stageTimes(ev(s, dir)))

  // q184 — COHORT RETENTION: users are cohorted by their first-seen
  // day, and the (cohort_day, day-offset) grid counts how many of
  // each cohort return N days later — the standard retention
  // triangle. Exact distinct (user, day) activity; offset-0 retention
  // is 1.0 by construction (every cohort member is active on its
  // first day), which the spec pins. Scale shape: one per-user min
  // aggregation, one (user, day) distinct, one user-keyed join
  // (well-distributed — user cardinality scales with volume), and the
  // output is the bounded (days × days) / 2 triangle at any volume;
  // the cohort-size table is |days| rows and broadcasts.
  /** Delegated to operators.Retention (round 10): the activity set +
    * triangle are ONE code path with the streaming maintainer
    * (StreamPipeline.retentionMaintain) — and because the state is a
    * distinct set + per-user min, the maintainer is correct under ANY
    * arrival order, no ordered-feed contract needed. */
  private def q184(s: SparkSession, dir: String): DataFrame =
    graft.operators.Retention.triangle(graft.operators.Retention.activity(ev(s, dir)))

  // q196 — MARKOV REMOVAL-EFFECT ATTRIBUTION: the multi-touch
  // attribution model the q185 transition matrix exists to feed
  // (Anderl et al. 2014's Markov graph framework). Journeys are the
  // q182 sessions truncated at the FIRST purchase (inclusive):
  // START → first event, consecutive kept pairs, last event → NULL
  // for non-converting sessions; purchase absorbs into CONV with
  // probability 1. Conversion probability is the absorption
  // probability from START, computed by 48 fixed-order value
  // iterations (p ← T·p with absorbing entries pinned, every iterate
  // snapped to 1e-9 — the q186 fixed-iteration discipline, so the
  // driver loop and the DuckDB recursive CTE produce the SAME double
  // bit for bit). Removal effect of a state = 1 − p_removed/p_full
  // where the removed state's incoming probability mass redirects to
  // NULL (the standard node-removal semantics); attribution shares
  // normalize over the four removable states in fixed order. Scale
  // shape: the heavy work is ONE shared session-window pass (the
  // chunked q182 route) + three bounded aggregations; the matrix is
  // |states|² ≤ 35 cells at ANY volume — the driver-side iteration is
  // volume-independent by construction (the q186 collected-Gram
  // precedent).
  private def q196(s: SparkSession, dir: String): DataFrame =
    markovAttribution(s, ev(s, dir))

  /** q196's core over any (user_id, ts, event_id, event_type) frame —
    * exposed for the designed-feed spec.
    *
    * ONE (user, sid) window stage derives every per-row signal the
    * chain needs (exclusive prior-purchase count for truncation;
    * row_number + session count for "last row"; session has-purchase
    * flag — all sharing the one exchange+sort, unbounded frames
    * included), and each row emits its 0–2 transition contributions
    * as an exploded array into ONE (from, to) partial aggregation —
    * no persist, no multi-consumer recompute (the first cut paid
    * three aggregations over a persisted window frame: 56 s / 980 MB
    * at 100×). The (user, sid) partition is also the skew-safe one:
    * sessions are 30-min-gap bounded, so even a dominant bot user's
    * history splits across its sessions. */
  /** Delegated to operators.Markov (round 10): edge extraction and
    * the absorption solve are ONE code path with the streaming
    * maintainer (StreamPipeline.attributionMaintain) — the batch
    * extraction is the maintainer's signal pass with zero carry rows,
    * so stream ≡ batch is structural (AttributionStreamSpec). */
  private[graft] def markovAttribution(s: SparkSession, events: DataFrame): DataFrame = {
    import graft.operators.Markov
    Markov.attributionDf(s, Markov.collectEdges(Markov.batchEdges(events, chunked = true)))
  }

  // q197 — SHAPLEY-VALUE ATTRIBUTION: the cooperative-game companion
  // to q196's Markov model (the two standard data-driven attribution
  // methods; Shapley 1953 values over the channel coalition game).
  // Journeys are the SAME truncated-at-first-purchase sessions; a
  // journey's coalition is its distinct non-purchase channel set
  // (≤ 4 channels ⇒ 16 coalitions — the game is EXACTLY solvable,
  // no sampling). v(S) = number of converted journeys whose channel
  // set ⊆ S; φ(i) = Σ_{S⊆N\i} |S|!(n−1−|S|)!/n! · (v(S∪i) − v(S)),
  // computed in EXACT integers (×24) until two final IEEE divisions
  // shared with the oracle. Channel-free conversions shift every
  // v(S) by the same constant and cancel in the marginals. Scale
  // shape: one shared session-window pass (the chunked q182 route) +
  // one bounded (user, sid) aggregate + ONE ≤16-row collected count
  // table; the Shapley enumeration is driver-side and
  // volume-independent. Efficiency identity Σφ = v(N) − v(∅) pinned
  // by AttributionSpec.
  private def q197(s: SparkSession, dir: String): DataFrame =
    shapleyAttribution(s, ev(s, dir))

  private[graft] def shapleyAttribution(s: SparkSession, events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val f = graft.operators.Transitions.flags(events, chunked = true)
    val wOrd = Window.partitionBy(col("user_id"), col("sid")).orderBy(col("ts"), col("event_id"))
    val isP = when(col("event_type") === "purchase", 1L).otherwise(0L)
    val kept = f.withColumn("prior_p",
        coalesce(sum(isP).over(wOrd.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .filter(col("prior_p") === 0L)
    val journeys = kept.groupBy(col("user_id"), col("sid"))
      .agg(array_sort(collect_set(when(col("event_type") =!= "purchase", col("event_type"))))
        .as("chset"),
        max(isP).as("conv"))
    val counts = journeys.filter(col("conv") === 1L)
      .groupBy(col("chset")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getSeq[String](0).toSet -> r.getAs[Long]("n")).toMap

    val channels = Vector("click", "error", "signup", "view")
    def v(S: Set[String]): Long = counts.collect { case (js, n) if js.subsetOf(S) => n }.sum
    val w = Array(6L, 2L, 2L, 6L) // |S|! · (3−|S|)! for n = 4
    val nums = channels.map { c =>
      val others = channels.filterNot(_ == c).toSet
      others.subsets().map(sub => w(sub.size) * (v(sub + c) - v(sub))).sum
    }
    val total = nums.sum
    def r4d(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4
    val rows = channels.zip(nums).map { case (c, num) =>
      (c, r4d(num.toDouble / 24.0), r4d(num.toDouble / total.toDouble))
    }
    import s.implicits._
    rows.toDF("state", "shapley", "share")
  }

  // q204 — SESSION PATH MINING (navigation trigrams): the most
  // common three-step within-session journeys — the path-analysis
  // readout product analytics layers over q185's one-step matrix
  // (which cannot see that view→click→purchase dominates even when
  // both its edges are individually unremarkable). Triples come from
  // lag(1)/lag(2) over the (user, sid) session order — BOTH lags in
  // ONE window pass sharing the q196/q197 (user, sid) partition, the
  // skew-safe one: sessions are gap-bounded, so a dominant bot user
  // splits across its sessions. Output is at most |types|³ = 125
  // rows at ANY volume; support is the exact count share over all
  // triples, r4-closed. Scale shape: the shared chunked session
  // window + one (user, sid) window + one ≤125-row partial agg.
  /** Delegated to operators.Paths (round 10): triple extraction and
    * the support closing are ONE code path with the streaming
    * maintainer (StreamPipeline.pathsMaintain / pathsServe). */
  private def q204(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Paths
    Paths.close(Paths.countTriples(Paths.triples(sessionFlags(s, dir))))
  }

  // q205 — BOT-LIKELIHOOD PROFILE: the behavioral data-quality gate —
  // per user, the cadence statistics that separate machine traffic
  // from human sessions: within-session inter-event gap mean and
  // POPULATION sd (a metronome's variance is ~0 — the single
  // strongest bot signal), the busiest-minute event rate, and the
  // session count. `is_metronomic` applies the documented rule
  // (sd < 1 s over ≥ 20 within-session gaps). Bots are ALSO the
  // dominant-key hazard (the Transitions.flagsChunked rationale), so
  // the gap rows come from the shared chunked session window. Exact
  // arithmetic: gaps are integer µs; squared-gap sums ride
  // decimal(38,0) (a 30-min gap squares to 3.2e18 — two of those
  // overflow a long); the closing mean/sd is the q175 raw→central
  // IEEE sequence. Scale shape: user cardinality grows with volume,
  // so the per-user aggregates parallelize; one extra (user, minute)
  // partial agg feeds the peak-rate column.
  /** Delegated to operators.Bots (round 10, session 3): the per-user
    * cadence state (additive gap counters + the three-number minute-
    * rate state) is mergeable under ordered arrival, so ONE code path
    * serves this batch query AND the streaming maintainer
    * (StreamPipeline.botMaintain / botServe); BotStreamSpec pins
    * maintained ≡ declared bitwise across batch splits. */
  private def q205(s: SparkSession, dir: String): DataFrame =
    graft.operators.Bots.profile(graft.operators.Bots.state(ev(s, dir)))

  /** Benford expectations log10(1 + 1/d), computed ONCE here and
    * interpolated verbatim (Double.toString shortest-repr round-trips
    * through DuckDB's parser) into the oracle SQL — one source for
    * both engines' literals, the q212 parity rule. */
  private[queries] val BenfordP: Seq[(Int, Double)] =
    (1 to 9).map(d => d -> math.log10(1 + 1.0 / d))

  // q212 — BENFORD FIRST-DIGIT AUDIT: the classic forensic
  // data-quality screen — naturally occurring amounts follow
  // P(first digit = d) = log10(1 + 1/d), and fabricated or
  // unit-capped data does not; the chi-square distance from the
  // Benford curve is the fraud/ingest-corruption alarm every audit
  // pipeline runs over money columns. Exactness: amounts quantize
  // ONCE to integer cents (floor(p·100 + 0.5) — bit-identical on
  // both engines), the leading digit reads off the BIGINT's decimal
  // string (no double formatting, no log10 per row), counts are
  // exact, and the 9 chi-square parts quantize to 1e-8 INTEGERS
  // before the total so the 9-addend sum is order-free (the q63
  // fixed-point rule — a raw double sum of 9 parts would depend on
  // aggregation order in the last ulp). Scale shape: one scan, one
  // map-side-partial 9-group agg, a broadcast total; the digit frame
  // is 9 rows at any volume.
  private def q212(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cents = floor(col("l_extendedprice") * lit(100d) + lit(0.5d)).cast("long")
    val d0 = Tables.lineitem(s, dir).select(cents.as("cents"))
      .filter(col("cents").isNotNull)
      .select(substring(col("cents").cast("string"), 1, 1).cast("int").as("digit"))
    val g = d0.groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
    val tot = d0.agg(count(lit(1)).as("n"))
    val digs = BenfordP.toDF("digit", "p")
    def dd(c: Column) = c.cast("double")
    val j = digs.join(g, Seq("digit"), "left")
      .select(col("digit"), coalesce(col("n_obs"), lit(0L)).as("n_obs"), col("p"))
      .crossJoin(broadcast(tot))
    val dev = dd(col("n_obs")) - dd(col("n")) * col("p")
    val parts = j.withColumn("p8",
      floor(dev * dev / (dd(col("n")) * col("p")) * lit(1e8) + lit(0.5d)).cast("long"))
    val chi = parts.agg((sum(col("p8")).cast("double") / lit(1e8)).as("chi2"))
    parts.crossJoin(broadcast(chi))
      .select(col("digit"), col("n_obs"),
        r4(dd(col("n_obs")) / dd(col("n"))).as("share_r"),
        r4(col("p")).as("benford_r"),
        r4(col("chi2")).as("chi2_r"))
  }

  // q200 — PAGERANK NAVIGATION CENTRALITY: the stationary-importance
  // score of each event type in the session navigation graph — which
  // states users' within-session flow concentrates on, the graph-
  // level readout of the q185 transition matrix (Page et al. 1999
  // with damping 0.85). The graph is the q185 count matrix (the
  // SAME chunked one-window-pass construction); rows normalize to
  // transition probabilities, a dangling state (no outgoing
  // transitions) contributes its mass uniformly (the standard
  // dangling-node patch), and the rank vector is 40 fixed-order
  // power iterations pr ← 0.03 + 0.85·Pᵀpr with every component
  // snapped to 1e-9 — the q186/q196 fixed-iteration discipline, so
  // the driver loop and DuckDB's recursive CTE produce the SAME
  // double bit for bit. Scale shape: the heavy work is ONE shared
  // chunked session-window pass + one bounded (from, to) partial
  // agg; the collected matrix is |types|² ≤ 25 cells at ANY volume,
  // so the driver-side iteration is volume-independent (the q196
  // collected-matrix precedent). States are the feed's fixed
  // five-type contract (the q197 channel-list precedent).
  private def q200(s: SparkSession, dir: String): DataFrame =
    pagerankNav(s, ev(s, dir))

  private[graft] val NavStates: Vector[String] =
    Vector("click", "error", "purchase", "signup", "view")

  private[graft] def pagerankNav(
      s: SparkSession, events: DataFrame,
      states: Vector[String] = NavStates): DataFrame =
    pagerankFromCounts(s,
      graft.operators.Transitions.counts(events, chunked = true).collect()
        .map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type")) ->
          r.getAs[Long]("n_trans")).toMap,
      states)

  /** q200's closing over an already-aggregated transition-count
    * matrix — shared verbatim with the streaming serve
    * (StreamPipeline.pagerankServe reads the leg-9 maintained counts
    * store into exactly this function), so stream ≡ batch is
    * structural once the maintained counts equal q185's. */
  private[graft] def pagerankFromCounts(
      s: SparkSession, cnt: Map[(String, String), Long],
      states: Vector[String] = NavStates): DataFrame = {
    val n = states.size
    val outTot = states.map(f => states.map(t => cnt.getOrElse((f, t), 0L)).sum)
    // p(fi)(ti) = P(fi → ti); dangling rows redistribute uniformly
    val p = Array.tabulate(n, n) { (fi, ti) =>
      if (outTot(fi) == 0L) 0.2
      else cnt.getOrElse((states(fi), states(ti)), 0L).toDouble / outTot(fi).toDouble
    }
    var pr = Array.fill(n)(0.2)
    var it = 0
    while (it < 40) {
      val next = Array.tabulate(n) { i =>
        var dot = 0.0
        var j = 0
        while (j < n) { dot += p(j)(i) * pr(j); j += 1 }
        math.floor((0.03 + 0.85 * dot) * 1e9 + 0.5) / 1e9
      }
      pr = next
      it += 1
    }
    val rows = states.zipWithIndex.map { case (st, i) =>
      (st, outTot(i), math.floor(pr(i) * 10000 + 0.5) / 10000)
    }
    import s.implicits._
    rows.toDF("state", "out_trans", "pagerank")
  }

  // q224 — CUSUM CHANGE-POINT DETECTION over the daily event-volume
  // series per event type: the classic sequential drift detector
  // (Page 1954) every ingest-monitoring pipeline runs — two one-sided
  // cumulative sums of the deviation from the series mean, alarmed
  // when either crosses 5σ. Exactness: deviations are EXACT integers
  // scaled by the day count (dev_d = D·x_d − T, so Σdev = 0 exactly
  // and no float mean ever enters the recursion); both CUSUM folds
  // run in integers (greatest(0, c + dev)), and the only doubles are
  // the 5σ threshold (σ² = Σdev²/D — one shared IEEE sequence) and
  // the final r4 normalizations — integer-vs-double comparisons land
  // identically on both engines (exact long→double casts). The fold
  // is ONE sequential pass in day order over the volume-independent
  // day grid (Spark `aggregate` over a named_struct of longs, DuckDB
  // list_reduce over 6-element BIGINT lists — the q210/q222 replay
  // pattern). Scale shape: one (type, day) count partial agg is the
  // only volume-sized work.
  private def q224(s: SparkSession, dir: String): DataFrame =
    cusumDaily(ev(s, dir))

  private[graft] def cusumDaily(events: DataFrame): DataFrame =
    cusumFromDaily(events
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("x")))

  /** q224's closing over any (event_type, day, x) daily-count grid —
    * ONE code path with the streaming serve
    * (StreamPipeline.cusumServe over the leg-20 maintained counts). */
  private[graft] def cusumFromDaily(daily: DataFrame): DataFrame = {
    val packed = daily
      .groupBy(col("event_type"))
      .agg(sort_array(collect_list(struct(col("day"), col("x")))).as("ps"))
      .withColumn("nd", size(col("ps")).cast("long"))
      .withColumn("tt", expr(
        "aggregate(ps, CAST(0 AS BIGINT), (a, p) -> a + p.x)"))
      .withColumn("dv", expr("transform(ps, p -> nd * p.x - tt)"))
      .withColumn("sdev2", expr(
        "aggregate(dv, CAST(0 AS BIGINT), (a, e) -> a + e * e)"))
      .withColumn("h",
        lit(5d) * sqrt(col("sdev2").cast("double") / col("nd").cast("double")))
      .withColumn("st", expr(
        "aggregate(sequence(1, CAST(nd AS INT)), " +
          "named_struct('cp', CAST(0 AS BIGINT), 'cn', CAST(0 AS BIGINT), " +
          "'mxp', CAST(0 AS BIGINT), 'mxn', CAST(0 AS BIGINT), " +
          "'al', CAST(0 AS BIGINT), 'na', CAST(0 AS BIGINT)), " +
          "(a, k) -> named_struct(" +
          "'cp', greatest(CAST(0 AS BIGINT), a.cp + dv[k - 1]), " +
          "'cn', greatest(CAST(0 AS BIGINT), a.cn - dv[k - 1]), " +
          "'mxp', greatest(a.mxp, greatest(CAST(0 AS BIGINT), a.cp + dv[k - 1])), " +
          "'mxn', greatest(a.mxn, greatest(CAST(0 AS BIGINT), a.cn - dv[k - 1])), " +
          "'al', IF(a.al > 0, a.al, IF(" +
          "greatest(CAST(0 AS BIGINT), a.cp + dv[k - 1]) > h OR " +
          "greatest(CAST(0 AS BIGINT), a.cn - dv[k - 1]) > h, CAST(k AS BIGINT), CAST(0 AS BIGINT))), " +
          "'na', a.na + IF(" +
          "greatest(CAST(0 AS BIGINT), a.cp + dv[k - 1]) > h OR " +
          "greatest(CAST(0 AS BIGINT), a.cn - dv[k - 1]) > h, CAST(1 AS BIGINT), CAST(0 AS BIGINT))))"))
    def dd(c: Column) = c.cast("double")
    packed.select(col("event_type"), col("nd").as("n_days"), col("tt").as("n_events"),
      r4(dd(col("tt")) / dd(col("nd"))).as("mu_r4"),
      r4(col("h") / dd(col("nd"))).as("h_daily_r4"),
      r4(dd(col("st.mxp")) / dd(col("nd"))).as("max_cusum_pos_r4"),
      r4(dd(col("st.mxn")) / dd(col("nd"))).as("max_cusum_neg_r4"),
      when(col("st.al") > 0, expr("ps[CAST(st.al AS INT) - 1].day")).as("first_alarm_day"),
      col("st.na").as("n_alarm_days"))
  }

  // q225 — KAPLAN-MEIER SURVIVAL (signup → first purchase): the
  // nonparametric time-to-event curve (Kaplan & Meier 1958) that
  // q191's mean time-to-convert cannot give — WITH right-censoring:
  // a user who signed up but never purchased is not a missing data
  // point, they are "survived at least this long" (censored at the
  // feed's last timestamp), and dropping them biases conversion
  // speed optimistic. Duration = whole days from first signup to
  // first purchase at-or-after it (exact integer µs division).
  // Estimator: at each distinct conversion time t, S(t) multiplies
  // by (1 − d_t/n_t) over the at-risk count n_t; the product runs as
  // ONE sequential fold in time order (Spark `aggregate` struct,
  // DuckDB list_reduce — same IEEE multiply sequence; at-risk
  // arithmetic is exact small-integer double math). Scale shape: the
  // user-grain first-signup/first-purchase aggregates are the only
  // volume-sized work (two partial aggs + one user-grain join); the
  // fold runs on the ≤|days|-element observed-duration grid.
  private def q225(s: SparkSession, dir: String): DataFrame =
    kaplanMeier(ev(s, dir))

  private[graft] def kaplanMeier(e: DataFrame): DataFrame = {
    val su = e.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("sts"))
    val pu = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("pts"))
    val fp = su.join(pu, Seq("user_id"), "left")
      .groupBy(col("user_id"), col("sts"))
      .agg(min(when(col("pts") >= col("sts"), col("pts"))).as("fpts"))
    val mx = e.agg(max(col("ts")).as("max_ts"))
    val ob = fp.crossJoin(broadcast(mx))
      .withColumn("cvt", col("fpts").isNotNull)
      .withColumn("obs_t", expr(
        "CASE WHEN fpts IS NOT NULL THEN (unix_micros(fpts) - unix_micros(sts)) DIV 86400000000 " +
          "ELSE (unix_micros(max_ts) - unix_micros(sts)) DIV 86400000000 END"))
    val g = ob.groupBy(col("obs_t")).agg(
      sum(when(col("cvt"), 1L).otherwise(0L)).as("nev"),
      sum(when(col("cvt"), 0L).otherwise(1L)).as("ncens"))
    val packed = g.agg(
      sort_array(collect_list(struct(col("obs_t"), col("nev"), col("ncens")))).as("gs"),
      sum(col("nev") + col("ncens")).as("nu"))
      .filter(size(col("gs")) > 0)
    packed
      .select(col("gs"), col("nu"), explode(expr("sequence(1, size(gs))")).as("i"))
      .withColumn("cb", expr(
        "aggregate(slice(gs, 1, i - 1), CAST(0 AS BIGINT), (a, p) -> a + p.nev + p.ncens)"))
      .withColumn("surv", expr(
        "aggregate(slice(gs, 1, i), " +
          "named_struct('r', CAST(nu AS DOUBLE), 's', CAST(1.0 AS DOUBLE)), " +
          "(a, p) -> named_struct(" +
          "'r', a.r - (CAST(p.nev AS DOUBLE) + CAST(p.ncens AS DOUBLE)), " +
          "'s', IF(p.nev > 0, a.s * (1.0 - CAST(p.nev AS DOUBLE) / a.r), a.s))).s"))
      .filter(expr("gs[i - 1].nev > 0"))
      .select(expr("gs[i - 1].obs_t").as("t_days"),
        (col("nu") - col("cb")).as("n_risk"),
        expr("gs[i - 1].nev").as("n_conv"),
        expr("gs[i - 1].ncens").as("n_cens"),
        r4(col("surv")).as("surv_r4"))
  }

  // q227 — SEASONAL ANOMALY SCREEN: flag events whose value sits more
  // than 3σ from their (event_type, hour-of-day) seasonal profile —
  // the ingest-quality alarm that respects intraday seasonality
  // (q155's point: a value normal at the open is anomalous at 3am;
  // a global z-score can't see that). Exactness: values quantize
  // ONCE to integer cents; per-cell moments are exact integer sums;
  // the 3σ test cross-multiplies to |n·v − S1| > 3·√(n·S2 − S1²) —
  // exact integer LHS against one shared IEEE RHS, so both engines
  // make identical flag decisions (the q208 cross-multiplication
  // rule); the reported z is one IEEE division. Scale shape: ONE
  // partial-agg shuffle to the ≤|types|·24-cell profile, broadcast
  // back onto a map-side filter — the scan never shuffles.
  private def q227(s: SparkSession, dir: String): DataFrame =
    seasonalAnomalies(ev(s, dir))

  private[graft] def seasonalAnomalies(events: DataFrame): DataFrame = {
    val base = events
      .filter(col("value").isNotNull)
      .select(col("event_id"), col("event_type"), col("ts"),
        hour(col("ts")).as("hh"),
        floor(col("value") * lit(100d) + lit(0.5d)).cast("long").as("vc"))
    val prof = base.groupBy(col("event_type"), col("hh"))
      .agg(count(lit(1)).as("n"),
        sum(col("vc")).as("s1"),
        sum((col("vc") * col("vc")).cast("decimal(38,0)")).as("s2"))
    def dd(c: Column) = c.cast("double")
    val dev = col("n") * col("vc") - col("s1") // exact long
    val den = sqrt(greatest(lit(0d),
      dd(col("n")) * dd(col("s2")) - dd(col("s1")) * dd(col("s1"))))
    base.join(broadcast(prof), Seq("event_type", "hh"))
      .filter(den > 0 && abs(dev).cast("double") > lit(3d) * den)
      .select(col("event_id"), col("event_type"), col("hh"),
        r4(dd(col("vc")) / lit(100d)).as("value_r4"),
        r4(dd(dev) / den).as("z_r4"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q227_seasonal_anomaly" -> q227 _,
    "q224_cusum_changepoint" -> q224 _,
    "q225_kaplan_meier" -> q225 _,
    "q212_benford_audit" -> q212 _,
    "q204_session_paths" -> q204 _,
    "q205_bot_profile" -> q205 _,
    "q200_pagerank_nav" -> q200 _,
    "q181_table_profile" -> q181 _,
    "q193_table_profile_kmv" -> q193 _,
    "q182_sessions" -> q182 _,
    "q183_funnel" -> q183 _,
    "q184_retention" -> q184 _,
    "q185_transitions" -> q185 _,
    "q189_rfm" -> q189 _,
    "q190_session_lift" -> q190 _,
    "q191_time_to_convert" -> q191 _,
    "q196_markov_attribution" -> q196 _,
    "q197_shapley_attribution" -> q197 _
  )

  val oracleSql: Map[String, String] = Map(
    "q227_seasonal_anomaly" ->
      """WITH b AS (
        |  SELECT event_id, event_type, hour(ts::TIMESTAMP) AS hh,
        |    floor(value * 100 + 0.5)::BIGINT AS vc
        |  FROM events WHERE value IS NOT NULL
        |), prof AS (
        |  SELECT event_type, hh, count(*)::BIGINT AS n, sum(vc)::BIGINT AS s1,
        |    sum(vc::HUGEINT * vc::HUGEINT) AS s2
        |  FROM b GROUP BY 1, 2
        |), j AS (
        |  SELECT b.*, n, s1, s2,
        |    n * vc - s1 AS dev,
        |    sqrt(greatest(0.0, n::DOUBLE * s2::DOUBLE - s1::DOUBLE * s1::DOUBLE)) AS den
        |  FROM b JOIN prof USING (event_type, hh)
        |)
        |SELECT event_id, event_type, hh,
        |  floor(vc::DOUBLE / 100 * 10000 + 0.5)/10000 AS value_r4,
        |  floor(dev::DOUBLE / den * 10000 + 0.5)/10000 AS z_r4
        |FROM j WHERE den > 0 AND abs(dev)::DOUBLE > 3 * den""".stripMargin,
    "q224_cusum_changepoint" ->
      """WITH daily AS (
        |  SELECT event_type, ts::TIMESTAMP::DATE AS day, count(*)::BIGINT AS x
        |  FROM events GROUP BY 1, 2
        |), p AS (
        |  SELECT event_type,
        |    list(day ORDER BY day) AS days,
        |    list(x ORDER BY day) AS xs,
        |    count(*)::BIGINT AS nd, sum(x)::BIGINT AS tt
        |  FROM daily GROUP BY 1
        |), d AS (
        |  SELECT *, list_transform(xs, x -> nd * x - tt) AS dv,
        |    list_reduce(list_prepend(0::BIGINT,
        |      list_transform(xs, x -> (nd * x - tt) * (nd * x - tt))),
        |      (a, b) -> a + b) AS sdev2
        |  FROM p
        |), hh AS (
        |  SELECT *, 5 * sqrt(sdev2::DOUBLE / nd::DOUBLE) AS h FROM d
        |), st AS (
        |  SELECT *, list_reduce(
        |    list_prepend([0::BIGINT, 0::BIGINT, 0::BIGINT, 0::BIGINT, 0::BIGINT, 0::BIGINT],
        |      list_transform(range(1, (nd + 1)::INT), k -> [k::BIGINT, 0::BIGINT, 0::BIGINT, 0::BIGINT, 0::BIGINT, 0::BIGINT])),
        |    (a, e) -> [
        |      greatest(0::BIGINT, a[1] + dv[e[1]::INT]),
        |      greatest(0::BIGINT, a[2] - dv[e[1]::INT]),
        |      greatest(a[3], greatest(0::BIGINT, a[1] + dv[e[1]::INT])),
        |      greatest(a[4], greatest(0::BIGINT, a[2] - dv[e[1]::INT])),
        |      CASE WHEN a[5] > 0 THEN a[5]
        |        WHEN greatest(0::BIGINT, a[1] + dv[e[1]::INT]) > h
        |          OR greatest(0::BIGINT, a[2] - dv[e[1]::INT]) > h THEN e[1] ELSE 0::BIGINT END,
        |      a[6] + CASE WHEN greatest(0::BIGINT, a[1] + dv[e[1]::INT]) > h
        |          OR greatest(0::BIGINT, a[2] - dv[e[1]::INT]) > h THEN 1::BIGINT ELSE 0::BIGINT END]) AS s
        |  FROM hh
        |)
        |SELECT event_type, nd AS n_days, tt AS n_events,
        |  floor(tt::DOUBLE / nd::DOUBLE * 10000 + 0.5)/10000 AS mu_r4,
        |  floor(h / nd::DOUBLE * 10000 + 0.5)/10000 AS h_daily_r4,
        |  floor(s[3]::DOUBLE / nd::DOUBLE * 10000 + 0.5)/10000 AS max_cusum_pos_r4,
        |  floor(s[4]::DOUBLE / nd::DOUBLE * 10000 + 0.5)/10000 AS max_cusum_neg_r4,
        |  CASE WHEN s[5] > 0 THEN days[s[5]::INT] END AS first_alarm_day,
        |  s[6] AS n_alarm_days
        |FROM st""".stripMargin,
    "q225_kaplan_meier" ->
      """WITH e AS (
        |  SELECT user_id, ts::TIMESTAMP AS ts, event_type FROM events
        |), su AS (
        |  SELECT user_id, min(ts) AS sts FROM e WHERE event_type = 'signup' GROUP BY 1
        |), pu AS (
        |  SELECT user_id, ts AS pts FROM e WHERE event_type = 'purchase'
        |), fp AS (
        |  SELECT su.user_id, su.sts,
        |    min(CASE WHEN pu.pts >= su.sts THEN pu.pts END) AS fpts
        |  FROM su LEFT JOIN pu ON su.user_id = pu.user_id GROUP BY 1, 2
        |), mx AS (SELECT max(ts) AS max_ts FROM e),
        |ob AS (
        |  SELECT user_id, fpts IS NOT NULL AS cvt,
        |    CASE WHEN fpts IS NOT NULL THEN (epoch_us(fpts) - epoch_us(sts)) // 86400000000
        |         ELSE (epoch_us(max_ts) - epoch_us(sts)) // 86400000000 END AS obs_t
        |  FROM fp CROSS JOIN mx
        |), g AS (
        |  SELECT obs_t,
        |    sum(CASE WHEN cvt THEN 1 ELSE 0 END)::BIGINT AS nev,
        |    sum(CASE WHEN cvt THEN 0 ELSE 1 END)::BIGINT AS ncens
        |  FROM ob GROUP BY 1
        |), p AS (
        |  SELECT list(obs_t ORDER BY obs_t) AS tl, list(nev ORDER BY obs_t) AS nl,
        |    list(ncens ORDER BY obs_t) AS cl, sum(nev + ncens)::BIGINT AS nu
        |  FROM g
        |), x AS (
        |  SELECT tl, nl, cl, nu, unnest(range(1, len(tl) + 1)) AS i FROM p
        |), y AS (
        |  SELECT tl[i] AS t_days, nl[i] AS n_conv, cl[i] AS n_cens, nl[i] AS nev_i,
        |    nu - list_reduce(list_prepend(0::BIGINT,
        |      list_transform(range(1, i), j -> nl[j] + cl[j])), (a, b) -> a + b) AS n_risk,
        |    list_reduce(list_prepend([nu::DOUBLE, 1.0],
        |      list_transform(range(1, i + 1), j -> [j::DOUBLE, 0.0])),
        |      (a, e2) -> [
        |        a[1] - (nl[e2[1]::INT]::DOUBLE + cl[e2[1]::INT]::DOUBLE),
        |        CASE WHEN nl[e2[1]::INT] > 0
        |          THEN a[2] * (1.0 - nl[e2[1]::INT]::DOUBLE / a[1])
        |          ELSE a[2] END])[2] AS surv
        |  FROM x
        |)
        |SELECT t_days, n_risk, n_conv, n_cens,
        |  floor(surv * 10000 + 0.5)/10000 AS surv_r4
        |FROM y WHERE nev_i > 0""".stripMargin,
    "q212_benford_audit" -> {
      // ::DOUBLE on the literal: DuckDB would otherwise bind the
      // 17-digit constant as DECIMAL(18,17) and overflow the r4
      // multiply; the cast reproduces the exact Scala double
      // (shortest-repr round trip).
      val values = BenfordP.map { case (d, p) => s"($d, $p::DOUBLE)" }.mkString(", ")
      s"""WITH c AS (
         |  SELECT floor(l_extendedprice * 100 + 0.5)::BIGINT AS cents FROM lineitem
         |  WHERE l_extendedprice IS NOT NULL
         |), d AS (
         |  SELECT substr(cents::VARCHAR, 1, 1)::INT AS digit FROM c
         |), g AS (
         |  SELECT digit, count(*)::BIGINT AS n_obs FROM d GROUP BY 1
         |), nn AS (SELECT count(*)::BIGINT AS n FROM d),
         |digs(digit, p) AS (VALUES $values),
         |parts AS (
         |  SELECT digs.digit, coalesce(g.n_obs, 0)::BIGINT AS n_obs, digs.p, nn.n,
         |    floor((coalesce(g.n_obs, 0)::DOUBLE - nn.n::DOUBLE * digs.p)
         |        * (coalesce(g.n_obs, 0)::DOUBLE - nn.n::DOUBLE * digs.p)
         |        / (nn.n::DOUBLE * digs.p) * 1e8 + 0.5)::BIGINT AS p8
         |  FROM digs LEFT JOIN g USING (digit) CROSS JOIN nn
         |), chi AS (SELECT sum(p8)::DOUBLE / 1e8 AS chi2 FROM parts)
         |SELECT digit, n_obs,
         |  floor(n_obs::DOUBLE / n::DOUBLE * 10000 + 0.5)/10000 AS share_r,
         |  floor(p * 10000 + 0.5)/10000 AS benford_r,
         |  floor(chi2 * 10000 + 0.5)/10000 AS chi2_r
         |FROM parts CROSS JOIN chi""".stripMargin
    },
    "q205_bot_profile" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, ts::TIMESTAMP AS ts FROM events
        |), g AS (
        |  SELECT *, epoch_us(ts) - epoch_us(lag(ts) OVER w) AS gap_us,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), u AS (
        |  SELECT user_id, count(*)::BIGINT AS n_events,
        |    sum(new_s)::BIGINT AS n_sessions,
        |    count(CASE WHEN new_s = 0 THEN gap_us END)::BIGINT AS n_gaps,
        |    sum(CASE WHEN new_s = 0 THEN gap_us END)::BIGINT AS sg,
        |    sum(CASE WHEN new_s = 0 THEN gap_us * gap_us END::HUGEINT) AS sg2
        |  FROM g GROUP BY 1
        |), m AS (
        |  SELECT user_id, max(epm)::BIGINT AS epm_max FROM (
        |    SELECT user_id, date_trunc('minute', ts) AS mi, count(*) AS epm
        |    FROM e GROUP BY 1, 2)
        |  GROUP BY 1
        |), f AS (
        |  SELECT u.*, m.epm_max,
        |    sg::DOUBLE / n_gaps::DOUBLE AS mean_d,
        |    sqrt(greatest(0.0, sg2::DOUBLE / n_gaps::DOUBLE
        |      - (sg::DOUBLE / n_gaps::DOUBLE) * (sg::DOUBLE / n_gaps::DOUBLE))) AS sd_d
        |  FROM u JOIN m USING (user_id)
        |)
        |SELECT user_id, n_events, n_sessions, n_gaps, epm_max,
        |  CASE WHEN n_gaps > 0 THEN floor(mean_d / 1e6 * 10000 + 0.5)/10000 END AS mean_gap_s,
        |  CASE WHEN n_gaps > 0 THEN floor(sd_d / 1e6 * 10000 + 0.5)/10000 END AS sd_gap_s,
        |  (n_gaps >= 20 AND sd_d < 1e6) AS is_metronomic
        |FROM f""".stripMargin,
    "q204_session_paths" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, ts::TIMESTAMP AS ts FROM events
        |), g AS (
        |  SELECT *, CASE WHEN lag(ts) OVER w IS NULL
        |      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), sidt AS (
        |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM g
        |), tri AS (
        |  SELECT lag(event_type, 2) OVER ws AS step1,
        |    lag(event_type, 1) OVER ws AS step2,
        |    event_type AS step3
        |  FROM sidt WINDOW ws AS (PARTITION BY user_id, sid ORDER BY ts, event_id)
        |), c AS (
        |  SELECT step1, step2, step3, count(*)::BIGINT AS n_paths
        |  FROM tri WHERE step1 IS NOT NULL GROUP BY 1, 2, 3
        |)
        |SELECT step1, step2, step3, n_paths,
        |  floor(n_paths::DOUBLE / (sum(n_paths) OVER ())::DOUBLE * 10000 + 0.5)/10000 AS support
        |FROM c""".stripMargin,
    "q200_pagerank_nav" -> {
      // the q196 recursive-CTE discipline: same 40 iterations, same
      // 1e-9 snap, list_dot_product's sequential order matching the
      // driver loop's fixed j-order summation
      val states = NavStates
      val inList = states.map(s0 => s"'$s0'").mkString(", ")
      val stateRows = states.zipWithIndex
        .map { case (s0, i) => s"(${i + 1}, '$s0')" }.mkString(", ")
      val dots = (1 to states.size).map(i =>
        s"floor((0.03 + 0.85 * list_dot_product((SELECT m FROM mat)[$i], p)) * 1e9 + 0.5)/1e9")
        .mkString(",\n         |    ")
      val init = states.map(_ => "0.2").mkString("[", ", ", "]")
      s"""WITH RECURSIVE e AS (
         |  SELECT user_id, event_id, event_type, ts::TIMESTAMP AS ts FROM events
         |), g AS (
         |  SELECT *, lag(event_type) OVER w AS prev_type,
         |    CASE WHEN lag(ts) OVER w IS NULL
         |      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS new_s
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         |), cnt AS MATERIALIZED (
         |  SELECT prev_type AS f, event_type AS t2, count(*)::BIGINT AS n
         |  FROM g WHERE new_s = 0 AND prev_type IN ($inList) AND event_type IN ($inList)
         |  GROUP BY 1, 2
         |), outs AS MATERIALIZED (
         |  SELECT f, sum(n)::BIGINT AS out_n FROM cnt GROUP BY 1
         |), states(i, name) AS (
         |  VALUES $stateRows
         |), rows_m AS MATERIALIZED (
         |  SELECT ti.i AS i, list(
         |    CASE WHEN (SELECT out_n FROM outs WHERE f = fs.name) IS NULL THEN 0.2::DOUBLE
         |      ELSE coalesce((SELECT n FROM cnt WHERE f = fs.name AND t2 = ti.name), 0)::DOUBLE
         |        / (SELECT out_n FROM outs WHERE f = fs.name)::DOUBLE END
         |    ORDER BY fs.i) AS row
         |  FROM states ti, states fs GROUP BY ti.i
         |), mat AS MATERIALIZED (SELECT list(row ORDER BY i) AS m FROM rows_m),
         |it(k, p) AS (
         |  SELECT 0, $init::DOUBLE[]
         |  UNION ALL
         |  SELECT k + 1, [
         |    $dots]
         |  FROM it WHERE k < 40
         |)
         |SELECT st.name AS state,
         |  coalesce((SELECT out_n FROM outs WHERE f = st.name), 0)::BIGINT AS out_trans,
         |  floor(fin.p[st.i] * 10000 + 0.5)/10000 AS pagerank
         |FROM states st, (SELECT p FROM it WHERE k = 40) fin""".stripMargin
    },
    "q181_table_profile" -> {
      val stack = ProfileCols
        .map(c => s"SELECT '$c' AS col_name, $c::VARCHAR AS v FROM lineitem")
        .mkString("\n  UNION ALL ")
      s"""WITH s AS (
         |  $stack
         |)
         |SELECT col_name, count(*)::BIGINT AS n_rows,
         |  sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null,
         |  count(DISTINCT v)::BIGINT AS n_distinct
         |FROM s GROUP BY 1""".stripMargin
    },
    "q193_table_profile_kmv" -> {
      // the BIGINT pre-hash per column type, mirroring canonProfileLong:
      // numeric/timestamp directly, strings via the md5 detour
      val stack = ProfileColTypes.map { case (c, k) =>
        val canon = k match {
          case "double" => s"CAST(floor($c * 1000000 + 0.5) AS BIGINT)"
          case "ts" => s"epoch_us($c)"
          case "str" => s"('0x' || substr(md5($c), 1, 15))::BIGINT"
          case _ => s"$c::BIGINT"
        }
        s"SELECT '$c' AS col_name, $canon AS t FROM lineitem"
      }.mkString("\n  UNION ALL ")
      s"""WITH s AS (
         |  $stack
         |), c AS (
         |  SELECT col_name, count(*)::BIGINT AS n_rows,
         |    sum(CASE WHEN t IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null
         |  FROM s GROUP BY 1
         |), h AS (
         |  SELECT DISTINCT col_name,
         |    ((t % 2147483647) * (t % 2147483647) % 2147483647 * 1299721
         |      + (t % 2147483647) * 7 + 1) % 2147483647 AS h
         |  FROM s WHERE t IS NOT NULL
         |), r AS (
         |  SELECT col_name, h,
         |    row_number() OVER (PARTITION BY col_name ORDER BY h) AS rn FROM h
         |), k AS (
         |  SELECT col_name, count(*)::BIGINT AS kk, max(h)::BIGINT AS hk
         |  FROM r WHERE rn <= 64 GROUP BY 1
         |)
         |SELECT c.col_name, c.n_rows, c.n_null,
         |  floor((CASE WHEN kk < 64 THEN kk::DOUBLE
         |         ELSE (kk - 1)::DOUBLE * 2147483647.0 / hk END)*10000 + 0.5)/10000
         |    AS n_distinct_est
         |FROM c JOIN k USING (col_name)""".stripMargin
    },
    "q197_shapley_attribution" -> {
      val channels = Seq("click", "error", "signup", "view")
      def memLit(mem: Seq[String]) =
        if (mem.isEmpty) "[]::VARCHAR[]" else mem.map(c => s"'$c'").mkString("[", ", ", "]")
      val subsetRows = (0 until 16).map { m =>
        val mem = channels.zipWithIndex.collect { case (c, i) if (m & (1 << i)) != 0 => c }
        s"($m, ${memLit(mem)})"
      }.mkString(",\n         |    ")
      def vRef(m: Int) = s"(SELECT v FROM vv WHERE si = $m)"
      val wArr = Array(6, 2, 2, 6)
      def numExpr(ci: Int): String = {
        val others = (0 until 4).filterNot(_ == ci)
        (0 until 8).map { k =>
          val sMask = others.zipWithIndex.collect { case (bit, j) if (k & (1 << j)) != 0 => 1 << bit }.sum
          s"${wArr(Integer.bitCount(sMask))} * (${vRef(sMask | (1 << ci))} - ${vRef(sMask)})"
        }.mkString(" + ")
      }
      val valueRows = channels.zipWithIndex.map { case (c, ci) =>
        s"('$c', ${numExpr(ci)})"
      }.mkString(",\n         |    ")
      s"""WITH e AS (
         |  SELECT user_id, event_id, event_type, ts::TIMESTAMP AS ts FROM events
         |), g AS MATERIALIZED (
         |  SELECT *, CASE WHEN lag(ts) OVER w IS NULL
         |      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS new_s
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         |), sidt AS MATERIALIZED (
         |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         |  FROM g
         |), kpt AS MATERIALIZED (
         |  SELECT *, coalesce(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |    OVER (PARTITION BY user_id, sid ORDER BY ts, event_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior_p
         |  FROM sidt
         |), kept AS MATERIALIZED (SELECT * FROM kpt WHERE prior_p = 0
         |), j AS MATERIALIZED (
         |  SELECT user_id, sid,
         |    coalesce(list_sort(list_distinct(
         |      list(event_type) FILTER (WHERE event_type <> 'purchase'))), []::VARCHAR[]) AS chset,
         |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
         |  FROM kept GROUP BY 1, 2
         |), cs AS MATERIALIZED (
         |  SELECT chset, count(*)::BIGINT AS n FROM j WHERE conv = 1 GROUP BY 1
         |), subsets(si, mem) AS (
         |  VALUES
         |    $subsetRows
         |), vv AS MATERIALIZED (
         |  SELECT s.si, coalesce(sum(cs.n), 0)::BIGINT AS v
         |  FROM subsets s LEFT JOIN cs ON list_has_all(s.mem, cs.chset)
         |  GROUP BY s.si
         |)
         |SELECT t.state,
         |  floor(t.num / 24.0 * 10000 + 0.5)/10000 AS shapley,
         |  floor(t.num::DOUBLE / (24 * (${vRef(15)} - ${vRef(0)}))::DOUBLE * 10000 + 0.5)/10000
         |    AS share
         |FROM (VALUES
         |    $valueRows) t(state, num)""".stripMargin
    },
    "q196_markov_attribution" -> {
      // one recursive-CTE value iteration per scenario (full chain +
      // each removal), mirroring the driver loop: same 48 iterations,
      // same 1e-9 snap, list_dot_product's sequential order matching
      // the fixed j-order summation (the q186 discipline)
      def scenario(tag: String, removed: Option[String]): String = {
        val cell = removed match {
          case Some(r) =>
            s"""CASE
               |      WHEN ts.name = '$r' THEN 0.0
               |      WHEN ts.name = 'NULL' THEN
               |        coalesce((SELECT p FROM probs WHERE f = fs.name AND t2 = 'NULL'), 0.0)
               |        + coalesce((SELECT p FROM probs WHERE f = fs.name AND t2 = '$r'), 0.0)
               |      ELSE coalesce((SELECT p FROM probs WHERE f = fs.name AND t2 = ts.name), 0.0)
               |    END""".stripMargin
          case None =>
            "coalesce((SELECT p FROM probs WHERE f = fs.name AND t2 = ts.name), 0.0)"
        }
        val dots = (1 to 5).map(i =>
          s"floor(list_dot_product((SELECT m FROM mat_$tag)[$i], p)*1e9 + 0.5)/1e9")
          .mkString(",\n    ")
        s""", rows_$tag AS MATERIALIZED (
           |  SELECT fs.i AS i, list($cell ORDER BY ts.i) AS row
           |  FROM tstates fs, states ts GROUP BY fs.i, fs.name
           |), mat_$tag AS MATERIALIZED (SELECT list(row ORDER BY i) AS m FROM rows_$tag),
           |it_$tag(k, p) AS (
           |  SELECT 0, [0.0,0.0,0.0,0.0,0.0,1.0,0.0]::DOUBLE[]
           |  UNION ALL
           |  SELECT k+1, [
           |    $dots,
           |    1.0, 0.0]
           |  FROM it_$tag WHERE k < 48
           |), p_$tag AS (SELECT p[1] AS v FROM it_$tag WHERE k = 48)""".stripMargin
      }
      val scen = scenario("full", None) +
        Seq("click", "error", "signup", "view")
          .map(s0 => scenario(s"rm_$s0", Some(s0))).mkString
      s"""WITH RECURSIVE e AS (
         |  SELECT user_id, event_id, event_type, ts::TIMESTAMP AS ts FROM events
         |), g AS MATERIALIZED (
         |  SELECT *, CASE WHEN lag(ts) OVER w IS NULL
         |      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS new_s,
         |    lag(event_type) OVER w AS prev_type
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         |), sidt AS MATERIALIZED (
         |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         |  FROM g
         |), kpt AS MATERIALIZED (
         |  SELECT *, coalesce(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |    OVER (PARTITION BY user_id, sid ORDER BY ts, event_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior_p
         |  FROM sidt
         |), kept AS MATERIALIZED (SELECT * FROM kpt WHERE prior_p = 0
         |), lastk AS MATERIALIZED (
         |  SELECT *, row_number() OVER (PARTITION BY user_id, sid ORDER BY ts DESC, event_id DESC) AS rnd,
         |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |      OVER (PARTITION BY user_id, sid) AS has_p
         |  FROM kept
         |), trans AS MATERIALIZED (
         |  SELECT 'START' AS f, event_type AS t2, count(*)::BIGINT AS n FROM kept WHERE new_s = 1 GROUP BY 2
         |  UNION ALL
         |  SELECT prev_type, event_type, count(*)::BIGINT FROM kept WHERE new_s = 0 GROUP BY 1, 2
         |  UNION ALL
         |  SELECT event_type, 'NULL', count(*)::BIGINT FROM lastk WHERE rnd = 1 AND has_p = 0 GROUP BY 1
         |), tot AS (SELECT f, sum(n)::DOUBLE AS t FROM trans GROUP BY 1
         |), probs AS MATERIALIZED (SELECT tr.f, tr.t2, tr.n::DOUBLE / tt.t AS p FROM trans tr JOIN tot tt USING (f)
         |), states AS (SELECT * FROM (VALUES (0,'START'),(1,'view'),(2,'click'),(3,'signup'),(4,'error'),(5,'purchase'),(6,'NULL')) s(i, name)
         |), tstates AS (SELECT * FROM states WHERE i <= 4)$scen,
         |re AS (
         |  SELECT
         |    1 - (SELECT v FROM p_rm_click) / (SELECT v FROM p_full) AS re_click,
         |    1 - (SELECT v FROM p_rm_error) / (SELECT v FROM p_full) AS re_error,
         |    1 - (SELECT v FROM p_rm_signup) / (SELECT v FROM p_full) AS re_signup,
         |    1 - (SELECT v FROM p_rm_view) / (SELECT v FROM p_full) AS re_view,
         |    (SELECT v FROM p_full) AS pf
         |)
         |SELECT s.state,
         |  floor(re.pf * 1e4 + 0.5)/1e4 AS p_conv,
         |  floor(s.r * 1e4 + 0.5)/1e4 AS removal_effect,
         |  floor(s.r / (re.re_click + re.re_error + re.re_signup + re.re_view) * 1e4 + 0.5)/1e4 AS attribution
         |FROM re, LATERAL (
         |  SELECT * FROM (VALUES
         |    ('click', re.re_click), ('error', re.re_error),
         |    ('signup', re.re_signup), ('view', re.re_view)) v(state, r)) s""".stripMargin
    },
    "q191_time_to_convert" ->
      """WITH v AS (
        |  SELECT user_id, min(ts::TIMESTAMP) AS t_view FROM events
        |  WHERE event_type = 'view' GROUP BY 1
        |), c AS (
        |  SELECT e.user_id, min(e.ts::TIMESTAMP) AS t_click, min(v.t_view) AS t_view
        |  FROM events e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND e.ts::TIMESTAMP > v.t_view GROUP BY 1
        |), p AS (
        |  SELECT e.user_id, min(e.ts::TIMESTAMP) AS t_purch, min(c.t_view) AS t_view
        |  FROM events e JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts::TIMESTAMP > c.t_click GROUP BY 1
        |), durs AS (
        |  SELECT user_id, epoch_us(t_purch) - epoch_us(t_view) AS dur_us FROM p
        |), rk AS (
        |  SELECT *, row_number() OVER (ORDER BY dur_us, user_id) AS rn FROM durs
        |), agg AS (
        |  SELECT count(*)::BIGINT AS n_conv, sum(dur_us)::HUGEINT AS sum_us FROM durs
        |)
        |SELECT (SELECT n_conv FROM agg) AS n_conv,
        |  floor((SELECT sum_us FROM agg)::DOUBLE / (SELECT n_conv FROM agg)::DOUBLE / 1e6 * 10000 + 0.5)/10000 AS mean_secs,
        |  floor((SELECT dur_us FROM rk WHERE rn = ((SELECT n_conv FROM agg) + 1) // 2)::DOUBLE / 1e6 * 10000 + 0.5)/10000 AS median_secs,
        |  floor((SELECT dur_us FROM rk WHERE rn = ((SELECT n_conv FROM agg) * 9 + 9) // 10)::DOUBLE / 1e6 * 10000 + 0.5)/10000 AS p90_secs""".stripMargin,
    "q190_session_lift" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, ts::TIMESTAMP AS ts FROM events
        |), g AS (
        |  SELECT *, CASE WHEN lag(ts) OVER w IS NULL
        |      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), sid AS (
        |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM g
        |), st AS (
        |  SELECT DISTINCT user_id, sid, event_type FROM sid
        |), ns AS (
        |  SELECT count(*)::BIGINT AS n_sessions FROM (SELECT DISTINCT user_id, sid FROM st)
        |), singles AS (
        |  SELECT event_type, count(*)::BIGINT AS n_single FROM st GROUP BY 1
        |), pairs AS (
        |  SELECT a.event_type AS type_a, b.event_type AS type_b, count(*)::BIGINT AS n_both
        |  FROM st a JOIN st b ON a.user_id = b.user_id AND a.sid = b.sid
        |    AND a.event_type < b.event_type
        |  GROUP BY 1, 2
        |)
        |SELECT p.type_a, p.type_b, p.n_both, sa.n_single AS n_a, sb.n_single AS n_b,
        |  floor(p.n_both::DOUBLE / (SELECT n_sessions FROM ns)::DOUBLE * 10000 + 0.5)/10000 AS support,
        |  floor(p.n_both::DOUBLE * (SELECT n_sessions FROM ns)::DOUBLE
        |    / (sa.n_single::DOUBLE * sb.n_single::DOUBLE) * 10000 + 0.5)/10000 AS lift
        |FROM pairs p
        |JOIN singles sa ON p.type_a = sa.event_type
        |JOIN singles sb ON p.type_b = sb.event_type""".stripMargin,
    "q189_rfm" ->
      """WITH rfm AS (
        |  SELECT user_id, max(ts::TIMESTAMP::DATE) AS last_day, count(*)::BIGINT AS frequency,
        |    sum(value::DECIMAL(18,4)) AS mon
        |  FROM events GROUP BY 1
        |), a AS (SELECT max(last_day) AS asof_day FROM rfm),
        |n AS (SELECT count(*)::BIGINT AS n_users FROM rfm),
        |b AS (
        |  SELECT user_id, date_diff('day', last_day, (SELECT asof_day FROM a)) AS recency_days,
        |    frequency, floor(mon::DOUBLE * 100 + 0.5)/100 AS monetary
        |  FROM rfm
        |), r AS (
        |  SELECT *,
        |    row_number() OVER (ORDER BY recency_days, user_id) AS rr,
        |    row_number() OVER (ORDER BY frequency, user_id) AS fr,
        |    row_number() OVER (ORDER BY monetary, user_id) AS mr
        |  FROM b
        |)
        |SELECT user_id, recency_days::INTEGER AS recency_days, frequency, monetary,
        |  5 - ((rr - 1) * 4 // (SELECT n_users FROM n) + 1) AS r_score,
        |  (fr - 1) * 4 // (SELECT n_users FROM n) + 1 AS f_score,
        |  (mr - 1) * 4 // (SELECT n_users FROM n) + 1 AS m_score,
        |  (5 - ((rr - 1) * 4 // (SELECT n_users FROM n) + 1)) * 100
        |    + ((fr - 1) * 4 // (SELECT n_users FROM n) + 1) * 10
        |    + ((mr - 1) * 4 // (SELECT n_users FROM n) + 1) AS segment
        |FROM r""".stripMargin,
    "q185_transitions" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, ts::TIMESTAMP AS ts FROM events
        |), g AS (
        |  SELECT *, lag(event_type) OVER w AS prev_type,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), t AS (
        |  SELECT prev_type AS from_type, event_type AS to_type, count(*)::BIGINT AS n_trans
        |  FROM g WHERE new_s = 0 GROUP BY 1, 2
        |)
        |SELECT from_type, to_type, n_trans,
        |  floor(n_trans::DOUBLE / (sum(n_trans) OVER (PARTITION BY from_type))::DOUBLE
        |    * 10000 + 0.5)/10000 AS p_trans
        |FROM t""".stripMargin,
    "q182_sessions" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts::TIMESTAMP AS ts FROM events
        |), g AS (
        |  SELECT *, CASE WHEN lag(ts) OVER w IS NULL
        |      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), sid AS (
        |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM g
        |), sess AS (
        |  SELECT user_id, sid, count(*)::BIGINT AS n_ev,
        |    epoch_us(max(ts)) - epoch_us(min(ts)) AS dur_us
        |  FROM sid GROUP BY 1, 2
        |)
        |SELECT user_id, count(*)::BIGINT AS n_sessions,
        |  sum(n_ev)::BIGINT AS total_events,
        |  max(n_ev)::BIGINT AS max_session_events,
        |  floor(sum(dur_us)::DOUBLE / count(*)::DOUBLE / 1e6 * 10000 + 0.5)/10000 AS avg_session_secs
        |FROM sess GROUP BY 1""".stripMargin,
    "q183_funnel" ->
      """WITH v AS (
        |  SELECT user_id, min(ts::TIMESTAMP) AS t_view FROM events
        |  WHERE event_type = 'view' GROUP BY 1
        |), c AS (
        |  SELECT e.user_id, min(e.ts::TIMESTAMP) AS t_click
        |  FROM events e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND e.ts::TIMESTAMP > v.t_view GROUP BY 1
        |), p AS (
        |  SELECT e.user_id, min(e.ts::TIMESTAMP) AS t_purch
        |  FROM events e JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts::TIMESTAMP > c.t_click GROUP BY 1
        |), n AS (
        |  SELECT (SELECT count(DISTINCT user_id) FROM events)::BIGINT AS n0,
        |    (SELECT count(*) FROM v)::BIGINT AS n1,
        |    (SELECT count(*) FROM c)::BIGINT AS n2,
        |    (SELECT count(*) FROM p)::BIGINT AS n3
        |)
        |SELECT 1 AS stage_no, 'any_event' AS stage, n0 AS n_users,
        |  NULL::DOUBLE AS pct_prev,
        |  CASE WHEN n0 > 0 THEN floor(n0::DOUBLE / n0::DOUBLE * 10000 + 0.5)/10000 END AS pct_first
        |FROM n
        |UNION ALL SELECT 2, 'view', n1,
        |  CASE WHEN n0 > 0 THEN floor(n1::DOUBLE / n0::DOUBLE * 10000 + 0.5)/10000 END,
        |  CASE WHEN n0 > 0 THEN floor(n1::DOUBLE / n0::DOUBLE * 10000 + 0.5)/10000 END
        |FROM n
        |UNION ALL SELECT 3, 'click_after_view', n2,
        |  CASE WHEN n1 > 0 THEN floor(n2::DOUBLE / n1::DOUBLE * 10000 + 0.5)/10000 END,
        |  CASE WHEN n0 > 0 THEN floor(n2::DOUBLE / n0::DOUBLE * 10000 + 0.5)/10000 END
        |FROM n
        |UNION ALL SELECT 4, 'purchase_after_click', n3,
        |  CASE WHEN n2 > 0 THEN floor(n3::DOUBLE / n2::DOUBLE * 10000 + 0.5)/10000 END,
        |  CASE WHEN n0 > 0 THEN floor(n3::DOUBLE / n0::DOUBLE * 10000 + 0.5)/10000 END
        |FROM n""".stripMargin,
    "q184_retention" ->
      """WITH f AS (
        |  SELECT user_id, ts::TIMESTAMP::DATE AS day FROM events
        |), first AS (
        |  SELECT user_id, min(day) AS cohort_day FROM f GROUP BY 1
        |), sizes AS (
        |  SELECT cohort_day, count(*)::BIGINT AS cohort_users FROM first GROUP BY 1
        |), act AS (
        |  SELECT DISTINCT user_id, day FROM f
        |), grid AS (
        |  SELECT first.cohort_day, date_diff('day', first.cohort_day, act.day) AS offset_d,
        |    count(DISTINCT act.user_id)::BIGINT AS n_active
        |  FROM act JOIN first ON act.user_id = first.user_id
        |  GROUP BY 1, 2
        |)
        |SELECT g.cohort_day, g.offset_d, g.n_active, s.cohort_users,
        |  floor(g.n_active::DOUBLE / s.cohort_users::DOUBLE * 10000 + 0.5)/10000 AS retention
        |FROM grid g JOIN sizes s ON g.cohort_day = s.cohort_day""".stripMargin
  )
}
