package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-sessionization flags and within-session transition counts —
  * ONE code path for the batch queries (q182 sessions, q185
  * transition matrix, q190 session lift) and the streaming maintainer
  * (StreamPipeline.transitionMaintain): the stream's per-batch counts
  * come from exactly this window logic over (carry ∪ batch), so
  * stream ≡ batch is structural, not coincidental.
  *
  * TWO bitwise-equal evaluation strategies (TransitionsChunkedSpec
  * pins chunked ≡ direct on both testdata corpora):
  *
  *  - [[flagsDirect]] — one `Window.partitionBy(user_id)` pass. Per-
  *    key parallelism: each user's ENTIRE history sorts in one task.
  *    Right for micro-batch-sized frames (the streaming maintainer's
  *    carry ∪ batch) and for feeds whose key cardinality grows with
  *    volume.
  *  - [[flagsChunked]] — the ChunkedFrame two-level idiom. The lag-1
  *    flag is chunk-local-with-halo ([[ChunkedFrame.withTrailingEval]],
  *    halo 1) and the session id is a running flag sum
  *    ([[ChunkedFrame.withRunningSum]] — exact long addition, so the
  *    split evaluation reassociates bitwise). Parallelism is
  *    volume/blockSize, NOT per-key: a single bot user carrying 50%
  *    of the feed — the realistic skew in event data — costs two
  *    extra shuffles instead of serializing that user's history into
  *    one task (the q108/q109 dominant-key ceiling). The batch
  *    queries route here unconditionally: at 100 TB a dominant key is
  *    when the answer matters most, and the chunked plan is
  *    bitwise-identical at any scale.
  *
  * Chunk granularity is `date_trunc("hour", ts)` — monotone in the
  * (ts, event_id) order, and the (user, hour) offset table stays
  * broadcastable (bounded by keys × hours, one row per NONEMPTY
  * pair).
  */
object Transitions {

  val GapUs: Long = 1800L * 1000000L // 30 minutes

  /** One per-user window pass: previous-event timestamp AND type,
    * the new-session flag on a > 30 min gap, and the session id
    * (running flag sum). `chunked` selects the evaluation strategy
    * (identical output bit for bit — see class doc). */
  def flags(events: DataFrame, chunked: Boolean = false): DataFrame =
    if (chunked) flagsChunked(events) else flagsDirect(events)

  /** Direct single-window evaluation — per-key-history tasks. */
  def flagsDirect(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    withNewSessionFlag(events
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w)))
      .withColumn("sid", sum(col("new_s"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Two-level evaluation — volume-proportional tasks, immune to a
    * dominant key. Bitwise equal to [[flagsDirect]]: every derived
    * value is integer/timestamp arithmetic, so the chunk-split
    * evaluation reassociates exactly.
    *
    * FUSED single-shuffle form (round 10): the first cut composed
    * ChunkedFrame.withTrailingEval + withRunningSum — three full-data
    * shuffles. But lag-1 and a running sum need none of the
    * block/halo machinery: ONE (user, hour-chunk) exchange carries
    * everything —
    *
    *  1. a local window inside (user, chunk) gives the local lag
    *     (ts + type), the local gap flag, and its local running sum;
    *  2. a per-(user, chunk) aggregate — a chunk-count-sized table —
    *     collects each chunk's first ts, last ts/type, and local
    *     flag total; a lag + exclusive prefix-sum per user over THAT
    *     table yields each chunk's true boundary (prior chunk's last
    *     event) and its session-id offset. The aggregate arm reuses
    *     the same exchange (ReuseExchange dedupes the identical
    *     subtree), so the data shuffles ONCE;
    *  3. a join on (user, chunk) closes per-row: a chunk's
    *     first row takes its `prev` from the prior chunk's last
    *     event; the uniform gap formula recomputes `new_s`
    *     (identical to [[flagsDirect]]'s); and
    *     sid = offset + local running flag sum + (first-row flag − 1)
    *     — the last term corrects every in-chunk running sum for the
    *     first row's locally-unknowable boundary flag.
    *
    * The (user, chunk) table is bounded by keys × hours (one row per
    * NONEMPTY pair); the join is left un-hinted so AQE broadcasts it
    * when it fits and falls back to a shuffled join (which only moves
    * the chunk table — loc already carries the (user, chunk)
    * partitioning) when it would not. Per-task work is one chunk's
    * rows, so a 50%-volume bot splits across its hours instead of
    * serializing (bot probe in BASELINE.md). */
  def flagsChunked(events: DataFrame): DataFrame = {
    val k = col("user_id")
    val withChunk = events.withColumn("__chunk", date_trunc("hour", col("ts")))
    val wLoc = Window.partitionBy(k, col("__chunk")).orderBy(col("ts"), col("event_id"))

    // 1. local lag / flag / running flag sum — keys × chunks tasks wide
    val loc = withChunk
      .withColumn("__lprev", lag(col("ts"), 1).over(wLoc))
      .withColumn("__lprev_type", lag(col("event_type"), 1).over(wLoc))
      .withColumn("__lnew",
        when(col("__lprev").isNull ||
          unix_micros(col("ts")) - unix_micros(col("__lprev")) > GapUs, 1L).otherwise(0L))
      .withColumn("__lrun", sum(col("__lnew"))
        .over(wLoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))

    // 2. the chunk table: boundaries + offsets on chunk-count-sized data
    val wSeq = Window.partitionBy(col("__c_user")).orderBy(col("__c_chunk"))
    val chunks = loc.groupBy(k.as("__c_user"), col("__chunk").as("__c_chunk"))
      .agg(
        min(struct(col("ts"), col("event_id"))).getField("ts").as("__first_ts"),
        max_by(struct(col("ts").as("t"), col("event_type").as("y")),
          struct(col("ts"), col("event_id"))).as("__last"),
        sum(col("__lnew")).as("__sum_lnew"))
      .withColumn("__prior_ts", lag(col("__last.t"), 1).over(wSeq))
      .withColumn("__prior_type", lag(col("__last.y"), 1).over(wSeq))
      .withColumn("__first_new",
        when(col("__prior_ts").isNull ||
          unix_micros(col("__first_ts")) - unix_micros(col("__prior_ts")) > GapUs, 1L)
          .otherwise(0L))
      .withColumn("__off", coalesce(
        sum(col("__sum_lnew") + col("__first_new") - lit(1L))
          .over(wSeq.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__c_user"), col("__c_chunk"), col("__prior_ts"),
        col("__prior_type"), col("__first_new"), col("__off"))

    // 3. per-row close: boundary prev for chunk-first rows, the
    // uniform gap formula, and the offset-corrected running sum.
    // NO broadcast hint: the chunk table is bounded by nonempty
    // (user, hour) pairs, which approaches event grain for sparse
    // feeds — an unconditional broadcast would hit the 8 GB ceiling
    // at 100 TB. loc is already hash-partitioned on (user, chunk)
    // and sorted on a (user, chunk, ts, event_id) prefix from the
    // step-1 window, so a shuffled join moves ONLY the chunk table;
    // AQE upgrades to broadcast at runtime when it actually fits.
    loc.join(chunks,
        k === col("__c_user") && col("__chunk") === col("__c_chunk"))
      .withColumn("prev",
        when(col("__lprev").isNull, col("__prior_ts")).otherwise(col("__lprev")))
      .withColumn("prev_type",
        when(col("__lprev").isNull, col("__prior_type")).otherwise(col("__lprev_type")))
      .withColumn("new_s",
        when(col("prev").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev")) > GapUs, 1L).otherwise(0L))
      .withColumn("sid", col("__off") + col("__lrun") + col("__first_new") - lit(1L))
      .drop("__chunk", "__lprev", "__lprev_type", "__lnew", "__lrun",
        "__c_user", "__c_chunk", "__prior_ts", "__prior_type", "__first_new", "__off")
  }

  /** The gap flag itself — shared per-row arithmetic over the lagged
    * columns, so the two strategies cannot drift. */
  private def withNewSessionFlag(lagged: DataFrame): DataFrame =
    lagged.withColumn("new_s",
      when(col("prev").isNull ||
        unix_micros(col("ts")) - unix_micros(col("prev")) > GapUs, 1L).otherwise(0L))

  /** Within-session consecutive-pair counts: exactly the rows whose
    * new-session flag is 0. */
  def counts(events: DataFrame, chunked: Boolean = false): DataFrame =
    flags(events, chunked)
      .filter(col("new_s") === 0L)
      .groupBy(col("prev_type").as("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n_trans"))
}
