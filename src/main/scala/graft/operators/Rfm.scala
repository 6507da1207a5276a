package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** RFM segmentation (q189) — ONE code path for the batch query and
  * the streaming maintainer (StreamPipeline.rfmMaintain).
  *
  * The per-user state (last active day, event count, exact decimal
  * monetary sum) is EXACTLY mergeable — max / addition / decimal
  * addition, all order-insensitive — so the maintained store serves
  * segments bit-identical to a batch rebuild under ANY arrival order
  * (RfmStreamSpec pins a shuffled split). The as-of day and user
  * count derive from the store itself, so recency is always relative
  * to the live feed head. State is user-grain; the serve-time
  * quartile pass is the q173 discrete rank arithmetic over
  * ChunkedFrame.globalRank — no single-task sort at any user count.
  */
object Rfm {

  /** Per-user state over an event frame. The monetary sum re-casts to
    * decimal(28,4) so successive merges keep one fixed store schema
    * (the cast is exact within range; 1e24 capacity). */
  def userState(events: DataFrame): DataFrame =
    events.groupBy(col("user_id"))
      .agg(max(to_date(col("ts"))).as("last_day"),
        count(lit(1)).as("frequency"),
        sum(col("value").cast("decimal(18,4)")).cast("decimal(28,4)").as("mon"))

  /** Merge two state tables: max / sum / exact decimal sum. */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("user_id"))
      .agg(max(col("last_day")).as("last_day"),
        sum(col("frequency")).as("frequency"),
        sum(col("mon")).cast("decimal(28,4)").as("mon"))

  /** q189's closing logic: recency vs the store's as-of day, r2
    * monetary, discrete quartile scores (rank·4 DIV n), and the
    * composed RFM segment. */
  def segment(users0: DataFrame): DataFrame = {
    def r2(c: Column) = floor(c * lit(100d) + lit(0.5d)) / lit(100d)
    val users = users0.persist()
    users.count() // as-of/count branches + three rank passes re-read it
    val asof = users.agg(max(col("last_day")).as("asof_day"))
    val cnt0 = users.agg(count(lit(1)).as("n_users"))
    val rfm = users
      .crossJoin(broadcast(asof))
      .crossJoin(broadcast(cnt0))
      .withColumn("recency_days", datediff(col("asof_day"), col("last_day")))
      .withColumn("monetary", r2(col("mon").cast("double")))
      .withColumn("__k", lit(1))
      .select(col("user_id"), col("recency_days"), col("frequency"),
        col("monetary"), col("n_users"), col("__k"))
    // Round-16 optimization (guide §1.2 step 1 + §2.3): the former
    // NESTED quartile passes — each globalRank fans its input out to
    // a rank arm AND an offsets arm — duplicated the whole upstream
    // plan 2x per pass (2^3 = 8 copies of the rfm subtree, 84
    // exchanges in the initial plan). The three rank passes are
    // independent per-metric computations, so each now runs over a
    // NARROW (user_id, metric, n_users) projection of the shared rfm
    // frame and the three score tables join back on user_id: the
    // rank windows sort 3 columns instead of the full row (shuffle
    // fewer bytes), and the plan is 3 parallel arms instead of an
    // exponential nest. Ranks, scores, and output values are
    // unchanged (same rows into each rank window, same
    // (__g·4) DIV n arithmetic; RfmSpec + oracle q12-style hash pin
    // it).
    def rankTable(metric: String, chunk: Column, outCol: String): DataFrame =
      ChunkedFrame.globalRank(
        rfm.select(col("user_id"), col(metric), col("n_users"), col("__k")),
        "__k", chunk, Seq(metric, "user_id"))
        .withColumn(outCol, expr("(__g * 4) DIV n_users + 1"))
        .select(col("user_id"), col(outCol))
    // null-safe joins (r16 advice): userState's groupBy PRESERVES a
    // null user_id group, and the pre-r16 nested-window formulation
    // kept it; a plain equi-join here would silently drop it. <=> is
    // still a hash-joinable equi-key, so the plan shape is unchanged.
    // The score side renames its key (the arms share rfm's lineage —
    // a same-name condition would be an ambiguous self-join ref).
    def joinScore(base: DataFrame, score: DataFrame): DataFrame =
      base.join(score.withColumnRenamed("user_id", "__uid"),
        col("user_id") <=> col("__uid")).drop("__uid")
    val scored = joinScore(joinScore(joinScore(rfm,
      rankTable("recency_days", col("recency_days"), "rq")),
      rankTable("frequency", col("frequency"), "fq")),
      rankTable("monetary", floor(col("monetary")), "mq"))
    // the |users|-row cache stays resident for the caller's action
    // (an eager localCheckpoint here measured +0.7 s on the sf0.1
    // bench — materializing the output costs more than the small
    // cache it would free)
    scored.select(col("user_id"), col("recency_days"), col("frequency"), col("monetary"),
      (lit(5L) - col("rq")).as("r_score"), col("fq").as("f_score"), col("mq").as("m_score"),
      ((lit(5L) - col("rq")) * 100 + col("fq") * 10 + col("mq")).as("segment"))
  }
}
