package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Markov removal-effect attribution (q196) — ONE code path for the
  * batch query and the streaming maintainer
  * (StreamPipeline.attributionMaintain).
  *
  * Journeys are the 30-min gap sessions truncated at the first
  * purchase; edges are START → first event, within-journey pairs, and
  * last event → NULL for non-converting sessions. The decomposition
  * that makes the model maintainable WITHOUT retractions:
  *
  *  - starts and pairs are APPEND-ONLY under event-time-ordered
  *    arrival (a new event can only add a start or extend a journey);
  *  - an END edge becomes permanent only when its session CLOSES (a
  *    later session for the same user exists). The open (last)
  *    session's END is PROVISIONAL — it lives in the carry, not the
  *    counts, and serve-time adds it back: that reproduces the batch
  *    query exactly, because a batch run treats feed-end as the end
  *    of every open session too.
  *
  *  The carry holds each user's last event of the open session —
  *  last ANY event, not last kept: session gaps are measured on the
  *  raw feed (a post-purchase event still extends its session), so
  *  truncation must not bend boundaries (AttributionStreamSpec pins
  *  the designed divergence case) — plus the open session's
  *  has-purchase flag.
  *
  * [[signals]] with no carry rows reduces exactly to the batch
  * extraction, so batch ≡ stream is structural.
  */
object Markov {

  val States: Vector[String] =
    Vector("START", "view", "click", "signup", "error", "purchase", "NULL")
  val Removable: Seq[String] = Seq("click", "error", "signup", "view")

  /** Per-row journey signals over a frame of (user_id, ts, event_id,
    * event_type, __carry boolean, __open_p 0/1 long) — carry rows are
    * prior-state markers: they anchor gaps and supply boundary pairs
    * but never re-contribute their own start, and `__open_p`
    * propagates a carried session's pre-frame purchase into the
    * continuation session's truncation/END logic. */
  private def signals(frame: DataFrame, chunked: Boolean): DataFrame = {
    val f = Transitions.flags(frame, chunked)
    val wOrd = Window.partitionBy(col("user_id"), col("sid")).orderBy(col("ts"), col("event_id"))
    val wAll = Window.partitionBy(col("user_id"), col("sid"))
    val wUser = Window.partitionBy(col("user_id"))
    val isP = when(col("event_type") === "purchase", 1L).otherwise(0L)
    f.select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
      col("prev_type"), col("new_s"), col("sid"), col("__carry"),
      (coalesce(sum(isP).over(wOrd.rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
        + max(col("__open_p")).over(wAll)).as("prior_p"),
      row_number().over(wOrd).as("rn"),
      count(lit(1)).over(wAll).as("cnt"),
      (max(isP).over(wAll) + max(col("__open_p")).over(wAll)).as("has_p"),
      max(col("sid")).over(wUser).as("last_sid"))
  }

  private val none = array().cast("array<struct<f:string,t2:string>>")

  /** PERMANENT edges of the frame: starts (non-carry new-session
    * rows), kept within-journey pairs, and ENDs of CLOSED
    * non-converting sessions. */
  def permEdges(sig: DataFrame): DataFrame =
    sig.select(explode(concat(
      when(col("new_s") === 1L && !col("__carry"),
        array(struct(lit("START").as("f"), col("event_type").as("t2")))).otherwise(none),
      when(col("new_s") === 0L && col("prior_p") === 0L,
        array(struct(col("prev_type").as("f"), col("event_type").as("t2")))).otherwise(none),
      when(col("rn") === col("cnt") && col("has_p") === 0L && col("sid") < col("last_sid"),
        array(struct(col("event_type").as("f"), lit("NULL").as("t2")))).otherwise(none)))
      .as("tr"))
      .groupBy(col("tr.f").as("f"), col("tr.t2").as("t2"))
      .agg(count(lit(1)).as("n"))

  /** PROVISIONAL ENDs: the open (last) session's end-of-feed edge —
    * what a batch run would count because the feed stops here. */
  def openEnds(sig: DataFrame): DataFrame =
    sig.filter(col("rn") === col("cnt") && col("has_p") === 0L &&
        col("sid") === col("last_sid"))
      .groupBy(col("event_type").as("f"))
      .agg(count(lit(1)).as("n"))
      .select(col("f"), lit("NULL").as("t2"), col("n"))

  /** Next carry: each user's last frame row + the open session's
    * has-purchase flag. */
  def carryNext(sig: DataFrame): DataFrame =
    sig.filter(col("rn") === col("cnt") && col("sid") === col("last_sid"))
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        least(col("has_p"), lit(1L)).as("open_p"))

  /** Batch edge counts over a plain event frame (no carry): permanent
    * plus end-of-feed ENDs in ONE exploded-contributions aggregation
    * (closed/open END split collapses to `rn = cnt ∧ has_p = 0` when
    * the feed ends here, so no second consumer of the signal frame —
    * the 56→19 s q196 lesson). */
  def batchEdges(events: DataFrame, chunked: Boolean): DataFrame = {
    val sig = signals(events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("__carry", lit(false)).withColumn("__open_p", lit(0L)), chunked)
    sig.select(explode(concat(
        when(col("new_s") === 1L,
          array(struct(lit("START").as("f"), col("event_type").as("t2")))).otherwise(none),
        when(col("new_s") === 0L && col("prior_p") === 0L,
          array(struct(col("prev_type").as("f"), col("event_type").as("t2")))).otherwise(none),
        when(col("rn") === col("cnt") && col("has_p") === 0L,
          array(struct(col("event_type").as("f"), lit("NULL").as("t2")))).otherwise(none)))
        .as("tr"))
      .groupBy(col("tr.f").as("f"), col("tr.t2").as("t2"))
      .agg(count(lit(1)).as("n"))
  }

  /** Streaming micro-batch extraction over (carry ∪ batch): returns
    * (permanent edges, next carry). The two consumers read a
    * localCheckpointed signal frame — micro-batch-sized by
    * construction. */
  private[graft] def streamEdges(carry: Option[DataFrame], batch: DataFrame): (DataFrame, DataFrame) = {
    val b = batch.select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("__carry", lit(false)).withColumn("__open_p", lit(0L))
    val uni = carry match {
      case Some(c) => b.unionByName(c.select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"), lit(true).as("__carry"), col("open_p").as("__open_p")))
      case None => b
    }
    val sig = signals(uni, chunked = false).localCheckpoint(true)
    (permEdges(sig), carryNext(sig))
  }

  /** The driver-side absorption solve over a collected edge-count map
    * — ≤35 cells at any volume (the q186 collected-aggregate
    * precedent): 48 fixed-order value iterations with 1e-9 iterate
    * snapping, removal redirects incoming mass to NULL, shares
    * normalize in fixed order. Mirrored exactly by the DuckDB
    * recursive-CTE oracle. */
  def solve(trans: Map[(String, String), Long]): Seq[(String, Double, Double, Double)] = {
    val transient = 0 until 5
    def snap(x: Double): Double = math.floor(x * 1e9 + 0.5) / 1e9
    def r4d(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4
    def matrix(removed: Option[String]): Array[Array[Double]] =
      transient.map { i =>
        val from = States(i)
        val tot = States.indices.map(j => trans.getOrElse((from, States(j)), 0L)).sum.toDouble
        val row = Array.tabulate(7) { j =>
          if (tot == 0) 0.0 else trans.getOrElse((from, States(j)), 0L).toDouble / tot
        }
        removed.foreach { st =>
          val js = States.indexOf(st)
          row(6) += row(js); row(js) = 0.0
        }
        row
      }.toArray
    def pStart(m: Array[Array[Double]]): Double = {
      var p = Array(0.0, 0.0, 0.0, 0.0, 0.0, 1.0, 0.0)
      for (_ <- 1 to 48) {
        val np = p.clone()
        transient.foreach { i =>
          var acc = 0.0
          var j = 0
          while (j < 7) { acc += m(i)(j) * p(j); j += 1 }
          np(i) = snap(acc)
        }
        p = np
      }
      p(0)
    }
    val pF = pStart(matrix(None))
    val res = Removable.map { st => st -> (1.0 - pStart(matrix(Some(st))) / pF) }
    val sumRe = res.map(_._2).sum
    res.map { case (st, re) => (st, r4d(pF), r4d(re), r4d(re / sumRe)) }
  }

  /** [[solve]] as the q196 result frame. */
  def attributionDf(s: SparkSession, trans: Map[(String, String), Long]): DataFrame = {
    import s.implicits._
    solve(trans).toDF("state", "p_conv", "removal_effect", "attribution")
  }

  private[graft] def collectEdges(edges: DataFrame): Map[(String, String), Long] =
    edges.collect().map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n")).toMap
}
