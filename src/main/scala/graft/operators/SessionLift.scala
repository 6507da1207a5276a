package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Session co-occurrence lift (q190) as maintainable state — the
  * closed/provisional pattern, with the key observation that a
  * session's contribution to support/lift depends ONLY on its
  * distinct event-type SET, which is final when the session closes
  * and at most |types| entries while open. State is therefore
  * bounded:
  *
  *  - closed-session COUNT TABLE: one `sess` row (total closed
  *    sessions), ≤|types| `single` rows (sessions containing the
  *    type), ≤|types|² `pair` rows — merge by addition, append-only
  *    under ordered arrival;
  *  - per-user carry: the OPEN session's distinct type set (an array,
  *    ≤|types|) + its last event (ts, id) to anchor the gap.
  *
  * Serving adds each open session's provisional contribution (1
  * session, its singles, its pairs) — exactly what a batch run counts
  * by treating feed-end as session end — then closes with q190's
  * exact-integer-ratio formula, so served ≡ declared q190 bit for bit
  * under any ordered split (LiftStreamSpec).
  */
object SessionLift {

  /** One micro-batch fold: (carry, closed counts) + batch →
    * (contribution delta, next carry). The carried marker row anchors
    * the gap through the shared [[Transitions.flags]] logic; its type
    * set rides alongside and unions into the continuation session. */
  def fold(carry: Option[DataFrame], batch: DataFrame): (DataFrame, DataFrame) = {
    val b = batch.select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("__cset", array().cast("array<string>"))
      .withColumn("__carry", lit(false))
    val uni = carry match {
      case Some(c) => b.unionByName(c.select(col("user_id"),
        col("open_last_ts").as("ts"), col("open_last_event_id").as("event_id"),
        lit(null).cast("string").as("event_type"),
        col("open_types").as("__cset"), lit(true).as("__carry")))
      case None => b
    }
    val flagged = Transitions.flags(uni, chunked = false)
    val sess = flagged.groupBy(col("user_id"), col("sid"))
      .agg(
        // the union of the frame's types and a carried set; the marker
        // row's null event_type drops out of collect_set
        array_sort(array_union(collect_set(col("event_type")),
          flatten(collect_set(col("__cset"))))).as("types"),
        max(when(col("__carry"), 1L).otherwise(0L)).as("has_carry"),
        max(struct(col("ts"), col("event_id"))).as("last"))
      .withColumn("last_sid",
        max(col("sid")).over(org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))))
      .localCheckpoint(true) // session-grain; two consumers below
    val delta = contributions(sess.filter(col("sid") < col("last_sid")).select(col("types")))
    val nextCarry = sess.filter(col("sid") === col("last_sid"))
      .select(col("user_id"), col("last.ts").as("open_last_ts"),
        col("last.event_id").as("open_last_event_id"), col("types").as("open_types"))
    (delta, nextCarry)
  }

  /** The (kind, k1, k2, n) count rows a set of session type-sets
    * contributes: one `sess` row each, a `single` row per member, a
    * `pair` row per a<b member pair. */
  def contributions(typeSets: DataFrame): DataFrame = {
    val s = col("types")
    typeSets.select(explode(concat(
        array(struct(lit("sess").as("kind"), lit("").as("k1"), lit("").as("k2"))),
        transform(s, a => struct(lit("single").as("kind"), a.as("k1"), lit("").as("k2"))),
        flatten(transform(s, a =>
          transform(filter(s, b => b > a),
            b => struct(lit("pair").as("kind"), a.as("k1"), b.as("k2"))))))).as("c"))
      .groupBy(col("c.kind").as("kind"), col("c.k1").as("k1"), col("c.k2").as("k2"))
      .agg(count(lit(1)).as("n"))
  }

  /** q190's closing formula over a complete (closed + provisional)
    * count table. */
  def lift(counts: DataFrame): DataFrame = {
    def r4(c: Column) = floor(c * lit(10000d) + lit(0.5d)) / lit(10000d)
    def d(c: Column) = c.cast("double")
    val nSess = counts.filter(col("kind") === "sess")
      .agg(sum(col("n")).as("n_sessions"))
    val singles = counts.filter(col("kind") === "single")
      .groupBy(col("k1").as("event_type")).agg(sum(col("n")).as("n_single"))
    val pairs = counts.filter(col("kind") === "pair")
      .groupBy(col("k1").as("type_a"), col("k2").as("type_b"))
      .agg(sum(col("n")).as("n_both"))
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
}
