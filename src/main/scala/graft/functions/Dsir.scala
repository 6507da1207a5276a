package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style importance scoring (Xie et al. 2023, arXiv:2302.03169):
  * hashed-bigram bag features, add-1-smoothed target/raw bucket
  * models, and a per-document summed log-likelihood-ratio score.
  * Shared between the batch query (q141) and the streaming ingest
  * gate ([[graft.streaming.StreamPipeline.importanceGate]]) so both
  * regimes score through ONE code path.
  *
  * Every transcendental is quantized ONCE (integer micro-log2 units,
  * the q81 fixed-point rule), so scores are exact integers —
  * partition-order free, replayable in ANSI SQL, and bitwise
  * identical between the batch and streaming forms.
  *
  * Scale shape: the model is `nSlots` rows at ANY corpus size and
  * broadcasts; scoring a document is a map-side slot lookup per
  * bigram plus one per-doc aggregate — linear in corpus volume,
  * which is how DSIR selects from 100 TB raw pools.
  */
object Dsir {

  val defaultSlots = 4096L

  private def qlog2(x: Column): Column =
    floor(log2(x) * lit(1e6) + lit(0.5)).cast("long")

  /** Bigram→slot feature stream: one row per (id, slot) bigram
    * occurrence. The md5-15 token hash is pre-reduced mod P before
    * the affine slot hash — the raw 2^60 key would overflow the
    * BIGINT multiply (DuckDB errors, Spark wraps). Keeps any extra
    * columns of `docs` that `keep` lists. */
  def slots(docs: DataFrame, idCol: Column, textCol: Column,
            nSlots: Long = defaultSlots, keep: Seq[String] = Nil): DataFrame = {
    val words = col("__words")
    val idx = when(size(words) >= 2, sequence(lit(1), size(words) - lit(1)))
      .otherwise(array().cast("array<int>"))
    docs
      .select((idCol.as("id") +: keep.map(col) :+ TextAnalysis.wordTokens(textCol).as("__words")): _*)
      .select((col("id") +: keep.map(col) :+ explode(
        transform(idx, i => concat_ws(" ", slice(words, i, lit(2))))).as("__bg")): _*)
      .withColumn("slot",
        Sketches.slot(NearDup.md5TokenHash(col("__bg")) % Sketches.P, 0, nSlots))
      .drop("__bg")
  }

  /** The (slot → lam_fp) importance model from a feature stream with
    * an `is_t` target flag: add-1-smoothed bucket log-probabilities
    * for target and raw, differenced in integer micro-log2 units.
    * `nSlots` rows — broadcast it wherever it is consumed. */
  def model(slotStream: DataFrame, nSlots: Long = defaultSlots): DataFrame = {
    val m = slotStream.groupBy(col("slot")).agg(
      sum(when(col("is_t"), 1L).otherwise(0L)).as("ct"),
      sum(when(!col("is_t"), 1L).otherwise(0L)).as("cr"))
    val totals = m.agg(sum(col("ct")).as("tt"), sum(col("cr")).as("tr"))
    m.crossJoin(broadcast(totals))
      .select(col("slot"),
        (qlog2((col("ct") + 1).cast("double") / (col("tt") + nSlots).cast("double"))
          - qlog2((col("cr") + 1).cast("double") / (col("tr") + nSlots).cast("double"))).as("lam_fp"))
  }

  /** Model + scores in one pass economy: the feature stream feeds the
    * model build AND the raw-pool scoring, so materialize it once
    * (MEMORY_AND_DISK — slot rows are (id, flag, long), far smaller
    * than the text they came from) instead of paying the
    * explode+md5 bigram pass twice. Same persist-working-tables
    * contract as NearDup; Bench/callers clear cache when done. */
  def modelAndScore(slotStream: DataFrame, nSlots: Long = defaultSlots): DataFrame = {
    val s = slotStream.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    score(s.filter(!col("is_t")), model(s, nSlots))
  }

  /** Score a feature stream against a (slot, lam_fp) model: per doc,
    * the bigram count, the exact integer score, and the keep verdict
    * (more target-like than raw-like). The model joins broadcast —
    * the scored side never shuffles except the per-doc aggregate. */
  def score(slotStream: DataFrame, lamModel: DataFrame): DataFrame =
    slotStream
      .join(broadcast(lamModel), Seq("slot"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lam_fp")).as("score_fp"))
      .withColumn("keep", col("score_fp") > 0)
}
