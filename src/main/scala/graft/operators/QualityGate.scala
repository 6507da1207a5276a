package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Per-source adaptive quality gating — the ONE code path behind the
  * q161 batch query and the streaming ingest gate
  * ([[graft.streaming.StreamPipeline.adaptiveQualityGate]]), so the
  * spec can pin stream ≡ batch on the same corpus.
  *
  * The quality score is q24's composite (token mass x punctuation x
  * stopword penalties), micro-quantized ONCE to integer units so every
  * downstream rank / cutoff / gate comparison is exact integer
  * arithmetic — no ulp-order hazard between engines or between the
  * batch and streaming evaluations. The per-source threshold is the
  * 25th-percentile DISCRETE rank selection (element at rank ceil(n/4)
  * under (quality, doc_id) — the q136 convention), computed WITHOUT a
  * per-source sort via [[ChunkedFrame.globalRank]] (sources x
  * quality-bucket parallelism; a bare per-source window would
  * serialize this feed's 10 fixed sources into 10 tasks at 100x).
  */
object QualityGate {

  /** q24's quality expression micro-quantized to integer units.
    * Null (e.g. an empty doc: no tokens → stopword ratio undefined)
    * stays null — callers decide the null policy. */
  def scoreFp(text: Column): Column = {
    val toks = TextAnalysis.wordTokens(text)
    val punctRatio = TextAnalysis.punctCount(text).cast("double") /
      nullif(length(text), lit(0))
    val stopRatio = TextAnalysis.stopwordCount(toks).cast("double") /
      nullif(size(toks), lit(0))
    val q = TextAnalysis.qualityScore(size(toks).cast("double"), punctRatio, stopRatio)
    floor(q * lit(1e6) + lit(0.5)).cast("long")
  }

  /** Score a documents frame: (doc_id, source, quality_fp), unscorable
    * docs dropped. Persisted by the CALLER when consumed repeatedly —
    * the expression chain (4 regex extractions + a stopword scan) is
    * the heaviest per-row work in the battery. */
  def scored(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"), scoreFp(col("text")).as("quality_fp"))
      .filter(col("quality_fp").isNotNull)

  /** Per-source P25 cutoff table (source, q_cut_fp) from a scored
    * frame — |sources| rows, broadcastable at any corpus size. */
  def cutoffs(scoredDf: DataFrame): DataFrame = {
    val counts = scoredDf.groupBy(col("source")).agg(count(lit(1)).as("cnt"))
    ChunkedFrame.globalRank(scoredDf, "source", expr("quality_fp DIV 1000000"),
        Seq("quality_fp", "doc_id"))
      .join(broadcast(counts), Seq("source"))
      .filter(col("__g") === expr("(cnt + 3) DIV 4 - 1"))
      .select(col("source"), col("quality_fp").as("q_cut_fp"))
  }

  /** Gate a scored frame against a cutoff table: adds q_cut_fp and
    * kept. A source absent from the cutoff table keeps its docs
    * (null-cutoff rows pass): a gate with no evidence about a source
    * must not silently destroy it — the flagged-path audit downstream
    * is where an operator notices the new source and retrains. */
  def gate(scoredDf: DataFrame, cuts: DataFrame): DataFrame =
    scoredDf.join(broadcast(cuts), Seq("source"), "left")
      .withColumn("kept",
        col("q_cut_fp").isNull || col("quality_fp") >= col("q_cut_fp"))
}
