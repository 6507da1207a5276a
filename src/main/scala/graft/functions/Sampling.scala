package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling/splitting for training-data
  * pipelines. Everything is a pure function of row content — no
  * rand() — so splits are reproducible across runs, partitionings and
  * engines (the oracle recomputes them exactly).
  */
object Sampling {

  /** Knuth multiplicative hash bucket in [0, buckets): reproducible,
    * well-mixed, and expressible in any engine with 64-bit integer
    * arithmetic (unlike engine-specific hash functions).
    *
    * Overflow-PROOF, not just overflow-tolerant: the id is reduced
    * mod 2^31 BEFORE the multiply, so every intermediate stays below
    * 2^31 * 2654435761 < 2^63. A raw `id * 2654435761` wraps
    * silently in Spark for ids above ~3.47e9 but ERRORS in DuckDB
    * (BIGINT overflow) — the two engines would diverge exactly at
    * the 100 TB id ranges this split targets. For ids < 2^31 the
    * reduction is a no-op, so small-scale outputs are unchanged. */
  def hashBucket(id: Column, buckets: Int): Column =
    pmod(((id % lit(2147483648L)) * lit(2654435761L)) % lit(4294967296L), lit(buckets.toLong))

  /** Deterministic train/validation/test split by id hash:
    * label column with the split name. Fractions in percent. */
  def split(df: DataFrame, idCol: Column, trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val b = hashBucket(idCol, 100)
    df.withColumn("split",
      when(b < trainPct, lit("train"))
        .when(b < trainPct + valPct, lit("val"))
        .otherwise(lit("test")))
  }

  /** Per-group quota sampling: keep at most `quota` rows per group,
    * best-first under `order` (e.g. quality score desc) — domain
    * balancing for web corpora.
    *
    * Scale shape: the `row_number() <= quota` filter sits DIRECTLY on
    * the untouched int rank attribute, which keeps Catalyst's
    * InferWindowGroupLimit rule eligible — the physical plan gets a
    * PARTIAL WindowGroupLimit before the exchange, so every map task
    * ships at most `quota` rows per group (pinned by SamplingPlanSpec;
    * wrapping the rank in a cast silently disables the rule and
    * reverts to a full per-group sort on one reducer). */
  def quotaPerGroup(df: DataFrame, groupCol: Column, order: Seq[Column], quota: Int): DataFrame =
    df.withColumn("__rn", row_number().over(Window.partitionBy(groupCol).orderBy(order: _*)))
      .filter(col("__rn") <= quota)
      .drop("__rn")

  /** Deterministic uniform in [0, 1) from an id — the Knuth
    * multiplicative hash scaled to the unit interval. The same id
    * always draws the same number, on any engine. */
  def unitHash(id: Column): Column =
    pmod(((id % lit(2147483648L)) * lit(2654435761L)) % lit(4294967296L), lit(4294967296L))
      .cast("double") / lit(4294967296.0)

  /** Deterministic WEIGHTED Bernoulli sampling: keep a row iff
    * unitHash(id) < weight (a [0,1] column — e.g. a quality score or
    * a per-source mixture rate joined on). E[kept] = sum(weights),
    * rows keep independently, and the decision is a pure map-side
    * filter — no shuffle, no rand(), reproducible across runs /
    * partitionings / engines. This is the importance-sampling
    * primitive a mixture build uses to hit target source rates at
    * 100 TB without a global pass. */
  def weightedSample(df: DataFrame, idCol: Column, weight: Column): DataFrame =
    df.filter(unitHash(idCol) < weight)
}
