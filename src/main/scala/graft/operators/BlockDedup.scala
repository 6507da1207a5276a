package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Block-level exact-substring dedup with reconstruction (the
  * aligned-block practical form of Lee et al. 2021, arXiv:2107.06499):
  * 64-char aligned blocks (including the sub-64 tail, so unique docs
  * reconstruct losslessly) are fingerprinted; for each distinct block
  * content exactly ONE occurrence survives — the minimum of a packed
  * (id, offset) long — and documents are rebuilt from their surviving
  * blocks in offset order.
  *
  * Shared by the batch query (q142) and the streaming ingest form
  * ([[graft.streaming.StreamPipeline.blockDedupOnIngest]]) so both
  * regimes dedup through ONE code path. Scale shape: the block stream
  * is map-side (explode + md5 — block TEXT never rides an exchange);
  * first-occurrence is one fp-keyed partial-agg min (no sort, no
  * window); the rebuild slices the original text map-side from the
  * kept offsets.
  */
object BlockDedup {

  private def nBlocks(textCol: Column): Column =
    floor((length(textCol) + lit(63)) / lit(64)).cast("int")

  /** (id, k, fp, pk) block-occurrence stream. */
  def blocks(d: DataFrame, idCol: Column, textCol: Column): DataFrame =
    d.select(idCol.as("id"), textCol.as("__text"))
      .select(col("id"), col("__text"),
        explode(when(nBlocks(col("__text")) >= 1, sequence(lit(0), nBlocks(col("__text")) - 1))
          .otherwise(array().cast("array<int>"))).as("k"))
      .select(col("id"), col("k"),
        md5(call_function("substring", col("__text"),
          (col("k") * 64 + 1).cast("int"), lit(64))).as("fp"))
      .withColumn("pk", col("id") * lit(1000000L) + col("k"))

  /** Per-doc surviving offsets under the first-occurrence rule: an
    * occurrence is kept iff it is its fingerprint's min pk. One
    * fp-keyed partial-agg shuffle + the same-key survivors join
    * (exchange reuse), then a doc-keyed aggregate. */
  def keptOffsets(blk: DataFrame): DataFrame = {
    val firsts = blk.groupBy(col("fp")).agg(min(col("pk")).as("mpk"))
    blk.join(firsts, Seq("fp")).filter(col("pk") === col("mpk"))
      .groupBy(col("id"))
      .agg(sort_array(collect_list(col("k"))).as("ks"), count(lit(1)).as("n_kept"))
  }

  /** Rebuild cleaned text from kept offsets, map-side against the
    * original text (left join: docs with no surviving block rebuild
    * to ""). Output: (id, text, clean, n_blocks, n_kept). */
  def rebuild(d: DataFrame, idCol: Column, textCol: Column, kept: DataFrame): DataFrame =
    d.select(idCol.as("id"), textCol.as("text"))
      .join(kept, Seq("id"), "left")
      .withColumn("clean", concat_ws("", expr(
        "transform(coalesce(ks, cast(array() as array<int>)), k -> substring(text, k*64+1, 64))")))
      .withColumn("n_blocks", floor((length(col("text")) + lit(63)) / lit(64)).cast("long"))
      .withColumn("n_kept", coalesce(col("n_kept"), lit(0L)))
      .drop("ks")
}
