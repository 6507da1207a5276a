package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted, incrementally-maintained MinHash-LSH band index.
  *
  * [[NearDup.minHashProbePairs]] is the right *dataflow* for per-batch
  * dedup against a standing corpus (probe×corpus only, never
  * corpus×corpus), but it re-tokenizes, re-signs and re-bands the
  * WHOLE corpus on every call. At 100 TB that per-batch corpus pass is
  * the dominant cost — the index must be materialized once and
  * appended to, not recomputed. This object is that materialization:
  *
  * {{{
  *   <path>/toks   (id, sz, toks array<long>)   — verification table
  *   <path>/bands  (band, band_key, id, sz)     — LSH candidate table
  * }}}
  *
  * `build` writes both tables once; `append` adds the rows for a
  * batch of novel documents (an O(|batch|) map-side job); `probePairs`
  * bands ONLY the probe batch and joins it against the stored band
  * table. The probe side is a small batch, so Spark broadcasts it:
  * the corpus band scan stays map-side with zero corpus shuffle, and
  * the verify join attaches corpus token arrays only for the
  * candidate ids. Work per batch is O(|batch| + bucket collisions),
  * independent of corpus size except for the (parallel, map-side)
  * band-table scan — on a real cluster the bands table would
  * additionally be bucketed by `band_key` so the scan prunes to the
  * probed buckets; plain parquet keeps the demo portable.
  *
  * Geometry must match between build/append and probe; the default
  * (128 hashes / 32 bands, r=4) is the measured-exact geometry for
  * word-token sets on this corpus at threshold 0.8 (see
  * [[NearDup.minHashProbePairs]]).
  *
  * Replay note: an at-least-once writer (foreachBatch) that re-appends
  * a batch produces duplicate index rows. Candidates are `distinct`ed
  * before verification, so duplicates cost probe-side work but never
  * change `probePairs` output; `compact` rewrites the index
  * deduplicated when the slack matters.
  */
object BandIndex {

  val DefaultNumHashes = 128
  val DefaultBands = 32

  private def toksPath(path: String) = path + "/toks"
  private def bandsPath(path: String) = path + "/bands"

  /** True when `build`/`append` has written this index. Resolved via
    * the session's Hadoop filesystem (not java.io.File) so the check
    * agrees with where build/append/compact actually write — local,
    * HDFS, or s3a — matching [[graft.batch.AtomicSwap]]. */
  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(bandsPath(path))
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** (id, sz, toks): tokens pre-hashed to sorted distinct longs — the
    * same canonical form minHashProbePairs uses, so exact-jaccard
    * verification is a sorted-merge IntersectCount. */
  private def prep(df: DataFrame, idCol: String, tokensCol: org.apache.spark.sql.Column): DataFrame =
    df.select(col(idCol).as("id"),
      array_sort(transform(array_distinct(tokensCol), tk => xxhash64(tk))).as("toks"))
      .withColumn("sz", size(col("toks")))

  private def band(prepped: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    val rowsPerBand = numHashes / bands
    prepped
      .withColumn("sig", NearDup.minHashSignature(col("toks"), numHashes))
      .select(col("id"), col("sz"),
        posexplode(array((0 until bands).map { b =>
          xxhash64(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand))
        }: _*)))
      .select(col("pos").as("band"), col("col").as("band_key"), col("id"), col("sz"))
  }

  private def writeBatch(df: DataFrame, idCol: String, tokensCol: org.apache.spark.sql.Column,
                         path: String, numHashes: Int, bands: Int, mode: String): Unit = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    // one pass over the batch feeds both tables; the batch is small
    // (that is the point of an incremental index), so persist is cheap
    val p = prep(df, idCol, tokensCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    p.write.mode(mode).parquet(toksPath(path))
    band(p, numHashes, bands).write.mode(mode).parquet(bandsPath(path))
    p.unpersist(blocking = false)
  }

  /** Create (overwrite) the index from a corpus. */
  def build(df: DataFrame, idCol: String, tokensCol: org.apache.spark.sql.Column, path: String,
            numHashes: Int = DefaultNumHashes, bands: Int = DefaultBands): Unit =
    writeBatch(df, idCol, tokensCol, path, numHashes, bands, mode = "overwrite")

  /** Append a batch of (novel) documents to the index. */
  def append(df: DataFrame, idCol: String, tokensCol: org.apache.spark.sql.Column, path: String,
             numHashes: Int = DefaultNumHashes, bands: Int = DefaultBands): Unit =
    writeBatch(df, idCol, tokensCol, path, numHashes, bands, mode = "append")

  /** Write (append or create) index rows that were ALREADY prepped —
    * the [[MicroDedup]] fast path, where the micro-batch's token
    * arrays and band keys exist on the driver and re-deriving them
    * distributed would pay the tokenize + 128-hash signature pass a
    * third time. Two straight local-relation writes, no compute. */
  def writePrepped(spark: SparkSession, survivors: Array[MicroDedup.Survivor],
                   path: String, mode: String): Unit = {
    import spark.implicits._
    val toksRows = survivors.toSeq.map(s => (s.id, s.toks.toSeq, s.toks.length))
      .toDF("id", "toks", "sz") // prep()'s column order — appended files match
    toksRows.coalesce(1).write.mode(mode).parquet(toksPath(path))
    val bandRows = survivors.toSeq.flatMap { sv =>
      sv.bandKeys.zipWithIndex.map { case (k, b) => (b, k, sv.id, sv.toks.length) }
    }.toDF("band", "band_key", "id", "sz")
    bandRows.coalesce(1).write.mode(mode).parquet(bandsPath(path))
  }

  /** The duplicate PROBE IDS of a pre-banded probe batch
    * ([[MicroDedup]]'s driver-computed signatures) against the stored
    * index — the [[probePairs]] candidate join + size cut +
    * exact-jaccard verification collapsed to its streaming consumer's
    * question ("which probe docs have any dup?") so the whole probe
    * is ONE action: no intermediate persist, no second collect. The
    * probe side is a local relation (broadcast); the band and token
    * scans stay map-side (AQE broadcasts the candidate set into the
    * verify join at runtime). */
  def probeDupIdsPrepped(spark: SparkSession, path: String,
                         survivors: Array[MicroDedup.Survivor],
                         threshold: Double = 0.8): Array[Long] = {
    import spark.implicits._
    val probeBands = survivors.toSeq.flatMap { sv =>
      sv.bandKeys.zipWithIndex.map { case (k, b) => (b, k, sv.id, sv.toks.length) }
    }.toDF("band", "band_key", "probe_id", "sz_p")
    val probeToks = survivors.toSeq.map(s => (s.id, s.toks.toSeq)).toDF("probe_id", "toks_p")
    val corpusBands = spark.read.parquet(bandsPath(path))
      .select(col("band"), col("band_key"), col("id").as("corpus_id"), col("sz").as("sz_c"))
    val corpusToks = spark.read.parquet(toksPath(path))
      .select(col("id").as("corpus_id"), col("toks").as("toks_c"))
    corpusBands
      .join(broadcast(probeBands), Seq("band", "band_key"))
      .filter(col("sz_p") >= col("sz_c") * threshold && col("sz_c") >= col("sz_p") * threshold)
      .select(col("probe_id"), col("corpus_id"))
      .distinct()
      .join(broadcast(probeToks), Seq("probe_id"))
      .join(corpusToks, Seq("corpus_id"))
      .withColumn("__i", IntersectCount.column(col("toks_p"), col("toks_c")).cast("double"))
      .withColumn("jaccard", col("__i") / (size(col("toks_p")) + size(col("toks_c")) - col("__i")))
      .filter(col("jaccard") >= threshold)
      .select(col("probe_id")).distinct()
      .collect().map(_.getLong(0))
  }

  /** Rewrite the index with replay-duplicate rows collapsed (an
    * at-least-once writer appends the same id twice; see class doc). */
  def compact(spark: SparkSession, path: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val t = spark.read.parquet(toksPath(path)).dropDuplicates("id")
    t.write.mode("overwrite").parquet(toksPath(path) + ".compact")
    graft.batch.AtomicSwap.swapInto(conf, toksPath(path) + ".compact", toksPath(path))
    val b = spark.read.parquet(bandsPath(path)).dropDuplicates("id", "band")
    b.write.mode("overwrite").parquet(bandsPath(path) + ".compact")
    graft.batch.AtomicSwap.swapInto(conf, bandsPath(path) + ".compact", bandsPath(path))
  }

  /** GDPR-shaped delete: drop `ids` from both index tables (rewrite +
    * atomic swap, the compact mechanics). After removal the index
    * serves as if the docs were never indexed — their signatures stop
    * suppressing future near-dups and no probe can surface them as
    * corpus candidates — and the deleted ids' TOKEN ARRAYS physically
    * leave disk with the rewrite (the erasure requirement a tombstone
    * doesn't meet; the VersionedTable.deleteWhere contract, applied
    * to the derived index). Takes the delete set as a DataFrame so a
    * large erasure batch anti-joins instead of riding the driver. */
  def removeIds(spark: SparkSession, path: String, ids: DataFrame): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val del = ids.select(col(ids.columns.head).cast("long").as("id"))
    for (sub <- Seq(toksPath(path), bandsPath(path))) {
      val orig = spark.read.parquet(sub)
      // the USING anti-join moves `id` first — re-select the original
      // column order so the rewritten table is byte-compatible with a
      // fresh build
      orig.join(del, Seq("id"), "left_anti")
        .select(orig.columns.map(col).toSeq: _*)
        .write.mode("overwrite").parquet(sub + ".rm")
      graft.batch.AtomicSwap.swapInto(conf, sub + ".rm", sub)
    }
  }

  /** Seq convenience for small erasure sets. */
  def removeIds(spark: SparkSession, path: String, ids: Seq[Long]): Unit = {
    import spark.implicits._
    removeIds(spark, path, ids.toDF("id"))
  }

  /** Near-dup pairs between `probe` and the INDEXED corpus — same
    * output contract as [[NearDup.minHashProbePairs]] (probe_id,
    * corpus_id, jaccard; persisted + materialized, caller unpersists)
    * but the corpus side comes entirely from the stored tables. */
  def probePairs(spark: SparkSession, path: String, probe: DataFrame, idCol: String,
                 tokensCol: org.apache.spark.sql.Column, threshold: Double = 0.8,
                 numHashes: Int = DefaultNumHashes, bands: Int = DefaultBands): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val p = prep(probe, idCol, tokensCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val probeBands = band(p, numHashes, bands)
      .select(col("band"), col("band_key"), col("id").as("probe_id"), col("sz").as("sz_p"))
    val corpusBands = spark.read.parquet(bandsPath(path))
      .select(col("band"), col("band_key"), col("id").as("corpus_id"), col("sz").as("sz_c"))
    // probe side broadcast: the corpus band scan joins map-side, and
    // the PPJoin size cut kills mismatched pairs before the distinct
    val candidates = corpusBands
      .join(broadcast(probeBands), Seq("band", "band_key"))
      .filter(col("sz_p") >= col("sz_c") * threshold && col("sz_c") >= col("sz_p") * threshold)
      .select(col("probe_id"), col("corpus_id"))
      .distinct()
    val corpusToks = spark.read.parquet(toksPath(path))
      .select(col("id").as("corpus_id"), col("toks").as("toks_c"))
    val out = candidates
      .join(p.select(col("id").as("probe_id"), col("toks").as("toks_p")), Seq("probe_id"))
      .join(corpusToks, Seq("corpus_id"))
      .withColumn("__i", IntersectCount.column(col("toks_p"), col("toks_c")).cast("double"))
      .withColumn("jaccard", col("__i") / (size(col("toks_p")) + size(col("toks_c")) - col("__i")))
      .filter(col("jaccard") >= threshold)
      .select(col("probe_id"), col("corpus_id"), col("jaccard"))
      .dropDuplicates("probe_id", "corpus_id") // replayed appends duplicate index rows
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    p.unpersist(blocking = false)
    out
  }
}
