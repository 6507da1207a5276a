package graft.tools

import org.apache.spark.sql.functions._

/** Stage-by-stage timing of editDistancePairsLsh internals at sf0.1 —
  * replicates the operator's pipeline with counters so the expensive
  * stage is identified by measurement, not guesswork. */
object FuzzyProfile {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession("fuzzy-profile", 32)
    import graft.functions.NearDup
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val docs = graft.core.Tables.documents(spark, dir)
    val norm = regexp_replace(lower(col("text")), "[^a-z0-9 ]", "")
    val numHashes = 64; val bands = 16; val rowsPerBand = numHashes / bands
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  -> $r")
      r
    }
    val base = docs.select(col("doc_id").as("id"), substring(norm, 1, 80).as("pfx"))
      .filter(col("pfx").isNotNull)
    val sets = base.groupBy(xxhash64(col("pfx")).as("fp"))
      .agg(min(col("id")).as("set_id"), sort_array(collect_list(col("id"))).as("ids"),
        first(col("pfx")).as("pfx"))
      .withColumn("toks",
        array_distinct(transform(sequence(lit(1), greatest(length(col("pfx")) - 2, lit(1))),
          i => xxhash64(call_function("substring", col("pfx"), i, lit(3))))))
      .persist()
    t("sets (canonical nodes)")(sets.count())
    val sigs = sets.select(col("set_id"), length(col("pfx")).as("len"),
      NearDup.minHashSignature(col("toks"), numHashes).as("sig"))
    val banded = sigs.select(
      col("set_id"), col("len"),
      posexplode(array((0 until bands).map { b =>
        xxhash64(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand))
      }: _*)))
      .select(col("set_id"), col("len"), col("pos").as("band"), col("col").as("band_key"))
      .persist()
    t("banded rows")(banded.count())
    val sizes = banded.groupBy(col("band"), col("band_key")).agg(count(lit(1)).as("n"))
      .persist()
    t("bucket count")(sizes.count())
    t("max bucket")(sizes.agg(max(col("n"))).collect()(0).getLong(0))
    t("sum n*(n-1)/2 over buckets")(
      sizes.agg(sum(col("n") * (col("n") - 1) / 2)).collect()(0).get(0))
    val kept = banded.join(sizes.filter(col("n") <= 4096).select("band", "band_key"), Seq("band", "band_key"))
    val candPairs = kept.select(col("band"), col("band_key"), col("set_id").as("set_a"), col("len").as("len_a"))
      .join(kept.select(col("band"), col("band_key"), col("set_id").as("set_b"), col("len").as("len_b")), Seq("band", "band_key"))
      .filter(col("set_a") < col("set_b") && abs(col("len_a") - col("len_b")) <= 10)
      .select(col("set_a"), col("set_b"))
    t("raw candidate pairs (pre-distinct)")(candPairs.count())
    val dist = candPairs.distinct().persist()
    t("distinct candidate pairs")(dist.count())
    spark.stop()
  }
}
