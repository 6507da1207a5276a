package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
object TmpProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[prof] $label ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.1")
    val norm = regexp_replace(lower(col("text")), "[^a-z0-9 ]", "")
    // warm JIT
    graft.functions.NearDup.editDistancePairsLsh(docs, "doc_id", norm, maxDist = 10).unpersist()
    spark.catalog.clearCache()
    val base = docs.select(col("doc_id").as("id"), substring(norm, 1, 80).as("pfx")).filter(col("pfx").isNotNull)
    val sets = base.groupBy(xxhash64(col("pfx")).as("fp"))
      .agg(min(col("id")).as("set_id"), sort_array(collect_list(col("id"))).as("ids"), first(col("pfx")).as("pfx"))
      .withColumn("toks", array_distinct(transform(sequence(lit(1), greatest(length(col("pfx")) - 2, lit(1))),
        i => xxhash64(call_function("substring", col("pfx"), i, lit(3))))))
      .persist(StorageLevel.MEMORY_AND_DISK)
    t("sets count") { sets.count() }
    val sigs = sets.select(col("set_id"), length(col("pfx")).as("len"),
      graft.functions.NearDup.minHashSignature(col("toks"), 32).as("sig"))
    t("sigs noop") { sigs.write.format("noop").mode("overwrite").save() }
    val banded = sigs.select(col("set_id"), col("len"),
      posexplode(array((0 until 16).map { b => xxhash64(slice(col("sig"), b * 2 + 1, 2)) }: _*)))
      .select(col("set_id"), col("len"), col("pos").as("band"), col("col").as("band_key"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    t("banded count") { banded.count() }
    val kept = banded.join(
      banded.groupBy(col("band"), col("band_key")).agg(count(lit(1)).as("__bn"))
        .filter(col("__bn") <= 4096).select(col("band"), col("band_key")), Seq("band", "band_key"))
    val candPairs = kept.select(col("band"), col("band_key"), col("set_id").as("set_a"), col("len").as("len_a"))
      .join(kept.select(col("band"), col("band_key"), col("set_id").as("set_b"), col("len").as("len_b")), Seq("band", "band_key"))
      .filter(col("set_a") < col("set_b") && abs(col("len_a") - col("len_b")) <= 10)
      .select(col("set_a"), col("set_b")).distinct()
    t("candPairs count") { println("  pairs=" + candPairs.count()) }
    spark.stop()
  }
}
