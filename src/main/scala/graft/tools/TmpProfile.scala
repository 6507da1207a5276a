package graft.tools

import org.apache.spark.sql.functions._

/** Scratch micro-profiler (contents change per investigation). */
object TmpProfile {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession("tmp-profile", 32)
    val dir = "/root/testdata/sf0.1"
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-36s ${(System.nanoTime() - t0) / 1e9}%8.2f s  -> $r")
      r
    }
    val docs = graft.core.Tables.documents(spark, dir)
    t("docs.count warm0")(docs.count())
    t("docs.count warm1")(docs.count())
    val norm = regexp_replace(lower(col("text")), "[^a-z0-9 ]", "")
    val base = docs.select(col("doc_id").as("id"), substring(norm, 1, 80).as("pfx"))
      .filter(col("pfx").isNotNull)
    t("base count")(base.count())
    val grouped = base.groupBy(xxhash64(col("pfx")).as("fp"))
      .agg(min(col("id")).as("set_id"), sort_array(collect_list(col("id"))).as("ids"),
        first(col("pfx")).as("pfx"))
    t("grouped count")(grouped.count())
    val withToks = grouped.withColumn("toks",
      array_distinct(transform(sequence(lit(1), greatest(length(col("pfx")) - 2, lit(1))),
        i => xxhash64(call_function("substring", col("pfx"), i, lit(3))))))
    t("withToks noop")(withToks.write.format("noop").mode("overwrite").save())
    t("withToks noop again")(withToks.write.format("noop").mode("overwrite").save())
    val sig = withToks.select(col("set_id"),
      graft.functions.NearDup.minHashSignature(col("toks"), 64).as("sig"))
    t("sig noop")(sig.write.format("noop").mode("overwrite").save())
    t("sig noop again")(sig.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
