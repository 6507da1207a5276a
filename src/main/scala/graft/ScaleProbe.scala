package graft

import org.apache.spark.sql.functions._

/** Scale probe: replicates sf0.1 facts 10x (~6M lineitem rows, ~100k
  * events... x10) in /tmp parquet and re-runs the headline aggregate/
  * join shapes, to observe how wall-clock scales with input size on
  * the same plans (evidence for the would-it-survive-100x question;
  * ids are offset per replica so key cardinality scales too).
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = core.GraftSession("scaleprobe", 32)
    val src = "/root/testdata/sf0.1"
    val dst = "/tmp/graft_sf1"
    val reps = 10

    def replicate(table: String, idCols: Seq[String], offset: Long): Unit = {
      val base = core.Tables(spark, src, table)
      val out = (0 until reps).map { r =>
        idCols.foldLeft(base)((d, c) => d.withColumn(c, col(c) + lit(r * offset)))
      }.reduce(_ unionByName _)
      out.write.mode("overwrite").parquet(s"$dst/$table.parquet")
    }
    val t0 = System.nanoTime()
    replicate("lineitem", Seq("l_orderkey"), 100000000L)
    replicate("orders", Seq("o_orderkey"), 100000000L) // o_custkey stays -> joins fan out per replica
    replicate("events", Seq("event_id"), 100000000L)
    // texts replicate VERBATIM (only ids offset): every doc gains 9
    // byte-identical copies — the adversarial dedup regime
    replicate("documents", Seq("doc_id"), 100000000L)
    // dims copy verbatim: they stay dim-sized at any fact scale
    Seq("customer", "nation", "supplier").foreach { t =>
      core.Tables(spark, src, t).write.mode("overwrite").parquet(s"$dst/$t.parquet")
    }
    println(f"[scale] replicate ${(System.nanoTime()-t0)/1e9}%.1f s")

    // noop sink: full materialization, no column pruning of the
    // aggregates under measurement (same action as Bench)
    def time(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[scale] $label time=${(System.nanoTime()-t)/1e9}%.2f s")
    }
    // q13 shape at 10x
    time("q13_tpch_q1@10x") { SparkEntry.queries("q13_tpch_q1")(spark, dst) }
    // q07 sliding windows at 10x events
    time("q07_window_15m@10x") { SparkEntry.queries("q07_window_15m")(spark, dst) }
    // q06 OHLCV rollup (min_by/max_by single-aggregate plan) at 10x
    time("q06_ohlcv_daily@10x") { SparkEntry.queries("q06_ohlcv_daily")(spark, dst) }
    // semi join fact x fact at 10x (both sides replicated)
    time("q42_semi_join@10x") { SparkEntry.queries("q42_semi_join")(spark, dst) }
    // ROLLUP grouping sets at 10x (subtotal grid in one pass)
    time("q49_rollup_sets@10x") { SparkEntry.queries("q49_rollup_sets")(spark, dst) }
    // CUBE grouping sets at 10x
    time("q53_cube@10x") { SparkEntry.queries("q53_cube")(spark, dst) }
    // gap-fill: 10x event VOLUME, same grid span (bin-collapse absorbs it)
    time("q55_gapfill@10x") { SparkEntry.queries("q55_gapfill_locf")(spark, dst) }
    // TF-IDF at 10x docs (term df x10, N x10 — weights shift, plan holds)
    time("q57_tfidf@10x") { SparkEntry.queries("q57_tfidf_topterms")(spark, dst) }
    // fuzzy edit-distance, both forms on the same 10x corpus: the
    // blocked-quadratic baseline grows ~100x in candidate pairs (the
    // honest quadratic), while the LSH-fronted form collapses the 10
    // identical replicas to one node each BEFORE candidate generation
    time("q56_fuzzy@10x") { SparkEntry.queries("q56_fuzzy_editdist")(spark, dst) }
    time("q59_fuzzy_lsh@10x") { SparkEntry.queries("q59_fuzzy_lsh")(spark, dst) }
    // contamination at 10x docs: benchmark gram set grows 10x but
    // stays broadcast-sized; candidate side is a linear scan
    time("q60_contamination@10x") { SparkEntry.queries("q60_contamination")(spark, dst) }
    // bigram LM at 10x: counts x10, same distinct-bigram keyspace
    time("q63_bigram_lm@10x") { SparkEntry.queries("q63_bigram_lm")(spark, dst) }
    // dedup clusters at 10x IDENTICAL replicas: canonical-set nodes
    // collapse the 10 copies, so the LSH/CC graph size stays ~flat
    // while doc count grows 10x — the property that matters at 100 TB
    time("q48_clusters@10x") { SparkEntry.queries("q48_dedup_clusters")(spark, dst) }
    // token shards at 10x: the two-level prefix sum's heavy stages
    // (bucket totals, per-bucket running sums) parallelize with the
    // bucket count (~10x buckets); only the tiny offset window grows
    time("q70_token_shards@10x") { SparkEntry.queries("q70_token_shards")(spark, dst) }
    // quality gate at 10x: per-row signals + one (doc,word) partial agg
    time("q69_quality_gate@10x") { SparkEntry.queries("q69_quality_gate")(spark, dst) }
    // winnowing fingerprints at 10x docs: per-doc O(n) expression;
    // identical replicas multiply n_docs per fp, not the fp keyspace
    time("q73_winnow@10x") { SparkEntry.queries("q73_winnow_fps")(spark, dst) }
    // CMS at 10x lineitem: cells stay 4x1024 regardless of volume —
    // the mergeable-summary property under measurement
    time("q79_countmin@10x") { SparkEntry.queries("q79_countmin_hh")(spark, dst) }
    // LM scoring at 10x docs: model keyspace flat (verbatim
    // replicas), doc-side join scales linearly
    time("q81_lm_score@10x") { SparkEntry.queries("q81_lm_score")(spark, dst) }
    // HAVING-gated large orders at 10x: the pre-aggregate below the
    // joins keeps the join input at |qualifying orders|
    time("q77_tpch_q18@10x") { SparkEntry.queries("q77_tpch_q18")(spark, dst) }
    // quantile sketch at 10x lineitem: bucket table stays ~10^3 rows
    // (same value domain), so the walk is volume-independent
    time("q85_sig_quantiles@10x") { SparkEntry.queries("q85_sig_quantiles")(spark, dst) }
    // heavy hitters at 10x: every key's count x10 crosses the gate
    // more often, but the gated shuffle still carries only heavy-
    // candidate rows; the CMS pass is map-side either way
    time("q86_heavy_hitters@10x") { SparkEntry.queries("q86_heavy_hitters")(spark, dst) }
    // binned range join at 10x events: equi-join on the bin key —
    // added volume is added probe rows, never added comparisons/row
    time("q90_range_join@10x") { SparkEntry.queries("q90_range_join_binned")(spark, dst) }
    // boilerplate grams at 10x verbatim replicas: per-gram df x10 but
    // the gram KEYSPACE is flat, so the df table and its broadcast
    // stay fixed while the position stream scales linearly
    time("q91_boilerplate@10x") { SparkEntry.queries("q91_boilerplate")(spark, dst) }
    // multi-correlated Q21 shape at 10x facts (both joins fact x fact)
    time("q87_tpch_q21@10x") { SparkEntry.queries("q87_tpch_q21")(spark, dst) }
    // KMV sketches at 10x: the sketch is 64 longs whatever the volume;
    // the build cost is the distinct-hash pass
    time("q92_kmv@10x") { SparkEntry.queries("q92_kmv_distinct")(spark, dst) }
    time("q98_kmv_by_key@10x") { SparkEntry.queries("q98_kmv_by_key")(spark, dst) }
    // per-key quantile sketches at 10x events
    time("q93_grouped_quantiles@10x") { SparkEntry.queries("q93_grouped_quantiles")(spark, dst) }
    // inverted index at 10x verbatim replicas: same term keyspace,
    // every posting list x10 — the honest index-build cost curve
    time("q96_inverted_index@10x") { SparkEntry.queries("q96_inverted_index")(spark, dst) }
    // join+agg: lineitem(6M) x orders(1.5M) with dims from sf0.1
    val l = spark.read.parquet(s"$dst/lineitem.parquet")
    val o = spark.read.parquet(s"$dst/orders.parquet")
    val c = core.Tables.customer(spark, src)
    val n = core.Tables.nation(spark, src)
    time("q14_join_agg@10x") {
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"), count(lit(1)))
    }
    spark.stop()
  }
}
