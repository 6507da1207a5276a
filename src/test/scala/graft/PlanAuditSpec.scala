package graft

/** Pins the plan properties the engine's 100 TB story depends on:
  * filters reach the parquet scan, projections prune the read schema,
  * aggregates are partial+final, small dimensions broadcast, and the
  * bounded-heap top-k stays a partial object-hash aggregate. A
  * regression in any of these silently multiplies scan or shuffle
  * volume long before it breaks correctness. */
class PlanAuditSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf("sf0.001")).queryExecution.executedPlan.toString

  test("q02 filter+project: predicate pushdown reaches the scan") {
    val p = plan("q02_filter_project")
    assert("PushedFilters: \\[[^\\]]".r.findFirstIn(p).isDefined, s"no pushed filters:\n$p")
  }

  test("q03 projection: read schema is pruned to used columns") {
    val p = plan("q03_derived_arith")
    val read = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(p).map(_.group(1)).getOrElse("")
    // lineitem has 11 columns; the derived-arithmetic query needs 5 —
    // unused ones (flags, dates) must not reach the scan
    assert(read.nonEmpty && read.split(",").length <= 5, s"unpruned scan: $read")
    assert(!read.contains("l_returnflag") && !read.contains("l_shipdate"), s"unpruned scan: $read")
  }

  test("q13 TPC-H Q1: partial + final hash aggregation around one exchange") {
    val p = plan("q13_tpch_q1")
    assert(p.contains("HashAggregate"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, s"no partial agg:\n$p")
  }

  test("q14/q40 join queries broadcast the small build side") {
    assert(plan("q14_join_agg").contains("BroadcastHashJoin"))
    assert(plan("q40_tpch_q3").contains("Broadcast"), "Q3 should broadcast a filtered side at sf0.001")
  }

  test("q28 top-k: partial bounded-heap aggregate, no Window") {
    val p = plan("q28_cosine_topk")
    assert(p.toLowerCase.contains("partial_bounded_top_k"), s"no partial heap:\n$p")
    assert(!p.contains("Window "), s"window crept back:\n$p")
  }

  test("q04 dedup: partial WindowGroupLimit ships <=1 row per key per map task") {
    val p = plan("q04_dedup_first")
    assert(p.contains("WindowGroupLimit") && p.contains("Partial"), s"no partial group limit:\n$p")
  }

  test("q49 rollup: Expand sits ABOVE the finest-group pre-aggregate") {
    // two-phase grouping sets: the x3 row duplication must touch the
    // tiny pre-aggregate, not the raw scan — i.e. at least one
    // HashAggregate (the pre-agg) appears BELOW the Expand
    val p = plan("q49_rollup_sets")
    val expandIdx = p.indexOf("Expand")
    assert(expandIdx >= 0, s"no Expand:\n$p")
    assert(p.indexOf("HashAggregate", expandIdx) >= 0,
      s"no pre-aggregate under Expand (raw rows are being tripled):\n$p")
  }

  test("q14 join+agg: lineitem pre-aggregates below the orders join") {
    // manual aggregate pushdown: a HashAggregate keyed on l_orderkey
    // must run before the first join, so the fact-fact shuffle moves
    // |orders| rows, not |lineitem|
    val p = plan("q14_join_agg")
    val firstJoin = "Join|ShuffledHashJoin|SortMergeJoin|BroadcastHashJoin".r
      .findFirstMatchIn(p).map(_.start).getOrElse(-1)
    val aggBelow = p.indexOf("HashAggregate", math.max(firstJoin, 0))
    assert(firstJoin >= 0 && aggBelow >= 0 && p.substring(aggBelow).contains("l_orderkey"),
      s"no per-order pre-aggregate under the join:\n$p")
  }

  test("q60 contamination: benchmark gram set is broadcast") {
    val p = plan("q60_contamination")
    assert(p.contains("BroadcastHashJoin"), s"benchmark set not broadcast:\n$p")
  }

  test("q70 shard packing: doc-side window is bucket-partitioned, offsets broadcast") {
    // the two-level prefix sum only scales if the window over the DOC
    // table is partitioned by range bucket (parallel per bucket) and
    // the per-bucket offsets come back via broadcast — a global-order
    // window over the docs would serialize the whole table through
    // one task at 100 TB
    val p = plan("q70_token_shards")
    assert(p.contains("windowspecdefinition(bkt#"), s"doc window not bucket-partitioned:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"bucket offsets not broadcast:\n$p")
  }

  test("q71 k-means step: centroids broadcast, argmin is a partial agg, no window") {
    val p = plan("q71_kmeans_step")
    assert(p.contains("Broadcast"), s"centroid table not broadcast:\n$p")
    assert(p.contains("min_by"), s"argmin not a min_by aggregate:\n$p")
    assert(!p.contains("Window "), s"argmin fell back to a window:\n$p")
  }

  test("q68 decontamination: benchmark gram set is broadcast") {
    val p = plan("q68_decontaminated")
    assert(p.contains("BroadcastHashJoin"), s"benchmark set not broadcast:\n$p")
  }

  test("LSH candidate generation: single groupBy, no banded self-join") {
    // bucketPairs replaces the banded x banded self-join with one
    // collect_list groupBy + map-side pair expansion: the candidate
    // plan must aggregate (ObjectHashAggregate carries collect_list)
    // and must contain NO join at all before the verify stage
    import org.apache.spark.sql.functions._
    val banded = spark.range(100).select(
      (col("id") % 10).cast("int").as("band"), (col("id") % 7).as("band_key"),
      col("id").as("set_id"), (col("id") % 13).as("len"))
    val p = graft.functions.NearDup.bucketPairsForTest(banded, "len", 64, "abs(a.len - b.len) <= 5")
      .queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate"), s"no collect_list aggregate:\n$p")
    assert(!p.toLowerCase.contains("join"), s"self-join crept back into candidate generation:\n$p")
  }

  test("q78 disjunctive join: predicate disjunction is CNF-split and pushed to BOTH scans") {
    val p = plan("q78_tpch_q19")
    // the quantity disjunction must reach the lineitem scan and the
    // brand/size disjunction the part scan — without CNF extraction
    // the whole OR stays a post-join residual and both scans read
    // every row
    assert("PushedFilters: \\[[^\\]]*l_quantity".r.findFirstIn(p).isDefined
      || p.contains("GreaterThanOrEqual(l_quantity"), s"quantity disjunction not pushed:\n$p")
    assert(p.contains("EqualTo(p_brand"), s"brand disjunction not pushed:\n$p")
  }

  test("AQE splits the skewed join partition; results equal the unsplit plan") {
    // a 90%-hot-key fact join is the shape that strands one reducer
    // with most of the data at 1000-executor scale; AQE's
    // OptimizeSkewedJoin must split the hot partition (plan shows
    // skew=true) and the split must be invisible to results.
    // Thresholds are lowered to make a test-sized hot partition
    // (~3 MB) cross the skew bar; broadcast is disabled so the join
    // actually sort-merges (the skewed regime — a broadcastable side
    // would dodge the problem, which is the other valid fix).
    import org.apache.spark.sql.functions._
    val c = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled"
    ).map(k => k -> c.getOption(k))
    try {
      c.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      c.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      c.set("spark.sql.adaptive.skewJoin.enabled", "true")
      c.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      c.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "65536")
      c.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32768")
      c.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // 200k facts, 90% on key 0; dim side = one row per key with a
      // payload, too many bytes to broadcast at threshold -1
      val fact = spark.range(0, 200000).select(
        when(col("id") % 10 === 0, col("id") % 100).otherwise(lit(0L)).as("k"),
        col("id").as("va"))
      val dim = spark.range(0, 100).select(col("id").as("k"), (col("id") * 7).as("vb"))
      // GLOBAL aggregate on purpose: its partial phase accepts any
      // partitioning, so OptimizeSkewedJoin may split freely — a
      // groupBy on the join key would pin the join's distribution and
      // AQE (correctly) declines to split rather than add a shuffle
      def joined = fact.join(dim, "k")
        .agg(count(lit(1)).as("n"), sum(col("vb") + col("va")).as("s"))
      val j1 = joined // one instance: collect() finalizes ITS adaptive plan
      val rows = j1.collect()
      val plan = j1.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"AQE did not split the skewed partition:\n$plan")
      // equality vs the unsplit plan
      c.set("spark.sql.adaptive.skewJoin.enabled", "false")
      val plain = joined.collect()
      assert(rows.map(_.toString).sorted.sameElements(plain.map(_.toString).sorted),
        "skew split changed results")
      assert(rows.head.getAs[Long]("n") == 200000L, "every fact row joins exactly once")
    } finally saved.foreach { case (k, v) => v.fold(c.unset(k))(c.set(k, _)) }
  }

  test("runtime bloom filter prunes the big side of a selective fact-fact join") {
    // Spark's InjectRuntimeFilter: a selective creation side (filtered
    // orders) plants a bloom might_contain on the application side's
    // lineitem scan — rows that can't join are dropped AT THE SCAN,
    // before the shuffle. This is the built-in complement to the
    // explicit Sketches.bloomProbe operator: at 100 TB the shuffle
    // volume tracks the filter's selectivity, not the table size.
    import org.apache.spark.sql.functions._
    val c = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold"
    ).map(k => k -> c.getOption(k))
    try {
      c.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      c.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      c.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      c.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val l = graft.core.Tables.lineitem(spark, sf("sf0.01"))
      val o = graft.core.Tables.orders(spark, sf("sf0.01"))
        .filter(col("o_totalprice") > 400000.0)
      val j = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).count()
      val opt = j.queryExecution.optimizedPlan.toString
      assert(opt.contains("might_contain"), s"no runtime bloom filter injected:\n$opt")
    } finally saved.foreach { case (k, v) =>
      v.fold(c.unset(k))(c.set(k, _))
    }
  }

  test("q85 quantile sketch: bucket build is partial+final around one exchange") {
    val p = plan("q85_sig_quantiles")
    assert("HashAggregate".r.findAllIn(p).size >= 2, s"no partial bucket agg:\n$p")
    // the quantile walk must run on the sketch, never re-touch lineitem:
    // exactly two scans (sketch side + exact side), not four
    assert("FileScan parquet".r.findAllIn(p).size <= 2 || "Scan parquet".r.findAllIn(p).size <= 2,
      s"quantile walk re-scans the fact table:\n$p")
  }

  test("q86 heavy hitters: CMS gate is a broadcast, exact count is gated") {
    val p = plan("q86_heavy_hitters")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"cell lookup row should broadcast:\n$p")
    // the gating filter (est >= minCount) must sit BELOW the final
    // per-key aggregate — light keys die before the shuffle
    val filterIdx = p.indexOf("Filter")
    val aggIdx = p.indexOf("HashAggregate")
    assert(filterIdx >= 0 && aggIdx >= 0 && p.lastIndexOf("Filter") > aggIdx,
      s"no map-side gate below the aggregate:\n$p")
  }

  test("q91 boilerplate: threshold-pruned gram table broadcasts back onto positions") {
    val p = plan("q91_boilerplate")
    assert(p.contains("BroadcastHashJoin"), s"df table should broadcast:\n$p")
  }

  test("q92 KMV: k-min plans as TakeOrdered, not a global sort") {
    val p = plan("q92_kmv_distinct")
    assert(p.contains("TakeOrderedAndProject"), s"no TakeOrdered:\n$p")
    assert(!p.contains("Sort ["), s"global sort crept in:\n$p")
  }

  test("q111 TPC-H Q6: every predicate reaches the scan, zero exchanges") {
    val p = plan("q111_tpch_q6")
    // the scan line truncates long filter lists without a closing
    // bracket — scope the check to the line, not a [...] capture
    val pushed = p.split("\n").find(_.contains("PushedFilters: [")).getOrElse("")
    assert(pushed.contains("l_shipdate") && pushed.contains("l_discount") && pushed.contains("l_quantity"),
      s"predicates missing from the scan: [$pushed]")
    // global agg of a filtered scan: partial agg collapses map-side;
    // the only exchange is the 1-row final-agg gather
    assert("Exchange".r.findAllIn(p).size <= 1, s"extra shuffle in a pure scan+agg:\n$p")
  }

  test("q108 rolling bands: chunked frame — no bare-key window, block-composite partitioning") {
    // Round 8 replaced the single per-key window (one exchange, but
    // one TASK per event type — the 100x parallelism ceiling) with
    // ChunkedFrame's two-level evaluation: the extra exchanges are
    // the bought-and-paid-for price of volume-wide parallelism. What
    // this audit pins instead: (a) the frame window partitions by
    // (key, block), never by the bare key; (b) per-row work stays
    // bounded — full-data exchanges are the local-rank shuffle and
    // the block shuffle, the rest are the chunk-count table and the
    // broadcast of offsets.
    val p = plan("q108_rolling_bands")
    assert(p.contains("Window"), p)
    val frameSpecs = p.linesIterator
      .filter(l => l.contains("windowspecdefinition") && l.contains("RowFrame, -19")).toSeq
    assert(frameSpecs.nonEmpty, s"no bounded row frame in:\n$p")
    frameSpecs.foreach { l =>
      assert(l.contains("__blk"),
        s"bounded frame must partition by (key, block), not the bare key:\n$l")
    }
    assert(p.contains("BroadcastHashJoin"),
      s"the chunk-offset table should broadcast:\n$p")
    // exchange budget: local-rank shuffle, block shuffle, chunk-count
    // aggregate, offset window, broadcast — not a per-row blowup
    assert("Exchange".r.findAllIn(p).size <= 6, s"exchange blowup:\n$p")
  }

  test("q115 BM25: ranked list plans as TakeOrdered, query terms broadcast") {
    val p = plan("q115_bm25")
    assert(p.contains("TakeOrderedAndProject"), s"top-20 must not be a global sort:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"the 2-term query set should broadcast:\n$p")
  }

  test("q126 VWAP: JSON extraction stays map-side, one partial+final agg exchange") {
    val p = plan("q126_vwap")
    // get_json_object is a per-row scan-side expression; the only
    // full-data movement is the (type, day) aggregate exchange, and
    // partial aggregation combines before it
    assert("HashAggregate".r.findAllIn(p).size >= 2, s"no partial agg:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 1, s"extra shuffles:\n$p")
    val read = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(p).map(_.group(1)).getOrElse("")
    assert(!read.contains("event_id") && !read.contains("user_id"),
      s"scan reads columns the query never uses: $read")
  }

  test("q127 distribution functions: no bare-key window over the full data") {
    // the whole point of the query: ntile/percent_rank/cume_dist
    // without sorting a key's entire history in one task. Full-data
    // windows must carry the (key, chunk) composite partition; the
    // only bare-key window allowed is the offset prefix over the
    // chunk-count-sized aggregate (it sits ABOVE a HashAggregate).
    val p = plan("q127_dist_funcs_chunked")
    val lines = p.linesIterator.toSeq
    val rankSpecs = lines.filter(l =>
      l.contains("windowspecdefinition") && l.contains("row_number"))
    assert(rankSpecs.nonEmpty, s"no rank window:\n$p")
    rankSpecs.foreach { l =>
      assert(l.contains("FLOOR") || l.contains("__chunk"),
        s"rank window must partition by (key, value-bucket), not the bare key:\n$l")
    }
    assert(p.contains("BroadcastHashJoin"), s"offsets/totals should broadcast:\n$p")
  }

  test("q129 RSI: chunked frame — no bare-key window, diff+frame share the block sort") {
    // same contract as q108: the lag pass and the gain/loss frame
    // evaluate inside (key, block) partitions — never the bare key —
    // and both ride ONE block shuffle+sort (same window spec)
    val p = plan("q129_rsi")
    val frameSpecs = p.linesIterator
      .filter(l => l.contains("windowspecdefinition") && l.contains("RowFrame, -13")).toSeq
    assert(frameSpecs.nonEmpty, s"no bounded row frame in:\n$p")
    frameSpecs.foreach { l =>
      assert(l.contains("__blk"),
        s"bounded frame must partition by (key, block), not the bare key:\n$l")
    }
    assert(p.contains("BroadcastHashJoin"), s"the chunk-offset table should broadcast:\n$p")
    assert("Exchange".r.findAllIn(p).size <= 6, s"exchange blowup:\n$p")
  }

  test("q131 Q2 argmin: supply relation pre-aggregates below broadcast dim joins") {
    val p = plan("q131_tpch_q2")
    // the (part, supp) min-cost aggregate must sit UNDER the dim
    // joins (one fact shuffle), and every dim + the per-part min
    // join-back must broadcast — no shuffled dim joins
    assert(p.contains("BroadcastHashJoin"), s"dims not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"a dim join shuffled:\n$p")
    // one supply-agg exchange + one per-part window exchange — an
    // aggregate+join-back argmin would re-execute the supply lineage
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2,
      s"supply lineage re-executed (two-consumer trap):\n$p")
  }

  test("q134 Q16: blacklist anti-join is broadcast, distinct pairs shuffle only two columns") {
    val p = plan("q134_tpch_q16")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"blacklist should anti-join via broadcast:\n$p")
    val read = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(p).map(_.group(1)).getOrElse("")
    assert(read.split(",").length <= 2, s"pair build reads more than two fact columns: $read")
  }

  test("q135 Q20: one filtered fact scan feeds both threshold aggregates") {
    val p = plan("q135_tpch_q20")
    // both the (part, supp) and (part) aggregates must read a
    // shipdate-filtered scan with the predicate pushed down
    assert("PushedFilters: \\[[^\\]]*l_shipdate".r.findFirstIn(p).isDefined,
      s"window predicate not pushed to the scan:\n$p")
    assert(p.contains("LeftSemi"), s"supplier gate should be a semi join:\n$p")
  }

  test("q137/q138 growing-k: no cartesian product anywhere; bucket joins are hash joins") {
    // the clustering itself runs eagerly (kernel map pass, spec-pinned
    // in FunctionsSpec); what the FINAL plan must never show is a
    // cartesian pair scan — the within-cluster join and the IVF bucket
    // scan both key on the learned bucket id
    for (name <- Seq("q137_semdedup_growk", "q138_ivf_growk")) {
      val p = plan(name)
      assert(!p.contains("CartesianProduct"), s"$name went cartesian:\n$p")
      assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
        s"$name: bucket join is not a keyed join:\n$p")
    }
  }

  test("q110 corr matrix: the pair join runs on the volume-independent bin aggregate") {
    val p = plan("q110_corr_matrix")
    // the (type, minute) pre-aggregate must sit BELOW the self-join —
    // joining raw events would square the fact volume
    val joinIdx = p.indexOf("Join")
    assert(joinIdx >= 0, s"no join:\n$p")
    assert(p.indexOf("HashAggregate", joinIdx) >= 0,
      s"no pre-aggregate under the pair join (raw x raw self-join):\n$p")
  }

  test("q154 drawdown episodes: every window partitions on (key, chunk), never the bare key") {
    // runningMax + two globalRanks: all per-row windows must carry
    // the __chunk/__p_chunk/__o_chunk composite so the five-key feed
    // never collapses to five tasks
    val p = plan("q154_drawdown_episodes")
    val rowSpecs = p.linesIterator
      .filter(l => l.contains("windowspecdefinition(event_type")).toSeq
    assert(rowSpecs.nonEmpty, s"no windows found:\n$p")
    rowSpecs.foreach { l =>
      assert(l.contains("chunk") || l.contains("__p_") || l.contains("__o_"),
        s"bare event_type window crept in:\n$l")
    }
    assert(p.contains("BroadcastHashJoin"), s"offset tables should broadcast:\n$p")
  }

  test("q143 temperature mixture: the keep filter never shuffles the corpus") {
    // the histogram arm aggregates; the FILTER arm must be scan ->
    // broadcast-join -> filter with no Exchange between scan and
    // filter — i.e. every Exchange in the plan feeds the tiny
    // rate table, none sits above the second corpus scan
    val p = plan("q143_temp_mixture")
    assert(p.contains("BroadcastHashJoin"), s"rate table not broadcast:\n$p")
    // the filtered scan side must not be exchanged: a shuffle of the
    // corpus would show as Exchange hashpartitioning(doc_id/source
    // ...) directly above a FileScan on the probe side of the BHJ
    val bhj = p.indexOf("BroadcastHashJoin")
    val streamSide = p.substring(bhj)
    assert(!streamSide.split("BroadcastExchange")(0).contains("Exchange hashpartitioning"),
      s"corpus shuffled before the keep filter:\n$p")
  }

  test("q151 semantic decontam: eval side broadcasts, corpus is never exchanged before scoring") {
    val p = plan("q151_semantic_decontam")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"eval set not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"scorer went cartesian (corpus x eval shuffle):\n$p")
  }

  test("q150 source KL: totals derive from the (source, word) aggregate — exactly one corpus scan pays the explode") {
    val p = plan("q150_source_kl")
    // the persisted (source, word) aggregate must back the derived
    // totals (>=2 InMemoryTableScans: the sw probe side + at least
    // one totals arm). FileScan counts are not assertable here: the
    // plan STRING prints each InMemoryRelation's cached plan inline,
    // so the one real scan appears once per cache consumer.
    val mem = "InMemoryTableScan".r.findAllIn(p).size
    assert(mem >= 2, s"derived totals re-scan the corpus instead of the cached aggregate:\n$p")
  }

  test("q142 block dedup: first-occurrence is a partial min aggregate, not a window sort") {
    val p = plan("q142_block_dedup")
    assert(!p.contains("Window "), s"per-fp window crept in:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2, s"no partial agg on the fp shuffle:\n$p")
  }

  test("q157 Parkinson: one partial+final aggregate pass, no window anywhere") {
    val p = plan("q157_parkinson_vol")
    assert(!p.contains("Window "), s"window crept into a pure-aggregate estimator:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2, s"no partial agg:\n$p")
  }

  test("q158 Amihud: the tick-grain window partitions on (instrument, day), never the bare instrument") {
    val p = plan("q158_amihud_illiq")
    val specs = p.linesIterator.filter(_.contains("windowspecdefinition(event_type")).toSeq
    assert(specs.nonEmpty, s"no window found:\n$p")
    specs.foreach { l =>
      assert(l.contains("day"), s"bare event_type window (all-history per-key sort):\n$l")
    }
  }

  test("q165/q167/q169: every tick-grain window partitions on (instrument, day)") {
    for (name <- Seq("q165_garman_klass", "q167_order_flow", "q169_roll_spread")) {
      val p = plan(name)
      val specs = p.linesIterator.filter(_.contains("windowspecdefinition(event_type")).toSeq
      assert(specs.nonEmpty, s"$name: no window found:\n$p")
      specs.foreach { l =>
        assert(l.contains("day"), s"$name: bare event_type window:\n$l")
      }
    }
  }

  test("q161 adaptive gate: rank windows carry the chunk composite; cutoff table broadcasts") {
    val p = plan("q161_adaptive_quality")
    val specs = p.linesIterator.filter(_.contains("windowspecdefinition(source")).toSeq
    assert(specs.nonEmpty, s"no rank window found:\n$p")
    specs.foreach { l =>
      assert(l.contains("chunk") || l.contains("__p_") || l.contains("__o_"),
        s"bare source window crept in (10 fixed sources = 10 tasks at 100x):\n$l")
    }
    assert(p.contains("BroadcastHashJoin"), s"cutoff/count tables should broadcast:\n$p")
  }

  test("q162 BQ serving: integer-code shortlist is a partial bounded heap; vectors join after") {
    val p = plan("q162_bq_hamming_topk")
    assert(p.toLowerCase.contains("partial_bounded_top_k"), s"no partial heap on Hamming shortlist:\n$p")
    assert(!p.contains("CartesianProduct"), s"candidate scan went cartesian:\n$p")
    // the packed-code candidate pass must broadcast the query codes
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"query codes not broadcast:\n$p")
  }

  test("q172 panel: one shared window pass + one aggregation — not six of each") {
    val p = plan("q172_daily_panel")
    // rn/lag/lag share one frame, the inherited sign adds the running
    // frame — Spark plans both inside at most TWO Window operators
    // over ONE sort; six standalone member queries would each pay
    // their own
    val wins = "Window ".r.findAllIn(p).size
    assert(wins >= 1 && wins <= 2, s"expected 1-2 window ops, got $wins:\n$p")
    val sorts = "Sort ".r.findAllIn(p).size
    assert(sorts <= 2, s"window sort not shared:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2, s"no partial agg:\n$p")
    p.linesIterator.filter(_.contains("windowspecdefinition(event_type")).foreach { l =>
      assert(l.contains("day"), s"bare event_type window:\n$l")
    }
  }

  test("q163 novelty: two partial-agg shuffles, no window, no cartesian") {
    val p = plan("q163_novelty")
    assert(!p.contains("Window "), s"window crept in:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian crept in:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 4, s"gram/doc aggregates lost partials:\n$p")
  }

  test("q175/q176/q179 day-grid statistics: tick-grain windows carry the day composite") {
    // the only volume-sized sort is the (instrument, day) close
    // window; day-grain windows afterwards are bare-key BY DESIGN
    // (the grid is volume-independent) — what must never appear is a
    // tick-grain window partitioned by event_type alone
    for (q <- Seq("q175_higher_moments", "q176_return_acf", "q179_momentum")) {
      val p = plan(q)
      val tickWins = p.linesIterator.filter(l =>
        l.contains("windowspecdefinition(event_type#") && l.contains("ts#")).toSeq
      tickWins.foreach { l =>
        assert(l.contains("day#"),
          s"$q: tick-grain window lost the day composite:\n$l")
      }
    }
  }

  test("q177 Kyle / q178 VPIN: one tick-grain window pass, partial+final day aggregation") {
    val p177 = plan("q177_kyle_lambda")
    assert(p177.linesIterator.count(_.contains("Window")) <= 4, s"window blowup:\n$p177")
    assert(!p177.contains("CartesianProduct"))
    // VPIN's volume clock must run CHUNKED (day blocks), never a bare
    // per-instrument running sum over the whole month
    val p178 = plan("q178_vpin")
    val runSums = p178.linesIterator.filter(l =>
      l.contains("windowspecdefinition(event_type#") &&
        l.contains("unboundedpreceding")).toSeq
    runSums.foreach { l =>
      assert(l.contains("__chunk") || l.contains("day#") || l.contains("__p_"),
        s"q178: bare per-instrument running sum:\n$l")
    }
  }

  test("q181 profile: two column-disjoint scans feed all columns; q189 ranks avoid bare global windows") {
    // round-16: the stack is split into a LONG arm (int/ts columns)
    // and a STRING arm (double/flag columns) — exactly TWO scans,
    // each column-pruned to its own arm so every lineitem column is
    // still read exactly once (the original one-scan pin's point,
    // preserved under the narrower-exchange split; a scan-per-column
    // regression would show 11 scans or overlapping ReadSchemas)
    val p = plan("q181_table_profile")
    // the scan's output column list, not ReadSchema — the latter is
    // subject to SparkStringUtils line truncation
    val reads = """FileScan parquet \[([^\]]*)\]""".r.findAllMatchIn(p)
      .map(_.group(1)).toSeq
    assert(reads.size == 2,
      s"profile must stack columns from two column-disjoint scans:\n$p")
    // trim each token (r16 advice): the scan's column list is
    // comma-SPACE separated, so without trim the same column reads as
    // "name" in one set and " name" in the other and a real overlap
    // can false-pass the disjointness assert
    val colsPerScan = reads.map(_.split(",").map(_.trim.takeWhile(_ != '#')).toSet)
    assert(colsPerScan.head.intersect(colsPerScan.last).isEmpty,
      s"the two profile arms must not re-read a column: $colsPerScan")
    val p189 = plan("q189_rfm")
    val bareGlobal = p189.linesIterator.filter(l =>
      l.contains("windowspecdefinition()") ||
        (l.contains("windowspecdefinition(") && l.contains("__k#") && !l.contains("__chunk"))).toSeq
    assert(bareGlobal.isEmpty,
      s"q189: rank must ride globalRank's (key, chunk) composite:\n${bareGlobal.mkString("\n")}")
  }

  test("q180 MMR / q187 ABTT: queries broadcast, no cartesian beyond the labeled score join") {
    for (q <- Seq("q180_mmr_topk", "q187_abtt_topk")) {
      val p = plan(q)
      assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
        s"$q: query side must broadcast:\n$p")
      assert(!p.contains("CartesianProduct"), s"$q: unbroadcast cartesian:\n$p")
      assert(p.contains("ObjectHashAggregate") || p.contains("BoundedTopK") ||
        p.contains("bounded_top_k"), s"$q: shortlist must be the partial-heap aggregate:\n$p")
    }
  }

  test("fused chunked session window: chunk-table joins broadcast, no single-partition window") {
    import org.apache.spark.sql.functions.col
    val p = graft.operators.Transitions.flags(
      graft.core.Tables.events(spark, sf("sf0.001")), chunked = true)
      .queryExecution.executedPlan.toString
    // the per-row close joins the chunk-count-sized boundary table by
    // broadcast — a sort-merge join here would add a full-data shuffle
    assert(p.contains("BroadcastHashJoin"), s"chunk table not broadcast:\n$p")
    // every window partitions on (user [, chunk]) — nothing falls back
    // to the single-partition global-window trap
    assert(!p.contains("SinglePartition"), s"single-partition stage in chunked flags:\n$p")
  }

  test("q193 sketch arm: one object-hash aggregate pair, no distinct exchange, no window") {
    val p = plan("q193_table_profile_kmv")
    assert(p.contains("ObjectHashAggregate"), s"kmv_mins not object-hash-aggregated:\n$p")
    assert(!p.contains("Window"), s"q193 must not plan a window:\n$p")
  }

  test("q218/q231 matchers: the shared phrase vocabulary is cache-reused, not double-scanned") {
    // an unpersisted self-join plans the scan+explode+distinct subtree
    // TWICE (measured: the two ~25 s scan stages dominated the 100x
    // probe before the persist — 126 s vs 20 s on q218)
    for (q <- Seq("q218_entity_match", "q231_phonetic_match")) {
      val p = plan(q)
      assert(p.contains("InMemoryTableScan") || p.contains("InMemoryRelation"),
        s"$q: phraseVocab must come from the persisted relation:\n$p")
    }
  }

  test("q229 PSI: partial+final aggregation and a broadcast bounds row, no window") {
    val p = plan("q229_psi_drift")
    assert("HashAggregate".r.findAllIn(p).size >= 2, s"no partial agg:\n$p")
    assert(p.contains("Broadcast"), s"date-bounds row must broadcast:\n$p")
    assert(!p.contains("Window "), s"q229 must not plan a window:\n$p")
  }

  test("q232 HLL: register build is partial+final aggregation with a pruned scan, no window") {
    val p = plan("q232_hll_distinct")
    assert("HashAggregate".r.findAllIn(p).size >= 2, s"no partial agg:\n$p")
    assert(!p.contains("Window "), s"q232 must not plan a window:\n$p")
    val read = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(p).map(_.group(1)).getOrElse("")
    assert(read.nonEmpty && !read.contains("n_chars") && !read.contains("lang"),
      s"unpruned documents scan: $read")
  }

  test("q238 readability: zero-shuffle map pass plus one source-grain aggregation") {
    val p = plan("q238_readability")
    assert("Exchange".r.findAllIn(p).size <= 2,
      s"q238 must shuffle only the source-grain partials:\n$p")
    assert(!p.contains("Window "), s"q238 must not plan a window:\n$p")
  }

  test("q239 A/B: the 1-row arm frames meet by broadcast, never a cartesian") {
    val p = plan("q239_ab_test")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"arm rows must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"unbroadcast cartesian:\n$p")
  }

  test("q246 basket rules: the order-key exchange is runtime-reused, never a cartesian") {
    // AQE dedupes identical exchanges at STAGE MATERIALIZATION, so the
    // reuse marker only appears in the final adaptive plan — run the
    // query, then audit (the static plan prints one Exchange per
    // consumer even though only one materializes)
    val df = SparkEntry.queries("q246_basket_rules")(spark, sf("sf0.001"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ReusedExchange"),
      s"order-key exchange must be runtime-reused across consumers:\n$p")
    assert(!p.contains("CartesianProduct"), s"unbroadcast cartesian:\n$p")
  }

  test("q248/q250 grid statistics: no per-type window over the value grid, partial+final aggregation") {
    for (q <- Seq("q248_mad_outliers", "q250_mann_whitney")) {
      val p = plan(q)
      // running sums come from ChunkedFrame's BANDED windows — every
      // sum-window must partition by (type, __chunk), never by the
      // bare type (which would single-task each type's whole grid)
      val sumWindows = "Window \\[sum[^\\n]*".r.findAllIn(p).toSeq
      assert(sumWindows.nonEmpty, s"$q: expected ChunkedFrame running sums:\n$p")
      sumWindows.foreach(w => assert(w.contains("__chunk") || w.contains("__p_"),
        s"$q: un-banded running-sum window (single-task per type):\n$w"))
      assert("HashAggregate".r.findAllIn(p).size >= 2, s"$q: no partial agg:\n$p")
    }
  }

  test("q254 Kendall: the pair self-join is an equi-join on the pair key, never a cartesian") {
    val p = plan("q254_kendall_pairs")
    assert(!p.contains("CartesianProduct"), s"pair counting must equi-join on (ta, tb):\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2, s"no partial agg:\n$p")
  }

  test("q255 HHI: customer-grain partial aggregation, no window, no cartesian") {
    val p = plan("q255_hhi_concentration")
    assert("HashAggregate".r.findAllIn(p).size >= 2, s"no partial agg:\n$p")
    assert(!p.contains("Window "), s"q255 must not plan a window:\n$p")
    assert(!p.contains("CartesianProduct"), s"unbroadcast cartesian:\n$p")
  }

  test("q263 KW: running sums stay chunk-banded, chi2/totals broadcast, no cartesian") {
    val p = plan("q263_kruskal_wallis")
    val sumWindows = "Window \\[sum[^\\n]*".r.findAllIn(p).toSeq
    assert(sumWindows.nonEmpty, s"expected ChunkedFrame running sums:\n$p")
    sumWindows.foreach(w => assert(w.contains("__chunk") || w.contains("__p_"),
      s"un-banded running-sum window (single global sort task):\n$w"))
    assert(!p.contains("CartesianProduct"), s"unbroadcast cartesian:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2, s"no partial agg:\n$p")
  }

  test("q264 JS: grid-grain aggregation only — no window, no cartesian (q229's shape)") {
    val p = plan("q264_js_drift")
    assert(!p.contains("Window "), s"q264 must not plan a window:\n$p")
    assert(!p.contains("CartesianProduct"), s"unbroadcast cartesian:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2, s"no partial agg:\n$p")
  }

  test("q265 MI: margins meet the cell grid by broadcast, no window, no cartesian") {
    val p = plan("q265_mutual_info")
    assert(p.contains("BroadcastHashJoin"), s"margins must broadcast:\n$p")
    assert(!p.contains("Window "), s"q265 must not plan a window:\n$p")
    assert(!p.contains("CartesianProduct"), s"unbroadcast cartesian:\n$p")
  }

  test("q266 Friedman: rank windows partition by DAY (k rows each), never unpartitioned") {
    val p = plan("q266_friedman")
    val windows = "Window \\[[^\\n]*".r.findAllIn(p).toSeq
    assert(windows.nonEmpty, s"expected within-day rank windows:\n$p")
    windows.foreach(w => assert(w.contains("day#") || w.contains("windowspecdefinition(day"),
      s"rank window not partitioned by day (global sort task):\n$w"))
    assert(!p.contains("CartesianProduct"), s"unbroadcast cartesian:\n$p")
  }
}
