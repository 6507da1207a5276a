package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** TPC-H-shaped relational battery, round 6: the four classic shapes
  * the existing suite (Q1/Q3/Q5/Q4-semi/Q22-anti) didn't cover —
  * bidirectional nation-pair volume (Q7), returned-item customer
  * ranking (Q10), HAVING-gated large orders (Q18), and disjunctive
  * multi-predicate join pruning (Q19). Adapted to the driver schema
  * (no partsupp/shipmode/commitdate columns). Money sums go through
  * fixed-point decimal before the final double cast so results are
  * partition-count-invariant (see graft-oracle-parity rules).
  */
object RelationalQueries {

  private def li(s: SparkSession, dir: String) = Tables.lineitem(s, dir)

  // q75 — TPC-H Q7 shape (volume shipping): revenue flowing between
  // two specific nations, in both directions, by ship year. Customer
  // nation comes through orders, supplier nation through lineitem;
  // the nation dim broadcasts twice under different aliases. At
  // scale: lineitem/orders shuffle once on orderkey, the
  // customer/supplier joins are broadcast-eligible dims.
  private def q75(s: SparkSession, dir: String): DataFrame = {
    val n1 = Tables.nation(s, dir).select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    val n2 = Tables.nation(s, dir).select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val c = Tables.customer(s, dir)
    val sup = Tables.supplier(s, dir)
    val o = Tables.orders(s, dir)
    li(s, dir)
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("c_nationkey") === col("c_nk"))
      .join(broadcast(n2), col("s_nationkey") === col("s_nk"))
      .filter((col("cust_nation") === "NATION_3" && col("supp_nation") === "NATION_7")
        || (col("cust_nation") === "NATION_7" && col("supp_nation") === "NATION_3"))
      .groupBy(col("cust_nation"), col("supp_nation"), year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(r2(sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(28,4)")).cast("double")).as("revenue"),
        count(lit(1)).as("n_rows"))
  }

  // q76 — TPC-H Q10 shape (returned-item reporting): customers ranked
  // by revenue they generated on RETURNED lineitems in a half-year
  // order window; deterministic top-20 (revenue desc, custkey). The
  // per-customer aggregate is partial (map-side combine) and the
  // top-20 is a WindowGroupLimit-free global sort of an
  // already-small aggregate.
  private def q76(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1996-07-01").cast("timestamp")
        && col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val n = Tables.nation(s, dir)
    li(s, dir).filter(col("l_returnflag") === "R")
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"),
        r2(col("c_acctbal")).as("acctbal"))
      .agg(r2(sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(28,4)")).cast("double")).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  // q77 — TPC-H Q18 shape (large-volume orders): orders whose total
  // quantity exceeds the threshold, with customer attribution. The
  // HAVING gate runs on the lineitem pre-aggregate BEFORE the
  // customer/orders joins — at scale the join input shrinks from
  // |lineitem| to |qualifying orders| (same manual-pushdown shape as
  // q14). Quantity sums are decimal so the gate is exact.
  private def q77(s: SparkSession, dir: String): DataFrame = {
    val big = li(s, dir).groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("__q"))
      .filter(col("__q") > 280)
    val o = Tables.orders(s, dir)
    big.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"),
        r2(col("o_totalprice")).as("total_price"),
        col("__q").cast("double").as("sum_qty"))
      .orderBy(col("total_price").desc, col("o_orderkey"))
      .limit(100)
  }

  // q78 — TPC-H Q19 shape (disjunctive predicate join): three
  // brand/size/quantity conjunctions OR'd together across the
  // lineitem⋈part join. Exercises CNF conversion: Catalyst extracts
  // the common `p_partkey = l_partkey` equi-condition so the join
  // stays a hash join with the disjunction as residual, and pushes
  // the derivable size/brand disjunction down to the part scan.
  private def q78(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir)
    li(s, dir).join(p, col("l_partkey") === col("p_partkey")
      && ((col("p_brand") === "Brand#11" && col("p_size").between(1, 15) && col("l_quantity").between(1, 21))
        || (col("p_brand") === "Brand#22" && col("p_size").between(1, 25) && col("l_quantity").between(5, 35))
        || (col("p_brand") === "Brand#33" && col("p_size").between(1, 35) && col("l_quantity").between(10, 50))))
      .agg(r2(sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(28,4)")).cast("double")).as("revenue"),
        count(lit(1)).as("n_rows"))
  }

  // q87 — TPC-H Q21 shape (suppliers who kept orders waiting): the
  // multi-correlation classic — an EXISTS and a NOT EXISTS against
  // the SAME fact under different predicates, correlated on the same
  // key. Lateness is adapted to the driver schema (no commitdate/
  // receiptdate): a line is late when it ships >60 days after its
  // order date. A supplier is counted once per late line on a
  // finished multi-supplier order where it was the ONLY late
  // supplier. Spark-first shape: both subqueries become joins on the
  // orderkey — a left_semi against all lines of the order (other
  // supplier exists) and a left_anti against the late set (no OTHER
  // late supplier) — so the whole query is three shuffles on
  // l_orderkey that AQE plans off one exchange, with no correlated
  // re-execution per outer row (the rewrite Catalyst itself applies
  // to decorrelate EXISTS).
  private def q87(s: SparkSession, dir: String): DataFrame = {
    val fOrders = Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate"))
    val lines = li(s, dir).join(fOrders, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAY")).as("late"))
    val l1 = lines.filter(col("late")).select(col("l_orderkey"), col("l_suppkey"))
    val withOther = l1.join(
      lines.select(col("l_orderkey").as("k2"), col("l_suppkey").as("s2")),
      col("l_orderkey") === col("k2") && col("l_suppkey") =!= col("s2"), "left_semi")
    val sole = withOther.join(
      l1.select(col("l_orderkey").as("k3"), col("l_suppkey").as("s3")),
      col("l_orderkey") === col("k3") && col("l_suppkey") =!= col("s3"), "left_anti")
    sole.join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }

  // q88 — TPC-H Q17 shape (small-quantity-order revenue): correlated
  // scalar AGGREGATE subquery — each Brand#23 line compares its
  // quantity against 0.2x the average quantity of ITS part. Spark-
  // first: the per-part average is a groupBy over only the brand's
  // lines (the part filter is pushed through the join before the
  // aggregate — the manual decorrelation), then a broadcast join back
  // onto the same pruned lines. avg stays exact across engines:
  // quantities are small integers, so the double sum is exact and
  // rounds once. At scale the brand dimension prunes the fact scan to
  // ~1/25 before anything shuffles.
  private def q88(s: SparkSession, dir: String): DataFrame = {
    val parts = Tables.part(s, dir).filter(col("p_brand") === "Brand#23")
      .select(col("p_partkey"))
    val brandLines = li(s, dir).join(broadcast(parts), col("l_partkey") === col("p_partkey"))
    val avgQ = brandLines.groupBy(col("l_partkey").as("ak"))
      .agg(avg(col("l_quantity")).as("avg_qty"))
    brandLines.join(broadcast(avgQ), col("l_partkey") === col("ak"))
      .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .agg(r2(sum(col("l_extendedprice").cast("decimal(28,4)")).cast("double") / 7.0).as("avg_yearly"),
        count(lit(1)).as("n_rows"))
  }

  // q89 — TPC-H Q15 shape (top supplier by quarterly revenue): a
  // revenue view + scalar-subquery max, kept EXACT end-to-end — the
  // per-supplier revenue is a fixed-point decimal sum, so the
  // max-equality join cannot be perturbed by double summation order
  // and returns the same supplier set on any partitioning. Scale
  // shape: one partial-agg shuffle on suppkey builds the view; the
  // 1-row max broadcasts back onto it.
  private def q89(s: SparkSession, dir: String): DataFrame = {
    val rev = li(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(28,4)")).as("total_rev"))
    val mx = rev.agg(max(col("total_rev")).as("max_rev"))
    rev.join(broadcast(mx), col("total_rev") === col("max_rev"))
      .join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), r2(col("total_rev").cast("double")).as("total_rev"))
  }

  // q99 — TPC-H Q8 shape (national market share): one nation's share
  // of revenue in a part-type segment per order year — the
  // conditional-aggregate-ratio classic: the share is
  // sum(CASE nation THEN rev END) / sum(rev) computed in ONE
  // aggregation over the joined facts (no second pass, no self-join).
  // Revenue stays exact decimal through both sums; the ratio is the
  // only double op and rounds once. Scale: part-type filter prunes the
  // fact scan through the broadcast part dim before either shuffle;
  // supplier/nation dims broadcast.
  private def q99(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir).filter(col("p_type") === "STANDARD").select(col("p_partkey"))
    val sup = Tables.supplier(s, dir).select(col("s_suppkey"), col("s_nationkey"))
    val n = Tables.nation(s, dir).select(col("n_nationkey"), col("n_name"))
    val rev = (col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(28,4)")
    li(s, dir)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(o2(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        r4((sum(when(col("n_name") === "NATION_3", rev).otherwise(lit(0).cast("decimal(28,4)"))).cast("double")
          / sum(rev).cast("double"))).as("mkt_share"),
        count(lit(1)).as("n_rows"))
  }

  private def o2(s: SparkSession, dir: String) =
    Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderdate"))

  // q95 — TPC-H Q13 shape (customer order-count distribution): LEFT
  // OUTER join so zero-order customers survive with count 0, then a
  // second aggregation histogramming customers per order count — the
  // two-level outer-join-aggregate shape. Priority orders are
  // excluded (the Q13 comment-filter analogue on this schema). Scale:
  // the outer join shuffles both sides on custkey once; the second
  // aggregate runs on the |customers| pre-aggregate, and the final
  // histogram is dozens of rows.
  private def q95(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir).filter(col("o_orderpriority") =!= "1-URGENT")
    c.join(o, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  // q90 — BINNED RANGE JOIN via the Catalyst rewrite rule: a
  // 1000-band price classification written as the NAIVE point-in-
  // interval join — no manual binning in the query — optimized by
  // graft.plans.BinnedRangeJoin into an equi-join on the bin key
  // (RangeJoinRuleSpec pins the plan shape: no nested-loop join
  // survives). The oracle is the plain range join; the rewrite is
  // invisible to results by construction. The rule is enabled for
  // the SESSION (writers re-plan the frame with a fresh
  // QueryExecution, so a scoped toggle would silently hand them the
  // naive plan): this is safe because the rule fires only on INNER
  // joins with a point-in-interval pair and no equi key — q90's join
  // is the single such plan in the battery (q19's unbounded
  // catch-all band rides a LEFT join, which the rule never touches;
  // and an inner catch-all band would fail soft anyway — intervals
  // wider than spark.graft.rangeJoin.maxBins bins, default 4096, keep
  // the nested loop on a filtered remainder instead of exploding).
  private def q90(s: SparkSession, dir: String): DataFrame = {
    graft.Graft.enableRangeJoinRewrite(s, 0.5)
    val bands = s.range(0, 1000).select(
      (col("id") * lit(0.5)).as("lo"), ((col("id") + 1) * lit(0.5)).as("hi"),
      col("id").as("band"))
    Tables.events(s, dir)
      .join(bands, col("value") >= col("lo") && col("value") < col("hi"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n"),
        r4(sum(col("value").cast("decimal(18,2)")).cast("double")).as("sum_value"))
  }

  // q83 — Z-ORDER LAYOUT AUDIT: normalize both dimension keys to a
  // 10-bit range (rank-free integer scaling — real z-order writers
  // normalize per-column exactly so unequal key widths don't let one
  // dimension dominate the interleave), Morton-interleave them, cut
  // the z-ordered row sequence into 16 equal buckets, and report each
  // bucket's bounding box. The ntile here is the oracle-visible
  // stand-in for `ZOrder.cluster`'s repartitionByRange: same curve,
  // same boxes. Tight boxes on BOTH columns are what give min/max
  // file pruning on either predicate at 100 TB (LayoutSpec asserts
  // the pruning factor vs a linear layout).
  private def q83(s: SparkSession, dir: String): DataFrame = {
    val mx = li(s, dir).agg(max(col("l_partkey")).as("mp"), max(col("l_suppkey")).as("ms"))
    li(s, dir).select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
      .crossJoin(broadcast(mx))
      .withColumn("z", graft.functions.ZOrder.zvalue(
        expr("(l_partkey * 1024) DIV (mp + 1)"), expr("(l_suppkey * 1024) DIV (ms + 1)")))
      .withColumn("bucket",
        ntile(16).over(org.apache.spark.sql.expressions.Window
          .orderBy(col("z"), col("l_orderkey"), col("l_linenumber"))).cast("long"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("l_partkey")).as("min_part"), max(col("l_partkey")).as("max_part"),
        min(col("l_suppkey")).as("min_supp"), max(col("l_suppkey")).as("max_supp"))
  }

  // q111 — TPC-H Q6 (forecasting revenue change): the pure
  // filter-and-aggregate scan — one year of shipments, a discount
  // band, a quantity cap, revenue = price × discount. Deliberately the
  // simplest plan in the battery: zero shuffles (partial agg collapses
  // map-side), and every predicate reaches the parquet scan as a
  // PushedFilter — this is the scan-economy anchor the 100× probe uses
  // to measure raw I/O throughput (q13's cousin with a selective
  // filter in front).
  private def q111(s: SparkSession, dir: String): DataFrame =
    li(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1997-01-01").cast("timestamp")
        && col("l_discount").between(0.05, 0.07)
        && col("l_quantity") < 24)
      .agg(r2(sum((col("l_extendedprice") * col("l_discount")).cast("decimal(28,4)")).cast("double")).as("revenue"),
        count(lit(1)).as("n_rows"))

  // q112 — TPC-H Q12 shape (shipping-priority audit): the CASE-sum
  // pivot over a derived category. The driver schema has no
  // l_shipmode, so the Q12 group key is adapted to the ship-delay
  // bucket (0–30 / 31–60 / 61+ days after order date) — same plan
  // shape: one fact⋈fact join on orderkey, then conditional counts of
  // high- vs low-priority orders per bucket. The join prunes lineitem
  // to one ship year first, so at scale the exchange carries a
  // fraction of the fact.
  private def q112(s: SparkSession, dir: String): DataFrame = {
    val l = li(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_shipdate"))
    val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      // greatest(0, ·) clamps any ship-before-order artifact so both
      // engines bucket it as 0 (integer-division-on-negatives rounds
      // differently across engines); DIV keeps the division integral.
      .withColumn("delay_bucket",
        least(expr("greatest(0, datediff(l_shipdate, o_orderdate)) DIV 30"), lit(2L)).cast("long"))
      .groupBy(col("delay_bucket"))
      .agg(
        sum(when(col("o_orderpriority") === "1-URGENT" || col("o_orderpriority") === "2-HIGH", 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when(col("o_orderpriority") =!= "1-URGENT" && col("o_orderpriority") =!= "2-HIGH", 1L)
          .otherwise(0L)).as("low_line_count"))
  }

  // q113 — TPC-H Q14 (promotion effect): promo revenue share in one
  // ship month — the conditional-aggregate ratio computed in a single
  // pass over the joined facts (q99's shape on the part-type axis).
  // The month filter prunes the fact scan BEFORE the join; the part
  // dim broadcasts; both CASE branches ride the same exact decimal
  // sum, and the 100×ratio is the one double op, rounded once.
  private def q113(s: SparkSession, dir: String): DataFrame = {
    val rev = (col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(28,4)")
    li(s, dir)
      .filter(col("l_shipdate") >= lit("1996-09-01").cast("timestamp")
        && col("l_shipdate") < lit("1996-10-01").cast("timestamp"))
      .join(broadcast(Tables.part(s, dir).select(col("p_partkey"), col("p_type"))),
        col("l_partkey") === col("p_partkey"))
      .agg(
        r4((lit(100d) * sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0).cast("decimal(28,4)"))).cast("double")
          / sum(rev).cast("double"))).as("promo_revenue_pct"),
        count(lit(1)).as("n_rows"))
  }

  // q121 — STATS-CATALOG PRUNED SCAN, end to end through a declared
  // query: write lineitem into a range-clustered 16-file layout, build
  // the per-file min/max catalog (`StatsCatalog.build` — one scan,
  // 16 stats rows), and answer a one-quarter revenue rollup READING
  // ONLY the files whose [min,max] shipdate interval intersects the
  // predicate (`prunedRead`; ~2 of 16 files at this clustering — the
  // files-opened bound is pinned in StatsCatalogSpec). Pruning yields
  // a superset and the residual predicate still reaches the surviving
  // parquet scans pushed down, so the answer EQUALS the full scan —
  // which is exactly what the DuckDB oracle computes over the raw
  // table. At a million-file table the catalog stays one row per
  // FILE; keep it as a table and prune with a join (the driver-side
  // collect here mirrors Spark's own InMemoryFileIndex regime and is
  // file-count-, not data-sized).
  private def q121(s: SparkSession, dir: String): DataFrame = {
    val layout = s"/tmp/graft_q121_${new java.io.File(dir).getName}"
    li(s, dir).repartitionByRange(16, col("l_shipdate"))
      .write.mode("overwrite").parquet(layout)
    val stats = graft.sources.StatsCatalog.build(s, layout, Seq("l_shipdate"))
    val lo = java.sql.Timestamp.valueOf("1996-01-01 00:00:00")
    val hi = java.sql.Timestamp.valueOf("1996-03-31 23:59:59")
    graft.sources.StatsCatalog.prunedRead(s, layout, stats, "l_shipdate", lo, hi)
      .groupBy(col("l_returnflag"))
      .agg(r2(sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(28,4)")).cast("double")).as("revenue"),
        count(lit(1)).as("n_rows"))
  }

  // q131 — TPC-H Q2 shape (minimum-cost supplier): for each LARGE
  // mid-size part, the EUROPE supplier(s) achieving the minimum
  // supply cost — the correlated-MIN-subquery classic. The oracle
  // states the correlated form verbatim; the engine decorrelates it
  // into a per-part min over the region-filtered supply relation plus
  // an equality join-back, the plan every optimizer targets. The
  // driver schema has no partsupp, so the supply relation is DERIVED:
  // min(l_extendedprice) per observed (l_partkey, l_suppkey) pair —
  // same shape, same decorrelation. Cost stays exact decimal, so the
  // argmin equality join is decimal = decimal (no ulp roulette).
  // Scale: one partial-agg shuffle builds the supply relation;
  // part/supplier/nation/region all broadcast; the per-part min rides
  // a WINDOW over the filtered supply rather than a second aggregate
  // + join-back — an aggregate arm would re-execute the whole
  // supply lineage (the documented two-consumer trap) and its groups
  // here are per-PART (many, small), so the window has no key
  // ceiling.
  private def q131(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir)
      .filter(col("p_type") === "LARGE" && col("p_size").between(10, 20))
      .select(col("p_partkey"), col("p_brand"))
    val sup = Tables.supplier(s, dir)
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("s_nationkey"))
    val n = Tables.nation(s, dir)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    val r = Tables.region(s, dir).filter(col("r_name") === "EUROPE")
      .select(col("r_regionkey"))
    val euro = li(s, dir)
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(col("l_extendedprice").cast("decimal(18,2)")).as("cost"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
    euro
      .withColumn("min_cost", min(col("cost")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("l_partkey"))))
      .filter(col("cost") === col("min_cost"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("l_partkey").as("p_partkey"), col("p_brand"),
        col("cost").cast("double").as("cost"))
  }

  // q132 — TPC-H Q9 shape (product-type profit): profit by supplier
  // nation and order year over parts whose NAME matches a LIKE
  // pattern — the classic multi-fact profit rollup with a
  // substring-filtered dim pruning the fact scan. No partsupp, so the
  // cost side is the deterministic proxy p_retailprice * l_quantity
  // (a per-part list cost — same join shape, same arithmetic
  // structure as ps_supplycost * l_quantity). Revenue and cost both
  // run exact decimal through the sum; one r2 at the end. Scale:
  // the LIKE-filtered part dim broadcasts and prunes lineitem before
  // the orderkey shuffle; supplier/nation broadcast.
  private def q132(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir).filter(col("p_name").like("%gear%"))
      .select(col("p_partkey"), col("p_retailprice"))
    val sup = Tables.supplier(s, dir).select(col("s_suppkey"), col("s_nationkey"))
    val n = Tables.nation(s, dir).select(col("n_nationkey"), col("n_name"))
    val amount = (col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(28,4)") -
      (col("p_retailprice").cast("decimal(18,2)") * col("l_quantity").cast("decimal(18,2)"))
        .cast("decimal(28,4)")
    li(s, dir)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(o2(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(r2(sum(amount).cast("double")).as("sum_profit"),
        count(lit(1)).as("n_rows"))
  }

  // q133 — TPC-H Q11 shape (important stock): parts whose value,
  // supplied by ONE nation's suppliers, exceeds a fixed fraction of
  // that nation's total supplied value — the HAVING-against-a-global-
  // scalar shape. The scalar total rides a 1-row broadcast cross
  // join; the fraction compare runs in integer ten-thousandths
  // ((value*10000)::BIGINT), so the gate is exact integer arithmetic
  // on both engines — no decimal-width rules, no double drift at the
  // boundary. Scale: the nation's supplier set broadcasts and prunes
  // the fact scan; one (partkey) partial-agg shuffle; the total is a
  // re-aggregate of the part-level aggregate, not a second fact pass.
  private def q133(s: SparkSession, dir: String): DataFrame = {
    val sup = Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir).filter(col("n_name") === "NATION_7")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val v = li(s, dir)
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey"))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(28,4)")).as("val"))
      .select(col("l_partkey"), col("val"),
        (col("val") * lit(10000)).cast("long").as("val_u"))
    val tot = v.agg(sum(col("val_u")).as("total_u"))
    v.crossJoin(broadcast(tot))
      .filter(col("val_u") * 1000 > col("total_u"))
      .select(col("l_partkey").as("p_partkey"),
        r2(col("val").cast("double")).as("value"))
  }

  // q134 — TPC-H Q16 shape (supplier count by part attributes): how
  // many distinct suppliers can furnish each surviving (brand, type,
  // size) bucket, EXCLUDING a blacklisted supplier set — the
  // anti-join + COUNT(DISTINCT) shape. The supply relation is the
  // distinct observed (part, supplier) pair set (no partsupp); the
  // blacklist (negative-balance suppliers — the schema's analogue of
  // Q16's complaint scan) anti-joins BEFORE the part join. Scale:
  // distinct pair build is one shuffle of the two key columns only;
  // blacklist and filtered part dim broadcast; the count-distinct
  // groups are bounded by the part dim, not the fact table.
  private def q134(s: SparkSession, dir: String): DataFrame = {
    val excl = Tables.supplier(s, dir).filter(col("s_acctbal") < 0)
      .select(col("s_suppkey"))
    val p = Tables.part(s, dir)
      .filter(col("p_brand") =!= "Brand#1" &&
        col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    li(s, dir).select(col("l_partkey"), col("l_suppkey")).distinct()
      .join(broadcast(excl), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size").cast("long").as("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
  }

  // q135 — TPC-H Q20 shape (excess-stock suppliers): suppliers of one
  // nation who DOMINATED some part's supply in a ship-year — the
  // nested-IN-with-correlated-aggregate-threshold classic. Q20's
  // `ps_availqty > 0.5 * sum(l_quantity)` becomes, on this schema,
  // `pair quantity * 2 > part total quantity` within the window —
  // decorrelated to two aggregates of the SAME filtered scan joined
  // on partkey. Quantities are integral: they sum as BIGINT, so the
  // half-share gate is pure integer arithmetic. Scale: one filtered
  // fact pass feeds both aggregates (partial-agg shuffles on
  // (part, supp) and (part)); the dominant-supplier set is
  // supplier-dim-sized and the final semi-join is broadcast.
  private def q135(s: SparkSession, dir: String): DataFrame = {
    val win = li(s, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("l_partkey"), col("l_suppkey"), col("l_quantity").cast("long").as("q"))
    val ps = win.groupBy(col("l_partkey"), col("l_suppkey")).agg(sum(col("q")).as("pq"))
    val pt = win.groupBy(col("l_partkey").as("tk")).agg(sum(col("q")).as("tq"))
    val dominant = ps.join(pt, col("l_partkey") === col("tk"))
      .filter(col("pq") * 2 > col("tq"))
      .select(col("l_suppkey")).distinct()
    Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir).filter(col("n_name") === "NATION_3")),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(dominant), col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_name"), col("s_acctbal"), col("n_name"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q131_tpch_q2" -> q131 _,
    "q132_tpch_q9" -> q132 _,
    "q133_tpch_q11" -> q133 _,
    "q134_tpch_q16" -> q134 _,
    "q135_tpch_q20" -> q135 _,
    "q121_stats_pruned_scan" -> q121 _,
    "q111_tpch_q6" -> q111 _,
    "q112_tpch_q12" -> q112 _,
    "q113_tpch_q14" -> q113 _,
    "q83_zorder" -> q83 _,
    "q87_tpch_q21" -> q87 _,
    "q90_range_join_binned" -> q90 _,
    "q95_tpch_q13" -> q95 _,
    "q99_tpch_q8" -> q99 _,
    "q88_tpch_q17" -> q88 _,
    "q89_tpch_q15" -> q89 _,
    "q75_tpch_q7" -> q75 _,
    "q76_tpch_q10" -> q76 _,
    "q77_tpch_q18" -> q77 _,
    "q78_tpch_q19" -> q78 _
  )

  val oracleSql: Map[String, String] = Map(
    "q131_tpch_q2" ->
      // the oracle keeps Q2's correlated MIN subquery verbatim; the
      // engine ships the decorrelated plan — equality is the point
      """WITH supply AS (
        |  SELECT l_partkey, l_suppkey, min(l_extendedprice::DECIMAL(18,2)) AS cost
        |  FROM lineitem GROUP BY 1, 2
        |), euro AS (
        |  SELECT sp.l_partkey, s_acctbal, s_name, n_name, p_brand, cost
        |  FROM supply sp
        |  JOIN supplier ON sp.l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
        |  JOIN part ON sp.l_partkey = p_partkey
        |    AND p_type = 'LARGE' AND p_size BETWEEN 10 AND 20
        |)
        |SELECT s_acctbal, s_name, n_name, l_partkey AS p_partkey, p_brand,
        |  cost::DOUBLE AS cost
        |FROM euro e
        |WHERE cost = (SELECT min(cost) FROM euro e2 WHERE e2.l_partkey = e.l_partkey)""".stripMargin,
    "q132_tpch_q9" ->
      """SELECT n_name AS nation, year(o_orderdate)::BIGINT AS o_year,
        |  floor(sum((l_extendedprice * (1 - l_discount))::DECIMAL(28,4)
        |          - (p_retailprice::DECIMAL(18,2) * l_quantity::DECIMAL(18,2))::DECIMAL(28,4)
        |        )::DOUBLE*100 + 0.5)/100 AS sum_profit,
        |  count(*) AS n_rows
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_name LIKE '%gear%'
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY 1, 2""".stripMargin,
    "q133_tpch_q11" ->
      """WITH v AS (
        |  SELECT l_partkey,
        |    sum((l_extendedprice * (1 - l_discount))::DECIMAL(28,4)) AS val
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_7'
        |  GROUP BY 1
        |), u AS (
        |  SELECT l_partkey, val, (val * 10000)::BIGINT AS val_u FROM v
        |)
        |SELECT l_partkey AS p_partkey,
        |  floor(val::DOUBLE*100 + 0.5)/100 AS value
        |FROM u
        |WHERE val_u * 1000 > (SELECT sum(val_u) FROM u)""".stripMargin,
    "q134_tpch_q16" ->
      """WITH pairs AS (
        |  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
        |  WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |)
        |SELECT p_brand, p_type, p_size::BIGINT AS p_size,
        |  count(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
        |FROM pairs
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1' AND p_size IN (1, 4, 9, 16, 25, 36, 49)
        |GROUP BY 1, 2, 3""".stripMargin,
    "q135_tpch_q20" ->
      """WITH w AS (
        |  SELECT l_partkey, l_suppkey, l_quantity::BIGINT AS q
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |), ps AS (
        |  SELECT l_partkey, l_suppkey, sum(q) AS pq FROM w GROUP BY 1, 2
        |), pt AS (
        |  SELECT l_partkey, sum(q) AS tq FROM w GROUP BY 1
        |)
        |SELECT s_name, s_acctbal, n_name
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_3'
        |WHERE s_suppkey IN (
        |  SELECT ps.l_suppkey FROM ps JOIN pt ON ps.l_partkey = pt.l_partkey
        |  WHERE ps.pq * 2 > pt.tq)""".stripMargin,
    "q121_stats_pruned_scan" ->
      // the pruned read is a pure scan-economy change: the oracle is
      // the same predicate + rollup over the raw table
      """SELECT l_returnflag,
        |  floor(sum((l_extendedprice * (1 - l_discount))::DECIMAL(28,4))::DOUBLE*100 + 0.5)/100 AS revenue,
        |  count(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate <= TIMESTAMP '1996-03-31 23:59:59'
        |GROUP BY 1""".stripMargin,
    "q111_tpch_q6" ->
      """SELECT
        |  floor(sum((l_extendedprice * l_discount)::DECIMAL(28,4))::DOUBLE*100 + 0.5)/100 AS revenue,
        |  count(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,
    "q112_tpch_q12" ->
      """SELECT least(greatest(0, l_shipdate::DATE - o_orderdate::DATE) // 30, 2)::BIGINT AS delay_bucket,
        |  sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
        |  sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)::BIGINT AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1""".stripMargin,
    "q113_tpch_q14" ->
      """SELECT
        |  floor((100 * sum(CASE WHEN p_type = 'PROMO'
        |             THEN (l_extendedprice * (1 - l_discount))::DECIMAL(28,4)
        |             ELSE 0::DECIMAL(28,4) END)::DOUBLE
        |         / sum((l_extendedprice * (1 - l_discount))::DECIMAL(28,4))::DOUBLE)*10000 + 0.5)/10000
        |    AS promo_revenue_pct,
        |  count(*)::BIGINT AS n_rows
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-09-01' AND l_shipdate < TIMESTAMP '1996-10-01'""".stripMargin,
    "q83_zorder" ->
      // Morton interleave reproduced with plain bit arithmetic: bit j
      // of the normalized partkey lands at position 2j, suppkey at
      // 2j+1 (10-bit normalized values -> 16 bit-pairs suffice)
      """WITH mx AS (
        |  SELECT max(l_partkey) AS mp, max(l_suppkey) AS ms FROM lineitem
        |), t AS (
        |  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |    (l_partkey * 1024) // (mp + 1) AS pn,
        |    (l_suppkey * 1024) // (ms + 1) AS sn
        |  FROM lineitem CROSS JOIN mx
        |), z AS (
        |  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |    (SELECT sum((((pn >> j) & 1) << (2*j)) + (((sn >> j) & 1) << (2*j + 1)))
        |     FROM range(0, 16) r(j))::BIGINT AS zv
        |  FROM t
        |), b AS (
        |  SELECT l_partkey, l_suppkey,
        |    ntile(16) OVER (ORDER BY zv, l_orderkey, l_linenumber)::BIGINT AS bucket
        |  FROM z
        |)
        |SELECT bucket, count(*)::BIGINT AS n_rows,
        |  min(l_partkey) AS min_part, max(l_partkey) AS max_part,
        |  min(l_suppkey) AS min_supp, max(l_suppkey) AS max_supp
        |FROM b GROUP BY 1""".stripMargin,
    "q75_tpch_q7" ->
      """SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
        |  year(l_shipdate)::BIGINT AS l_year,
        |  floor(sum((l_extendedprice * (1 - l_discount))::DECIMAL(28,4))::DOUBLE*100 + 0.5)/100 AS revenue,
        |  count(*) AS n_rows
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        |   OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
        |GROUP BY 1, 2, 3""".stripMargin,
    "q76_tpch_q10" ->
      """SELECT c_custkey, c_name, n_name,
        |  floor(c_acctbal::DOUBLE*100 + 0.5)/100 AS acctbal,
        |  floor(sum((l_extendedprice * (1 - l_discount))::DECIMAL(28,4))::DOUBLE*100 + 0.5)/100 AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1, 2, 3, 4
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q77_tpch_q18" ->
      """WITH big AS (
        |  SELECT l_orderkey, sum(l_quantity::DECIMAL(18,2)) AS q
        |  FROM lineitem GROUP BY 1 HAVING sum(l_quantity::DECIMAL(18,2)) > 280
        |)
        |SELECT c_name, c_custkey, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS o_date,
        |  floor(o_totalprice::DOUBLE*100 + 0.5)/100 AS total_price,
        |  q::DOUBLE AS sum_qty
        |FROM big
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY total_price DESC, o_orderkey LIMIT 100""".stripMargin,
    "q78_tpch_q19" ->
      """SELECT
        |  floor(sum((l_extendedprice * (1 - l_discount))::DECIMAL(28,4))::DOUBLE*100 + 0.5)/100 AS revenue,
        |  count(*) AS n_rows
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
        |   OR (p_brand = 'Brand#22' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 5 AND 35)
        |   OR (p_brand = 'Brand#33' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 10 AND 50)""".stripMargin,
    "q87_tpch_q21" ->
      """WITH L AS (
        |  SELECT l_orderkey, l_suppkey,
        |    l_shipdate > o_orderdate + INTERVAL 60 DAY AS late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F'
        |), l1 AS (SELECT l_orderkey, l_suppkey FROM L WHERE late)
        |SELECT s_name, count(*)::BIGINT AS numwait
        |FROM l1 JOIN supplier ON l_suppkey = s_suppkey
        |WHERE EXISTS (SELECT 1 FROM L l2
        |        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM l1 l3
        |        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey)
        |GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin,
    "q88_tpch_q17" ->
      """WITH bl AS (
        |  SELECT l_partkey, l_quantity, l_extendedprice
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#23'
        |), a AS (
        |  SELECT l_partkey AS ak, avg(l_quantity) AS avg_qty FROM bl GROUP BY 1
        |)
        |SELECT
        |  floor((sum(l_extendedprice::DECIMAL(28,4))::DOUBLE / 7.0)*100 + 0.5)/100 AS avg_yearly,
        |  count(*)::BIGINT AS n_rows
        |FROM bl JOIN a ON l_partkey = ak
        |WHERE l_quantity < 0.2 * avg_qty""".stripMargin,
    "q99_tpch_q8" ->
      """SELECT year(o_orderdate)::BIGINT AS o_year,
        |  floor((sum(CASE WHEN n_name = 'NATION_3'
        |               THEN (l_extendedprice * (1 - l_discount))::DECIMAL(28,4)
        |               ELSE 0::DECIMAL(28,4) END)::DOUBLE
        |         / sum((l_extendedprice * (1 - l_discount))::DECIMAL(28,4))::DOUBLE)*10000 + 0.5)/10000
        |    AS mkt_share,
        |  count(*)::BIGINT AS n_rows
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_type = 'STANDARD'
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY 1""".stripMargin,
    "q95_tpch_q13" ->
      """SELECT c_count, count(*)::BIGINT AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey)::BIGINT AS c_count
        |  FROM customer LEFT JOIN (
        |    SELECT * FROM orders WHERE o_orderpriority <> '1-URGENT'
        |  ) o ON c_custkey = o_custkey
        |  GROUP BY 1
        |) GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q90_range_join_binned" ->
      """WITH bands AS (
        |  SELECT i * 0.5 AS lo, (i + 1) * 0.5 AS hi, i::BIGINT AS band
        |  FROM (SELECT unnest(range(0, 1000)) AS i)
        |)
        |SELECT band, count(*)::BIGINT AS n,
        |  floor(sum(value::DECIMAL(18,2))::DOUBLE*10000 + 0.5)/10000 AS sum_value
        |FROM events JOIN bands ON value >= lo AND value < hi
        |GROUP BY 1""".stripMargin,
    "q89_tpch_q15" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    sum((l_extendedprice * (1 - l_discount))::DECIMAL(28,4)) AS total_rev
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY 1
        |)
        |SELECT s_suppkey, s_name,
        |  floor(total_rev::DOUBLE*100 + 0.5)/100 AS total_rev
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_rev = (SELECT max(total_rev) FROM rev)""".stripMargin
  )
}
