package graft

import java.nio.file.{Files, Paths, Path}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.BaseJoinExec

/** Golden-plan snapshots for the battery's ten most expensive queries
  * (the round-12 verdict's list). PlanAuditSpec pins individual
  * structural properties; this pins the WHOLE normalized physical
  * plan — operator tree, join strategies, exchange partitioning —
  * so any future Spark/conf change that silently re-plans one of the
  * expensive queries (broadcast flips to shuffle, a partial agg
  * disappears, a window sneaks in) shows up as a one-line diff in
  * `src/test/resources/goldenplans/<name>.plan` instead of as an
  * unexplained bench regression three rounds later.
  *
  * Normalization: node names only (no expression IDs), joins carry
  * their join type + build side, exchanges carry the partitioning
  * CLASS (hash vs range vs single — the scale-relevant part; the
  * key exprs would drag exprIds in), scans collapse the file listing
  * to the table's basename. The signature is taken from
  * `queryExecution.sparkPlan` — the deterministic pre-AQE physical
  * plan (AQE's runtime re-plan depends on observed sizes; the
  * pre-AQE plan is a pure function of the query + static stats, so
  * it diffs cleanly).
  *
  * Refresh intentionally with `GOLDEN_UPDATE=1 sbt test` after a
  * DELIBERATE plan change, and commit the diff with the reason.
  */
class GoldenPlanSpec extends SparkSpec {

  private val dir = Paths.get("src/test/resources/goldenplans")
  private val update = sys.env.get("GOLDEN_UPDATE").contains("1")

  private val pinned = Seq(
    "q226_supply_triangles",
    "q246_basket_rules",
    "q193_table_profile_kmv",
    "q105_kmv_setops",
    "q104_pq_topk",
    "q59_fuzzy_lsh",
    "q248_mad_outliers",
    "q187_abtt_topk",
    "q91_boilerplate",
    "q56_fuzzy_editdist",
    // round-13 additions with non-trivial plans: the global-grid
    // rank statistic (the probe's shuffle outlier) and the drift
    // score whose one-pass running sums the snapshot protects
    "q263_kruskal_wallis",
    "q268_anderson_darling",
    // round-14 additions: the next expense tier from the round-13
    // quiet bench (2.3-3.8 s each) — RFM's triple-agg + ntile grid,
    // the fuzzy dedup pair (clusters + survivors share the LSH
    // candidate plan; a silent re-plan doubles BOTH), IVF-PQ's
    // probe-prune + rerank join, and the table profile's one-scan
    // multi-aggregate (refresh protocol: GOLDEN_UPDATE=1 after a
    // DELIBERATE plan change, commit the diff with the reason)
    "q189_rfm",
    "q213_fuzzy_clusters",
    "q214_fuzzy_survivors",
    "q118_ivfpq_topk",
    "q181_table_profile",
    // round-15 additions (round-14 Next #1): the two quiet-bench
    // outliers that re-measured clean (isolated canary-stamped runs
    // collapsed q129 4.01→1.50 s and q67 3.09→1.24 s, ≤1.25× their
    // r13 values) — pinned so the NEXT unexplained swing diffs a
    // plan file instead of re-running the adjudication
    "q129_rsi",
    "q67_dedup_corpus",
    // round-16 addition (round-15 Next #1): the battery's #1 expense
    // in the r15 quiet close (3.88 s vs 1.2 s in the r13/r14
    // drivers) and its ONE query whose entire point is plan-time
    // file pruning — the snapshot pins the pruned file COUNT
    // (files=N on the multi-root scan), so a silent prune regression
    // diffs a plan file instead of hiding inside host noise
    "q121_stats_pruned_scan",
    // round-16 adjudication residual: q196 is the one r15 quiet-swing
    // member whose 10-iteration isolated floor stayed ~2.9x its
    // r13/r14 driver value on the allcore-degraded host — no plan
    // evidence of drift, but it had no pin; now the next swing diffs
    // a file
    "q196_markov_attribution")

  private def label(p: SparkPlan): String = p match {
    case j: BaseJoinExec =>
      val side = j match {
        case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => " " + b.buildSide
        case b: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec  => " " + b.buildSide
        case _ => ""
      }
      s"${p.nodeName} ${j.joinType}$side"
    case e: ShuffleExchangeExec =>
      s"Exchange ${e.outputPartitioning.getClass.getSimpleName}"
    case _: BroadcastExchangeExec => "BroadcastExchange"
    case f: org.apache.spark.sql.execution.FileSourceScanExec =>
      // nodeName is "Scan parquet " for path-based reads — pin the
      // TABLE being scanned via the location root (basename only, so
      // the snapshot is sf-dir-independent). A MULTI-root scan is a
      // pruned explicit-file-list read (StatsCatalog.prunedRead):
      // part-file names carry write UUIDs, so pin the parent layout
      // dir + the FILE COUNT instead — the count IS the pruning
      // proof (round-15 Next #1: q121's golden plan must assert how
      // many of the 16 range-clustered files survive).
      val roots = f.relation.location.rootPaths
      if (roots.length > 1 || roots.headOption.exists(_.getName.startsWith("part-"))) {
        val parent = roots.head.getParent.getName
          .replaceAll("_sf[0-9.]+$", "")
        s"Scan $parent files=${roots.length}"
      } else {
        val tbl = roots.headOption
          .map(_.getName.stripSuffix(".parquet")).getOrElse("?")
        s"Scan ${tbl.replaceAll("_sf[0-9.]+$", "")}"
      }
    case _ =>
      val n = p.nodeName
      if (n.startsWith("InMemoryTableScan") || n.startsWith("InMemoryRelation"))
        n.takeWhile(_ != '(').trim
      else n
  }

  private def render(p: SparkPlan, d: Int): Vector[String] =
    (("  " * d) + label(p)) +: p.children.toVector.flatMap(render(_, d + 1))

  private def signature(df: DataFrame): String = {
    val plan = df.queryExecution.sparkPlan
    val main = render(plan, 0)
    // subqueries (scalar/IN) are part of the plan's cost story too
    val subs = plan.collect { case n => n.subqueries }.flatten
      .flatMap(s => "-- subquery:" +: render(s, 1))
    (main ++ subs).mkString("\n") + "\n"
  }

  private def check(name: String): Unit = test(s"golden plan: $name") {
    val sig = signature(SparkEntry.queries(name)(spark, sf("sf0.001")))
    spark.catalog.clearCache() // caller-owned persists (q246 vocab et al.)
    val file: Path = dir.resolve(s"$name.plan")
    if (update) {
      Files.createDirectories(dir)
      Files.writeString(file, sig)
    } else {
      assert(Files.exists(file),
        s"missing snapshot $file — run once with GOLDEN_UPDATE=1 and commit it")
      val want = Files.readString(file)
      assert(sig == want,
        s"plan drift for $name — if DELIBERATE, refresh with GOLDEN_UPDATE=1 and commit.\n" +
          s"--- golden\n$want\n--- current\n$sig")
    }
  }

  pinned.foreach(check)
}
