package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraints (the Deequ/Great-Expectations
  * shape): a check list compiles into ONE aggregation pass over the
  * frame — each constraint is a conditional count inside the same
  * partial-agg — plus one extra keyed aggregate per uniqueness check
  * (duplicates need a groupBy; everything else is map-side). The
  * report is one row per constraint: violations, row count, pass.
  *
  * This is the load-gate a warehouse pipeline runs BEFORE a merge
  * (the reference has no equivalent — bad rows reach Snowflake and
  * fail there, one RPC later): at 100 TB the single-pass shape
  * matters, because each additional full scan of the fact table is
  * the dominant cost of checking it.
  */
object Checks {

  sealed trait Check { def name: String }
  /** Column must be non-null (and non-empty for strings). */
  final case class NotNull(column: String) extends Check {
    def name = s"not_null($column)"
  }
  /** Key columns must identify rows uniquely. */
  final case class Unique(columns: Seq[String]) extends Check {
    def name = s"unique(${columns.mkString(",")})"
  }
  /** Values must fall in [lo, hi] (nulls don't violate — pair with
    * NotNull to forbid them). */
  final case class InRange(column: String, lo: Double, hi: Double) extends Check {
    def name = s"in_range($column,$lo,$hi)"
  }
  /** Values must come from the accepted set (nulls don't violate). */
  final case class InSet(column: String, values: Seq[String]) extends Check {
    def name = s"in_set($column)"
  }

  /** DISTRIBUTION-DRIFT constraints (the Deequ anomaly-check shape):
    * dataset-level statistics compared against a REFERENCE SNAPSHOT
    * of a known-good run, so the gate catches a feed whose values
    * silently shift — a scale factor lost upstream, a unit change, a
    * truncated tail — that row-level range checks wave through.
    * `violations` is 0/1 at dataset granularity: the constraint is
    * about the distribution, not any single row. All comparisons are
    * RELATIVE (|obs - ref| <= tol * |ref|), sign-safe, and the
    * statistics are computed in exact decimal arithmetic quantized to
    * 1e-4 (the q108 cross-engine parity recipe), so the same check
    * evaluates identically on any engine or partitioning. */
  final case class MeanWithin(column: String, ref: Double, tol: Double) extends Check {
    def name = s"mean_within($column)"
  }
  /** Sample stddev vs the snapshot — catches variance collapse (a
    * stuck sensor) and variance explosion (corrupt parses) that leave
    * the mean untouched. */
  final case class StddevWithin(column: String, ref: Double, tol: Double) extends Check {
    def name = s"stddev_within($column)"
  }
  /** Discrete p-quantile vs the snapshot: the element at sorted rank
    * floor(p*(n-1)) — rank selection, not interpolation, so the
    * observed value is an actual data value and engine-exact. Robust
    * where the mean is dragged by outliers. */
  final case class QuantileWithin(column: String, p: Double, ref: Double, tol: Double) extends Check {
    def name = s"quantile_within($column,$p)"
  }

  private def violations(c: Check): Column = c match {
    case NotNull(col0) =>
      sum(when(col(col0).isNull || col(col0).cast("string") === "", 1L).otherwise(0L))
    case InRange(col0, lo, hi) =>
      sum(when(col(col0).isNotNull && !col(col0).between(lo, hi), 1L).otherwise(0L))
    case InSet(col0, vs) =>
      sum(when(col(col0).isNotNull && !col(col0).isin(vs: _*), 1L).otherwise(0L))
    case _ => lit(0L) // Unique/drift: handled by their own aggregates
  }

  private def r4d(c: Column): Column = floor(c * lit(1e4) + lit(0.5)) / lit(1e4)
  /** drift verdict: 0 violations iff |obs - ref| <= tol * |ref|. */
  private def drifted(obs: Column, ref: Double, tol: Double): Column =
    when(abs(obs - lit(ref)) <= lit(tol) * lit(math.abs(ref)), 0L).otherwise(1L)

  /** Run every check in (at most) 1 + |unique checks| passes.
    * Output: (check_name, violations, n_rows, pass) — one row per
    * check, ordered by check name ("constraint" is reserved in ANSI SQL) for determinism. */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "no checks given")
    val scalar = checks.filter(c => c.isInstanceOf[NotNull] || c.isInstanceOf[InRange] || c.isInstanceOf[InSet])
    val uniques = checks.collect { case u: Unique => u }
    val moments = checks.filter(c => c.isInstanceOf[MeanWithin] || c.isInstanceOf[StddevWithin])
    val quantiles = checks.collect { case q: QuantileWithin => q }
    val spark = df.sparkSession
    import spark.implicits._

    // scalar violation counts AND drift moment sums share ONE
    // aggregation pass: a moment check adds two exact decimal sums
    // (s1, s2) to the same partial agg the row checks ride
    val scalarReport: Option[DataFrame] =
      if (scalar.isEmpty && moments.isEmpty) None
      else {
        val aggs = count(lit(1)).as("__n") +:
          (scalar.zipWithIndex.map { case (c, i) => violations(c).as(s"__v$i") } ++
            moments.zipWithIndex.flatMap { case (m, i) =>
              val vd = col(m match {
                case MeanWithin(c0, _, _)   => c0
                case StddevWithin(c0, _, _) => c0
                case c0                     => sys.error(s"not a moment check: $c0")
              }).cast("decimal(18,4)")
              Seq(sum(vd).as(s"__s1_$i"), sum(vd * vd).as(s"__s2_$i"))
            })
        val row = df.agg(aggs.head, aggs.tail: _*)
        val nD = col("__n").cast("double")
        val entries =
          scalar.zipWithIndex.map { case (c, i) =>
            struct(lit(c.name).as("check_name"), col(s"__v$i").as("violations"), col("__n").as("n_rows"))
          } ++
          moments.zipWithIndex.map { case (m, i) =>
            val s1 = col(s"__s1_$i").cast("double")
            val s2 = col(s"__s2_$i").cast("double")
            val (name, v) = m match {
              case MeanWithin(_, ref, tol) =>
                (m.name, drifted(r4d(s1 / nD), ref, tol))
              case StddevWithin(_, ref, tol) =>
                (m.name, drifted(r4d(sqrt(greatest(lit(0d), (s2 - s1 * s1 / nD) / (nD - lit(1d))))), ref, tol))
              case other => sys.error(s"not a moment check: $other")
            }
            struct(lit(name).as("check_name"), v.as("violations"), col("__n").as("n_rows"))
          }
        Some(row.select(explode(array(entries: _*)).as("r")).select(col("r.*")))
      }

    // a quantile drift check selects the element at sorted rank
    // floor(p*(n-1)) — one global-sort pass over the single checked
    // column. That sort is the honest cost of an exact quantile; at
    // 100 TB run it on a sample or swap in the q85 quantile sketch
    // with a widened tolerance.
    val quantileReports = quantiles.map { c =>
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("__v"))
      df.select(col(c.column).cast("double").as("__v"))
        .withColumn("__rn", row_number().over(w))
        .withColumn("__nn", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy()))
        .filter(col("__rn") === floor(lit(c.p) * (col("__nn") - lit(1))) + lit(1))
        .select(lit(c.name).as("check_name"),
          drifted(col("__v"), c.ref, c.tol).as("violations"),
          col("__nn").as("n_rows"))
    }

    val uniqueReports = uniques.map { u =>
      // violations = rows beyond the first per key (sum of (cnt-1))
      df.groupBy(u.columns.map(col): _*)
        .agg(count(lit(1)).as("__c"))
        .agg(coalesce(sum(col("__c") - 1), lit(0L)).as("violations"),
          coalesce(sum(col("__c")), lit(0L)).as("n_rows"))
        .select(lit(u.name).as("check_name"), col("violations"), col("n_rows"))
    }

    (scalarReport.toSeq ++ uniqueReports ++ quantileReports)
      .reduce(_ unionByName _)
      .withColumn("pass", col("violations") === 0L)
      .orderBy(col("check_name"))
  }

  /** Reference-run statistics for drift checks: one row per column —
    * (column, mean, sd, p50) — computed EXACTLY as the drift
    * constraints observe them (decimal sums, 1e-4 quantization, rank
    * p50), so "no change" compares equal by construction. Persist the
    * tiny frame next to the pipeline; rebuild on intentional
    * distribution changes. */
  def snapshot(df: DataFrame, cols: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    cols.map { c =>
      val vd = col(c).cast("decimal(18,4)")
      val agg = df.agg(count(lit(1)).as("__n"), sum(vd).as("__s1"), sum(vd * vd).as("__s2"))
      val nD = col("__n").cast("double")
      val s1 = col("__s1").cast("double")
      val s2 = col("__s2").cast("double")
      val momentRow = agg.select(
        r4d(s1 / nD).as("mean"),
        r4d(sqrt(greatest(lit(0d), (s2 - s1 * s1 / nD) / (nD - lit(1d))))).as("sd"))
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("__v"))
      val p50Row = df.select(col(c).cast("double").as("__v"))
        .withColumn("__rn", row_number().over(w))
        .withColumn("__nn", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy()))
        .filter(col("__rn") === floor(lit(0.5) * (col("__nn") - lit(1))) + lit(1))
        .select(col("__v").as("p50"))
      momentRow.crossJoin(p50Row).select(lit(c).as("column"), col("mean"), col("sd"), col("p50"))
    }.reduce(_ unionByName _)
  }

  /** Compile a stored snapshot into drift checks at `tol` relative
    * tolerance: mean, stddev, and median per snapshotted column. */
  def driftChecks(snap: DataFrame, tol: Double): Seq[Check] =
    snap.collect().toSeq.flatMap { r =>
      val c = r.getString(0)
      Seq(MeanWithin(c, r.getDouble(1), tol),
        StddevWithin(c, r.getDouble(2), tol),
        QuantileWithin(c, 0.5, r.getDouble(3), tol))
    }
}
