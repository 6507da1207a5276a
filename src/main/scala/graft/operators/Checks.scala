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

  private def violations(c: Check): Column = c match {
    case NotNull(col0) =>
      sum(when(col(col0).isNull || col(col0).cast("string") === "", 1L).otherwise(0L))
    case InRange(col0, lo, hi) =>
      sum(when(col(col0).isNotNull && !col(col0).between(lo, hi), 1L).otherwise(0L))
    case InSet(col0, vs) =>
      sum(when(col(col0).isNotNull && !col(col0).isin(vs: _*), 1L).otherwise(0L))
    case _: Unique => lit(0L) // handled by its own aggregate
  }

  /** Run every check in (at most) 1 + |unique checks| passes.
    * Output: (check_name, violations, n_rows, pass) — one row per
    * check, ordered by check name ("constraint" is reserved in ANSI SQL) for determinism. */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "no checks given")
    val scalar = checks.filter(!_.isInstanceOf[Unique])
    val uniques = checks.collect { case u: Unique => u }
    val spark = df.sparkSession
    import spark.implicits._

    val scalarReport: Option[DataFrame] =
      if (scalar.isEmpty) None
      else {
        val aggs = count(lit(1)).as("__n") +:
          scalar.zipWithIndex.map { case (c, i) => violations(c).as(s"__v$i") }
        val row = df.agg(aggs.head, aggs.tail: _*)
        Some(row.select(explode(array(scalar.zipWithIndex.map { case (c, i) =>
          struct(lit(c.name).as("check_name"), col(s"__v$i").as("violations"), col("__n").as("n_rows"))
        }: _*)).as("r")).select(col("r.*")))
      }

    val uniqueReports = uniques.map { u =>
      // violations = rows beyond the first per key (sum of (cnt-1))
      df.groupBy(u.columns.map(col): _*)
        .agg(count(lit(1)).as("__c"))
        .agg(coalesce(sum(col("__c") - 1), lit(0L)).as("violations"),
          coalesce(sum(col("__c")), lit(0L)).as("n_rows"))
        .select(lit(u.name).as("check_name"), col("violations"), col("n_rows"))
    }

    (scalarReport.toSeq ++ uniqueReports)
      .reduce(_ unionByName _)
      .withColumn("pass", col("violations") === 0L)
      .orderBy(col("check_name"))
  }
}
