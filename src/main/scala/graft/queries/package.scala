package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared helpers for the oracle query suite.
  *
  * Rounding: Spark's `round()` (BigDecimal HALF_UP on the shortest
  * decimal repr) and DuckDB's `round()` (scaled C-double rounding)
  * disagree on values whose decimal expansion terminates at a half-way
  * digit (e.g. 61.725 stored as 61.724999999999994 rounds to 61.73 in
  * Spark, 61.72 in DuckDB). The oracle suite therefore rounds with the
  * same IEEE-double formula on both engines — floor(x*10^n + 0.5)/10^n
  * — which is bitwise-deterministic across engines. Only
  * order-dependent aggregates are rounded at all; per-row arithmetic
  * over the same inputs is already bitwise identical.
  */
package object queries {
  /** floor(x*10^4+0.5)/10^4 — cross-engine-exact 4-decimal rounding.
    * SQL mirror: floor(x*10000 + 0.5)/10000 */
  def r4(c: Column): Column = floor(c * lit(10000d) + lit(0.5d)) / lit(10000d)

  /** 2-decimal variant. SQL mirror: floor(x*100 + 0.5)/100 */
  def r2(c: Column): Column = floor(c * lit(100d) + lit(0.5d)) / lit(100d)
}
