package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.broadcast

/** Shared fixed-point statistical lookup tables.
  *
  * The hypothesis-test queries (q263 Kruskal-Wallis, q265 mutual-
  * information G-test, q266 Friedman) close with a χ² decision whose
  * degrees of freedom depend on the DATA (number of groups / levels),
  * so the critical value cannot be a single literal the way q250's
  * 1.96 or q257's χ²₂ boundary is. Both engines join the SAME
  * 40-row literal table of χ²(0.95) quantiles in 1e4 fixed point
  * (textbook values; e.g. df=2 → 59915 is the 5.9915 every χ² table
  * prints), so the decision compares a QUANTIZED statistic against
  * an integer — never a float boundary, and never an engine-local
  * quantile routine. df > 40 yields a NULL decision (documented: at
  * 40+ degrees of freedom a χ² screen should be a normal
  * approximation anyway — emit the statistic, let the caller judge).
  */
object StatTables {

  /** χ²(0.95) quantile × 1e4, index 0 = df 1 … index 39 = df 40. */
  val Chi2Q95x1e4: Vector[Long] = Vector(
    38415L, 59915L, 78147L, 94877L, 110705L, 125916L, 140671L, 155073L,
    169190L, 183070L, 196751L, 210261L, 223620L, 236848L, 249958L, 262962L,
    275871L, 288693L, 301435L, 314104L, 326706L, 339244L, 351725L, 364150L,
    376525L, 388851L, 401133L, 413371L, 425570L, 437730L, 449853L, 461943L,
    473999L, 486024L, 498018L, 509985L, 521923L, 533835L, 545722L, 557585L)

  /** The table rows, built once (q263/q265/q266/q267 each call
    * [[chi2Frame]] per query build). */
  private val chi2Rows: Seq[(Long, Long)] =
    Chi2Q95x1e4.zipWithIndex.map { case (q, i) => (i + 1L, q) }

  /** Per-session memo of the literal frame — weak keys AND a weak
    * VALUE: the DataFrame strongly references its SparkSession, so a
    * strong value would defeat the weak key (the classic WeakHashMap
    * value→key leak) and pin every retired session. A cleared value
    * just rebuilds the 40-row local frame — the memo is an
    * allocation-churn saver, not a correctness cache. */
  private val chi2Memo =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession,
        java.lang.ref.WeakReference[DataFrame]]())

  /** The table as a 40-row broadcast frame (df, q95x1e4). */
  def chi2Frame(s: SparkSession): DataFrame = {
    val cached = Option(chi2Memo.get(s)).flatMap(r => Option(r.get))
    broadcast(cached.getOrElse {
      import s.implicits._
      val built = chi2Rows.toDF("df", "q95x1e4")
      chi2Memo.put(s, new java.lang.ref.WeakReference(built))
      built
    })
  }

  /** The same table as a DuckDB VALUES list: `(VALUES (1, 38415),
    * …) AS chi2(df, q95x1e4)`. */
  def chi2ValuesSql: String =
    Chi2Q95x1e4.zipWithIndex
      .map { case (q, i) => s"(${i + 1}, ${q})" }
      .mkString("(VALUES ", ", ", ") AS chi2(df, q95x1e4)")

  /** Bonferroni-corrected two-sided normal critical values for a
    * family of m pairwise comparisons at family α = 0.05:
    * Φ⁻¹(1 − 0.025/m) × 1e4, index 0 = m 1 … index 44 = m 45
    * (covers k ≤ 10 groups; k(k−1)/2 ≤ 45). The q287 Dunn post-hoc
    * needs a critical value at a DATA-dependent per-comparison level
    * — the same reason the χ² table above exists — so both engines
    * join this literal (m=1 → 19600 is the familiar 1.96; m=10 →
    * 28070 is the 2.807 every Bonferroni table prints). m > 45
    * yields a NULL decision (documented: post-hoc screens past 10
    * groups should control FDR, not familywise error). */
  val ZBonf975x1e4: Vector[Long] = Vector(
    19600L, 22414L, 23940L, 24977L, 25758L, 26383L, 26901L, 27344L,
    27729L, 28070L, 28376L, 28653L, 28905L, 29137L, 29352L, 29552L,
    29738L, 29913L, 30078L, 30233L, 30381L, 30521L, 30654L, 30781L,
    30902L, 31019L, 31130L, 31237L, 31340L, 31440L, 31536L, 31628L,
    31718L, 31804L, 31888L, 31970L, 32048L, 32125L, 32200L, 32272L,
    32343L, 32412L, 32479L, 32544L, 32608L)

  /** Bonferroni table as a 45-row broadcast frame (m, zcrit4). */
  def zbonfFrame(s: SparkSession): DataFrame = {
    import s.implicits._
    broadcast(ZBonf975x1e4.zipWithIndex
      .map { case (z, i) => (i + 1L, z) }.toDF("m", "zcrit4"))
  }

  /** The same as a DuckDB VALUES list `… AS zb(m, zcrit4)`. */
  def zbonfValuesSql: String =
    ZBonf975x1e4.zipWithIndex
      .map { case (z, i) => s"(${i + 1}, ${z})" }
      .mkString("(VALUES ", ", ", ") AS zb(m, zcrit4)")

  /** Benford first-significant-digit probabilities log10(1 + 1/d)
    * × 1e12, d = 1..9 (Newcomb 1881, Benford 1938) — the q270 audit's
    * expectation, a LITERAL shared by both engines so the decision
    * never depends on a libm log10 agreeing bit-for-bit. Sums to
    * 1e12 + 1 (rounding); the χ² terms use each digit's own literal,
    * so the off-by-one never enters a shared denominator. */
  val BenfordP1e12: Vector[Long] = Vector(
    301029995664L, 176091259056L, 124938736608L, 96910013008L,
    79181246048L, 66946789631L, 57991946978L, 51152522447L, 45757490561L)

  /** Benford table as a 9-row broadcast frame (digit, p12). */
  def benfordFrame(s: SparkSession): DataFrame = {
    import s.implicits._
    broadcast(BenfordP1e12.zipWithIndex
      .map { case (p, i) => (i + 1, p) }.toDF("digit", "p12"))
  }

  /** The same as a DuckDB VALUES list `… AS ben(digit, p12)`. */
  def benfordValuesSql: String =
    BenfordP1e12.zipWithIndex
      .map { case (p, i) => s"(${i + 1}, ${p})" }
      .mkString("(VALUES ", ", ", ") AS ben(digit, p12)")
}
