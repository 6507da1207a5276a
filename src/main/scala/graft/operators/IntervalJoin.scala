package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval OVERLAP join — pairs of intervals with
  * `lo_a < hi_b AND lo_b < hi_a` (half-open [lo, hi) overlap) — via
  * grid binning, the two-sided generalization of
  * [[graft.plans.BinnedRangeJoin]]'s point-in-interval rewrite.
  *
  * Spark plans the naive formulation as a nested-loop join
  * (O(|A| * |B|)). Here both sides explode to the grid bins they
  * cover, the join is an EQUI join on the bin, and a surviving pair
  * is kept only in its FIRST shared bin — `bin == floor(max(lo_a,
  * lo_b) / binSize)`, a bin both intervals provably cover — so every
  * overlapping pair emerges exactly once with no distinct. Cost
  * scales like |A| + |B| times bins-per-interval plus true collisions
  * per bin, instead of the cross product; pick `binSize` near the
  * typical interval width (spans of k bins fan out k rows).
  */
object IntervalJoin {

  private def bin(c: Column, binSize: Double): Column =
    floor(c.cast("double") / lit(binSize))

  /** `a`/`b` need (idA|idB, lo, hi) columns with lo <= hi. Returns
    * (idA, idB, overlap_lo, overlap_hi) for every overlapping pair;
    * reported overlaps are always non-empty (`overlap_lo < overlap_hi`),
    * so a zero-width interval [x, x) — empty under half-open semantics —
    * never pairs, even when the other interval strictly contains x. */
  def overlapJoin(a: DataFrame, b: DataFrame, idA: String, idB: String,
                  binSize: Double): DataFrame = {
    require(binSize > 0, "binSize must be positive")
    def explodeBins(df: DataFrame, id: String, suffix: String): DataFrame =
      df.select(col(id), col("lo").as(s"lo_$suffix"), col("hi").as(s"hi_$suffix"),
        explode(sequence(bin(col("lo"), binSize).cast("long"),
          bin(col("hi"), binSize).cast("long"))).as("bin"))
    explodeBins(a, idA, "a").join(explodeBins(b, idB, "b"), Seq("bin"))
      // max(lo) < min(hi) is the pairwise predicate lo_a < hi_b AND
      // lo_b < hi_a for proper intervals, and additionally rejects
      // degenerate [x, x) operands whose overlap would be empty
      .filter(greatest(col("lo_a"), col("lo_b")) < least(col("hi_a"), col("hi_b")))
      // first-shared-bin dedup: both intervals contain max(lo_a, lo_b),
      // so they both cover its bin — and no earlier shared bin exists
      .filter(col("bin") === bin(greatest(col("lo_a"), col("lo_b")), binSize).cast("long"))
      .select(col(idA), col(idB),
        greatest(col("lo_a"), col("lo_b")).as("overlap_lo"),
        least(col("hi_a"), col("hi_b")).as("overlap_hi"))
  }
}
