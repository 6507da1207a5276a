package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Catalyst optimizer rule: rewrite a pure range join (point-in-
  * interval, no equi keys) into a BINNED EQUI-JOIN.
  *
  * Spark plans `fact JOIN dim ON p >= lo AND p < hi` as a nested-loop
  * join — O(|fact| * |dim|) comparisons even when broadcast, and a
  * cartesian shuffle when the interval side is large. The classic fix
  * (the bin/bucket range-join optimization production engines apply)
  * is to overlay a grid of width `binSize`: every point belongs to
  * exactly one bin, every interval covers a contiguous bin range, and
  * a pair can match only when the point's bin is one of the
  * interval's bins. The rewrite
  *
  *   point side     + __graft_bin  = floor(p / binSize)
  *   interval side  + __graft_ibin ∈ [floor(lo/binSize) .. floor(hi/binSize)]  (explode)
  *   JOIN ON __graft_bin = __graft_ibin AND <original condition>
  *
  * hands the planner an equi key, so the join becomes a hash /
  * sort-merge join that scales like |fact| + |dim| * bins-per-
  * interval instead of their product; each true match joins exactly
  * once (a point has one bin), so no dedup is needed, and the full
  * original predicate rides along as the residual — the rewrite can
  * only ever REMOVE non-matching pairs earlier, never change the
  * result.
  *
  * Off by default; enable per session with
  * [[graft.Graft.enableRangeJoinRewrite]] (sets
  * `spark.graft.rangeJoin.binSize` and registers the rule in
  * `spark.experimental.extraOptimizations`) or cluster-wide via
  * `spark.sql.extensions=graft.GraftExtensions` plus the conf key.
  * Choose binSize near the typical interval width: intervals spanning
  * k bins fan out k rows (a 100 TB interval table with bounded-width
  * intervals stays a bounded blowup; unbounded intervals — q19's
  * `1e9` catch-all band — are the case to keep on the nested loop or
  * cap with a domain-bounded hi).
  *
  * Fires only on INNER joins whose condition has a point-in-interval
  * conjunct pair and NO equi conjunct (anything with an equi key
  * already hash-joins; the rewritten join itself carries one, which
  * also makes the rule idempotent under fixed-point batches).
  */
object BinnedRangeJoin extends Rule[LogicalPlan] with PredicateHelper {

  val BinSizeKey = "spark.graft.rangeJoin.binSize"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val raw = conf.getConfString(BinSizeKey, "")
    val binSize = try raw.toDouble catch { case _: NumberFormatException => 0.0 }
    if (binSize <= 0) plan
    else plan.transformUp {
      case j @ Join(_, _, Inner, Some(cond), _) =>
        rewrite(j, cond, binSize).getOrElse(j)
    }
  }

  /** point >= / > lo  and  point < / <= hi, as (point, bound). */
  private def lowerBound(e: Expression): Option[(Expression, Expression)] = e match {
    case GreaterThanOrEqual(p, lo) => Some((p, lo))
    case GreaterThan(p, lo)        => Some((p, lo))
    case LessThanOrEqual(lo, p)    => Some((p, lo))
    case LessThan(lo, p)           => Some((p, lo))
    case _ => None
  }

  private def upperBound(e: Expression): Option[(Expression, Expression)] = e match {
    case LessThanOrEqual(p, hi)    => Some((p, hi))
    case LessThan(p, hi)           => Some((p, hi))
    case GreaterThanOrEqual(hi, p) => Some((p, hi))
    case GreaterThan(hi, p)        => Some((p, hi))
    case _ => None
  }

  private def numeric(e: Expression): Boolean = e.dataType match {
    case _: NumericType => true
    case _ => false
  }

  private def bin(e: Expression, binSize: Double): Expression =
    Floor(Divide(Cast(e, DoubleType), Literal(binSize, DoubleType)))

  private def rewrite(j: Join, cond: Expression, binSize: Double): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    // an equi conjunct means the planner already has a hash key (and
    // marks our own output, keeping the rule idempotent)
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) =>
        (a.references.subsetOf(j.left.outputSet) && b.references.subsetOf(j.right.outputSet)) ||
        (a.references.subsetOf(j.right.outputSet) && b.references.subsetOf(j.left.outputSet))
      case _ => false
    }
    if (hasEqui) return None

    // find a (point, lo, hi) triple with point fully on one side and
    // both bounds fully on the other
    val pairs = for {
      cl <- conjuncts; (p1, lo) <- lowerBound(cl).toSeq
      cu <- conjuncts; (p2, hi) <- upperBound(cu).toSeq
      if p1.semanticEquals(p2) && p1.deterministic && lo.deterministic && hi.deterministic
      if numeric(p1) && numeric(lo) && numeric(hi)
    } yield (p1, lo, hi)

    val triple = pairs.collectFirst {
      case (p, lo, hi)
        if p.references.subsetOf(j.left.outputSet) &&
           lo.references.subsetOf(j.right.outputSet) &&
           hi.references.subsetOf(j.right.outputSet) => (p, lo, hi, true)
      case (p, lo, hi)
        if p.references.subsetOf(j.right.outputSet) &&
           lo.references.subsetOf(j.left.outputSet) &&
           hi.references.subsetOf(j.left.outputSet) => (p, lo, hi, false)
    }

    triple.map { case (p, lo, hi, pointOnLeft) =>
      val (pointPlan0, intervalPlan0) = if (pointOnLeft) (j.left, j.right) else (j.right, j.left)

      val binAlias = Alias(bin(p, binSize), "__graft_bin")()
      val pointPlan = Project(pointPlan0.output :+ binAlias, pointPlan0)

      val loBin = bin(lo, binSize)
      val hiBin = bin(hi, binSize)
      // Sequence is timezone-aware (for timestamp ranges): an optimizer
      // rule must hand it the session zone itself or the plan
      // de-resolves. The If's else branch must match Sequence's exact
      // array type (containsNull = false) for the same reason.
      val seq = new Sequence(loBin, hiBin, Literal(1L, LongType))
        .withTimeZone(conf.sessionLocalTimeZone)
      val safeSeq = If(LessThanOrEqual(loBin, hiBin), seq,
        Literal.create(Seq.empty[Long], ArrayType(LongType, containsNull = false)))
      val ibin = AttributeReference("__graft_ibin", LongType, nullable = false)()
      val intervalPlan = Generate(Explode(safeSeq), Nil, outer = false, None, Seq(ibin), intervalPlan0)

      val (newLeft, newRight) =
        if (pointOnLeft) (pointPlan, intervalPlan) else (intervalPlan, pointPlan)
      val newCond = And(EqualTo(binAlias.toAttribute, ibin), cond)
      Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), j.hint))
    }
  }
}
