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
  * Once enabled the rule is SESSION-GLOBAL: every later inner
  * point-in-interval join with no equi key re-plans through it.
  * Choose binSize near the typical interval width: intervals spanning
  * k bins fan out k rows.
  *
  * WIDE-INTERVAL FAIL-SOFT (`spark.graft.rangeJoin.maxBins`, default
  * 4096): an interval spanning more than maxBins bins — a catch-all
  * band like q19's `1e9` upper bound — would fan out unboundedly and
  * can exceed the Sequence array-size limit outright. Instead of
  * exploding those rows, the rewrite SPLITS the interval side:
  * intervals within the cap take the binned equi-join, wider ones
  * keep the original nested-loop join on the (filtered, by
  * construction tiny) remainder, and the two branches union. Results
  * are exact either way; a plan with zero wide intervals pays only an
  * extra scan of the interval side's filter. Set maxBins <= 0 to
  * disable the split and always explode.
  *
  * Fires only on INNER joins whose condition has a point-in-interval
  * conjunct pair and NO equi conjunct (anything with an equi key
  * already hash-joins; the rewritten binned join itself carries one,
  * and the wide-fallback join is recognized by its marker filter —
  * both make the rule idempotent under fixed-point batches).
  */
object BinnedRangeJoin extends Rule[LogicalPlan] with PredicateHelper {

  val BinSizeKey = "spark.graft.rangeJoin.binSize"
  val MaxBinsKey = "spark.graft.rangeJoin.maxBins"

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

    val cap = try conf.getConfString(MaxBinsKey, "4096").toLong
              catch { case _: NumberFormatException => 4096L }

    triple.flatMap { case (p, lo, hi, pointOnLeft) =>
      val (pointPlan0, intervalPlan0) = if (pointOnLeft) (j.left, j.right) else (j.right, j.left)

      val loBin = bin(lo, binSize)
      val hiBin = bin(hi, binSize)
      // wide-fallback marker: the filter this rule itself puts under
      // the nested-loop branch. Seeing it means THIS join is the
      // fallback of an earlier rewrite — leave it alone (idempotence).
      val widePred = GreaterThan(Subtract(hiBin, loBin), Literal(cap, LongType))
      val isWideFallback = cap > 0 && (intervalPlan0 match {
        case Filter(c, _) => c.semanticEquals(widePred)
        case _ => false
      })
      if (isWideFallback) None
      else Some {
        val binAlias = Alias(bin(p, binSize), "__graft_bin")()
        val pointPlan = Project(pointPlan0.output :+ binAlias, pointPlan0)

        // Sequence is timezone-aware (for timestamp ranges): an optimizer
        // rule must hand it the session zone itself or the plan
        // de-resolves. The If's else branch must match Sequence's exact
        // array type (containsNull = false) for the same reason.
        val seq = new Sequence(loBin, hiBin, Literal(1L, LongType))
          .withTimeZone(conf.sessionLocalTimeZone)
        val safeSeq = If(LessThanOrEqual(loBin, hiBin), seq,
          Literal.create(Seq.empty[Long], ArrayType(LongType, containsNull = false)))
        val ibin = AttributeReference("__graft_ibin", LongType, nullable = false)()
        // NULL bounds fail both branch filters, matching the original
        // join where a NULL bound satisfies no comparison
        val narrowSrc =
          if (cap > 0) Filter(LessThanOrEqual(Subtract(hiBin, loBin), Literal(cap, LongType)), intervalPlan0)
          else intervalPlan0
        val intervalPlan = Generate(Explode(safeSeq), Nil, outer = false, None, Seq(ibin), narrowSrc)

        val (newLeft, newRight) =
          if (pointOnLeft) (pointPlan, intervalPlan) else (intervalPlan, pointPlan)
        val newCond = And(EqualTo(binAlias.toAttribute, ibin), cond)
        val binned = Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), j.hint))
        if (cap <= 0) binned
        else {
          // intervals wider than the cap keep the original plan shape
          // on a filtered remainder; output order matches j.output on
          // both branches because child orientation is preserved
          val wideSrc = Filter(widePred, intervalPlan0)
          val (wl, wr) = if (pointOnLeft) (pointPlan0, wideSrc) else (wideSrc, pointPlan0)
          Union(Seq(binned, Join(wl, wr, Inner, Some(cond), j.hint)))
        }
      }
    }
  }
}
