package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Catalyst optimizer rule: put a cheap LENGTH-RATIO prune in front of
  * expensive exact-Jaccard filters.
  *
  * For sorted-distinct sets, |A∩B| ≤ min(|A|,|B|) and |A∪B| ≥
  * max(|A|,|B|), so jaccard(A,B) ≤ min/max — a filter
  * `jaccardSorted(a,b) >= t` can only pass rows where
  * `size(a) >= t·size(b)` AND `size(b) >= t·size(a)`. The rule
  * rewrites such filters to evaluate the two integer size compares
  * first (codegen'd, O(1)) so the O(|A|+|B|) merge-intersection runs
  * only on length-compatible pairs — the optimizer-rule form of the
  * hand-written prefilters the dedup pipelines carry, applied
  * automatically to ANY query using the expression.
  *
  * Semantics-preserving: the added conjunct is a necessary condition
  * of the original one. A 1e-9 slack absorbs the double rounding of
  * `t·size` so an exact-boundary pair (jac == t == min/max) is never
  * pruned. The rule is a no-op on compares it has already rewritten —
  * it matches the injected shape itself (an And pairing the compare
  * with size() of the compare's own arguments), so it is idempotent
  * under the optimizer's fixpoint loop while unrelated user size()
  * conjuncts don't suppress the prune.
  *
  * Registered per session via [[SetExprs.register]]
  * (experimental.extraOptimizations) or cluster-wide with
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
object JaccardLengthPrune extends Rule[LogicalPlan] {

  private val Slack = Literal(1e-9, DoubleType)

  private def sizeOf(e: Expression): Expression =
    Cast(Size(e, legacySizeOfNull = false), DoubleType)

  /** size(x) + slack >= t * size(y) */
  private def ratioOk(x: Expression, t: Literal, y: Expression): Expression =
    GreaterThanOrEqual(Add(sizeOf(x), Slack), Multiply(t, sizeOf(y)))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      // Idempotency guard, matched against the exact injected shape: a
      // jaccard compare is skipped only when it already sits as the
      // right leg of an And whose left leg is the pair of ratio
      // conjuncts built below — `size(x)+slack >= t·size(y)` over the
      // jaccard's OWN arguments. A user `size(...)` conjunct — even
      // `size(a) > 5 AND jaccard(a,b) >= t`, which also puts a Size
      // beside the compare — must not suppress the prune.
      def isInjectedRatio(e: Expression, j: JaccardSortedLong): Boolean = e match {
        case GreaterThanOrEqual(
            Add(Cast(sa: Size, DoubleType, _, _), _, _),
            Multiply(_, Cast(sb: Size, DoubleType, _, _), _)) =>
          Seq(sa, sb).forall(s =>
            s.child.semanticEquals(j.left) || s.child.semanticEquals(j.right))
        case _ => false
      }
      def alreadyPruned(ge: GreaterThanOrEqual, j: JaccardSortedLong): Boolean =
        cond.exists {
          case And(And(r1, r2), inner) if inner fastEquals ge =>
            isInjectedRatio(r1, j) && isInjectedRatio(r2, j)
          case _ => false
        }
      // transformUp, NOT transformDown: the replacement embeds the
      // matched node as a child, which transformDown would descend
      // into and match again, forever
      val rewritten = cond.transformUp {
        case ge @ GreaterThanOrEqual(j: JaccardSortedLong, t @ Literal(_: Double, DoubleType))
            if !alreadyPruned(ge, j) =>
          And(And(ratioOk(j.left, t, j.right), ratioOk(j.right, t, j.left)), ge)
      }
      if (rewritten fastEquals cond) f else Filter(rewritten, child)
  }
}

/** Catalyst optimizer rule: put a LENGTH-BAND prune in front of
  * expensive edit-distance filters — the [[JaccardLengthPrune]]
  * pattern generalized to the second expensive similarity predicate.
  *
  * Levenshtein distance is bounded below by the length difference
  * (every unmatched length unit costs at least one edit), so a filter
  * `levenshtein(a,b) <= t` can only pass rows where
  * `abs(length(a) - length(b)) <= t`. The rule evaluates the integer
  * band first (codegen'd, O(1)) so the O(|a|·|b|) DP matrix runs only
  * on length-compatible pairs — the hand-written prune
  * Dedup.qFuzzyNames carries, applied automatically to ANY filter
  * using the built-in expression. All-integer arithmetic: no slack
  * needed, exact-boundary pairs (distance == t) are never pruned.
  * Same idempotency discipline as the jaccard rule: the guard matches
  * the exact injected shape over the levenshtein's own arguments.
  */
object LevenshteinLengthPrune extends Rule[LogicalPlan] {

  private def lengthBand(l: Expression, r: Expression, t: Expression): Expression =
    LessThanOrEqual(Abs(Subtract(Length(l), Length(r))), t)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      def isInjectedBand(e: Expression, lev: Levenshtein): Boolean = e match {
        case LessThanOrEqual(Abs(Subtract(Length(x), Length(y), _), _), _) =>
          Seq(x, y).forall(c =>
            c.semanticEquals(lev.left) || c.semanticEquals(lev.right))
        case _ => false
      }
      def alreadyPruned(le: LessThanOrEqual, lev: Levenshtein): Boolean =
        cond.exists {
          case And(band, inner) if inner fastEquals le => isInjectedBand(band, lev)
          case _ => false
        }
      val rewritten = cond.transformUp {
        // Only the 2-arg form: levenshtein(a, b, th) returns the -1
        // sentinel when the distance exceeds th, so `lev3 <= t` can be
        // TRUE (via -1) for pairs whose lengths differ by more than t —
        // the band is NOT a necessary condition there and would prune
        // matching rows.
        case le @ LessThanOrEqual(lev: Levenshtein, t @ Literal(_, _))
            if lev.threshold.isEmpty && !alreadyPruned(le, lev) =>
          And(lengthBand(lev.left, lev.right, t), le)
      }
      if (rewritten fastEquals cond) f else Filter(rewritten, child)
  }
}

/** `spark.sql.extensions` entry point installing the graft optimizer
  * rules into every session of the cluster. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => JaccardLengthPrune)
    ext.injectOptimizerRule(_ => LevenshteinLengthPrune)
  }
}

object GraftExtensions {
  private val rules = Seq(JaccardLengthPrune, LevenshteinLengthPrune)

  /** Installs the rules into an already-running session (idempotent). */
  def install(spark: SparkSession): Unit =
    rules.foreach { r =>
      if (!spark.experimental.extraOptimizations.contains(r))
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+ r
    }
}
