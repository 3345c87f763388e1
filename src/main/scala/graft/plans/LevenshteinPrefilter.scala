package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: guard `levenshtein(a, b) <= k` filters with the cheap
  * necessary condition `abs(length(a) - length(b)) <= k`.
  *
  * Levenshtein distance is at least the length difference of its inputs,
  * so the guard is implied by the predicate — the rewrite never changes
  * results; it only lets rows whose lengths already disqualify them skip
  * the O(m·n) dynamic-programming kernel. At 100 TB fuzzy-dedup scale
  * (edit-distance verify over banding candidates) the guard turns most
  * candidate evaluations into two length reads. This is the engine's
  * demonstration of the custom `Rule[LogicalPlan]` extension path
  * (builder brief (c)); the rewrite pattern is the classic length-filter
  * from approximate-string-matching literature.
  *
  * Idempotent by construction (safe under the optimizer's fixed-point
  * batch): a predicate is only rewritten when its filter does not already
  * sit on top of the guard it would introduce.
  */
object LevenshteinPrefilter extends Rule[LogicalPlan] {

  private def guardFor(lev: Levenshtein, k: Expression): Expression =
    LessThanOrEqual(Abs(Subtract(Length(lev.left), Length(lev.right))), k)

  private def alreadyGuarded(child: LogicalPlan, lev: Levenshtein): Boolean =
    child match {
      case Filter(LessThanOrEqual(Abs(Subtract(Length(a), Length(b), _), _), _), _) =>
        a.semanticEquals(lev.left) && b.semanticEquals(lev.right)
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond @ LessThanOrEqual(lev: Levenshtein, k: Literal), child)
        if !alreadyGuarded(child, lev) =>
      Filter(cond, Filter(guardFor(lev, k), child))
  }
}
