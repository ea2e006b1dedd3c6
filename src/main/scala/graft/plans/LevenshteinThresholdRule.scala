package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Custom Catalyst OPTIMIZER RULE — the third extension tier next to
  * the codegen expressions and the TypedImperativeAggregates: a
  * semantics-preserving rewrite of bounded edit-distance predicates,
  * the hot comparison of fuzzy record linkage (`fuzzy_dup_pairs`).
  *
  *   `levenshtein(a, b) <= k`   (k a non-negative int literal)
  * becomes
  *   `abs(length(a) - length(b)) <= k AND levenshtein(a, b, k) >= 0`
  *
  * Two independent wins, both from published edit-distance practice:
  * the LENGTH GUARD short-circuits on the O(1) lower bound
  * `|len(a)−len(b)| ≤ lev(a,b)` before any DP runs (the same
  * prefix-filtering family as `tfidf_sim_pairs`' df cap), and the
  * THRESHOLDED `levenshtein(a, b, k)` runs Spark's banded
  * O(k·min(m,n)) DP instead of the full O(m·n) table — at a
  * record-linkage join's scale (10⁶ candidate pairs × 10²-char
  * strings, k=2) that is a ~50× cut in comparison work, applied by the
  * PLANNER so every query with the predicate gets it without rewriting.
  *
  * Correctness, including 3VL: NULL inputs make both forms NULL (And
  * of two NULLs); a length gap > k forces the original predicate false
  * and the guard short-circuits false; otherwise the thresholded form
  * returns the true distance iff it is ≤ k (else −1), so `>= 0`
  * reproduces `<= k` exactly — LevenshteinRuleSpec pins the
  * equivalence on an adversarial grid (boundary distances, NULLs,
  * empty strings) and the rule's idempotency (the rewritten predicate
  * carries a threshold, so the pattern can't re-fire).
  *
  * Matched shapes: the bare comparison, its reversed form, and the
  * long-cast form the DataFrame API produces
  * (`levenshtein(a,b).cast("long") <= 2L`). Registered on any session
  * via [[graft.functions.GraftExtensions]] (`injectOptimizerRule`) or
  * mutably via `spark.experimental.extraOptimizations`.
  */
object LevenshteinThresholdRule extends Rule[LogicalPlan] {

  private def banded(lev: Levenshtein, k: Int): Expression = {
    val kLit = Literal(k)
    val lenGuard = LessThanOrEqual(
      Abs(Subtract(Length(lev.left), Length(lev.right))), kLit)
    And(lenGuard,
      GreaterThanOrEqual(Levenshtein(lev.left, lev.right, Some(kLit)),
        Literal(0)))
  }

  /** The rewrite on one predicate expression tree. */
  private[plans] def rewrite(cond: Expression): Expression = cond.transformUp {
    // levenshtein(a,b) <= k
    case LessThanOrEqual(lev @ Levenshtein(_, _, None),
        Literal(k: Int, IntegerType)) if k >= 0 =>
      banded(lev, k)
    // k >= levenshtein(a,b)
    case GreaterThanOrEqual(Literal(k: Int, IntegerType),
        lev @ Levenshtein(_, _, None)) if k >= 0 =>
      banded(lev, k)
    // cast(levenshtein(a,b) as bigint) <= kL — the DataFrame-API shape
    case LessThanOrEqual(Cast(lev @ Levenshtein(_, _, None), LongType, _, _),
        Literal(k: Long, LongType)) if k >= 0 && k <= Int.MaxValue =>
      banded(lev, k.toInt)
    case GreaterThanOrEqual(Literal(k: Long, LongType),
        Cast(lev @ Levenshtein(_, _, None), LongType, _, _))
        if k >= 0 && k <= Int.MaxValue =>
      banded(lev, k.toInt)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) =>
      val newCond = rewrite(cond)
      if (newCond.fastEquals(cond)) f else f.copy(condition = newCond)
    case j @ Join(_, _, _, Some(cond), _) =>
      val newCond = rewrite(cond)
      if (newCond.fastEquals(cond)) j else j.copy(condition = Some(newCond))
  }
}
