package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression,
  GreaterThanOrEqual, LessThan, LessThanOrEqual, Levenshtein, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite un-thresholded edit-distance comparisons to
  * the banded form.
  *
  *   levenshtein(l, r) <= k   →   levenshtein(l, r, k) >= 0
  *   levenshtein(l, r) <  k   →   levenshtein(l, r, k-1) >= 0
  *
  * The banded kernel is O(k·n) with early exit instead of O(n·m), and
  * returns -1 past the threshold — so "within k" is exactly ">= 0".
  * Nullability is preserved: NULL inputs make both sides NULL. This is
  * the fuzzy-join hot path (millions of candidate pairs per block, cf.
  * q44 measured 24s → 4s at sf0.1); users write the natural predicate
  * and the engine plans the banded one.
  *
  * Registered via [[GraftExtensions]] (injectOptimizerRule) or
  * `spark.experimental.extraOptimizations`.
  */
object BandedLevenshteinRule extends Rule[LogicalPlan] {

  /** Small thresholds go to the native allocation-free ASCII-banded
    * kernel ([[BandedEditDistance]], "within k" = `value <= k`); larger
    * ones to the builtin banded form ("within k" = `>= 0`). */
  private def banded(l: Expression, r: Expression, k: Int): Expression =
    if (k <= 16)
      LessThanOrEqual(BandedEditDistance(l, r, k), Literal(k))
    else
      GreaterThanOrEqual(Levenshtein(l, r, Some(Literal(k))), Literal(0))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case LessThanOrEqual(Levenshtein(l, r, None), Literal(k: Int, IntegerType))
          if k >= 0 =>
        banded(l, r, k)
      case GreaterThanOrEqual(Literal(k: Int, IntegerType), Levenshtein(l, r, None))
          if k >= 0 =>
        banded(l, r, k)
      case LessThan(Levenshtein(l, r, None), Literal(k: Int, IntegerType))
          if k >= 1 =>
        banded(l, r, k - 1)
    }
}
