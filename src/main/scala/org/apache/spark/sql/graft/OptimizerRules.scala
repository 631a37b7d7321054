package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{Expression,
  GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Levenshtein,
  Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rewrite: unbounded `levenshtein(a, b) ≤ k` comparisons →
  * Spark's banded THRESHOLDED form `levenshtein(a, b, k) ≥ 0`.
  *
  * Why this is an optimizer rule and not a coding convention: the naive
  * spelling is what analysts and migrated SQL actually write, and the two
  * forms differ asymptotically, not by constants — full Levenshtein fills
  * the whole O(n·m) DP matrix per pair, while the thresholded kernel walks
  * only the 2k+1 band (O(k·min(n,m))) and bails out early, returning −1
  * the moment the band proves distance > k. On a fuzzy-join verify step at
  * 100 TB the predicate runs once per CANDIDATE PAIR, so the band is the
  * difference between a comparison that costs ~2·k·n cells and one that
  * costs n·m (~50× at k=2 over 100-char strings — join_fuzzy's measured
  * motivation, here applied automatically to the naive spelling).
  *
  * Rewrite table (d = true distance, t = thresholded result; t = −1 iff
  * d > threshold, else t = d):
  *   d ≤ k  ⟺  levenshtein(a,b,k)   ≥ 0          (k ≥ 0)
  *   d <  k  ⟺  levenshtein(a,b,k−1) ≥ 0          (k ≥ 1)
  * plus the mirrored literal-first spellings. NULL inputs: both forms
  * yield NULL, and a NULL comparison stays NULL — semantics identical.
  * `d ≤ k` is NOT rewritten to `levenshtein(a,b,k) ≤ k` — the sentinel −1
  * would satisfy that comparison and silently admit every far pair (the
  * exact bug class an optimizer rule must be tested against; EdgeCasesSpec
  * pins a far-pair corpus through both forms).
  *
  * Registered two ways, same rule object: injected into live sessions via
  * the public `spark.experimental.extraOptimizations` hook (what the
  * registered row does) and via [[GraftExtensions]]'
  * `injectOptimizerRule` for `spark.sql.extensions`-configured SQL-only
  * deployments. The rule is a pure expression transform — no plan-shape
  * changes, so it composes with every other optimizer batch.
  */
object ThresholdLevenshtein extends Rule[LogicalPlan] {
  private def banded(a: Expression, b: Expression, k: Int): Expression =
    GreaterThanOrEqual(Levenshtein(a, b, Some(Literal(k))), Literal(0))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case LessThanOrEqual(Levenshtein(a, b, None), Literal(k: Int, IntegerType))
          if k >= 0 => banded(a, b, k)
      case GreaterThanOrEqual(Literal(k: Int, IntegerType), Levenshtein(a, b, None))
          if k >= 0 => banded(a, b, k)
      case LessThan(Levenshtein(a, b, None), Literal(k: Int, IntegerType))
          if k >= 1 => banded(a, b, k - 1)
      case GreaterThan(Literal(k: Int, IntegerType), Levenshtein(a, b, None))
          if k >= 1 => banded(a, b, k - 1)
    }

  /** Idempotent install into a live session through the public
    * experimental-methods hook. */
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
}
