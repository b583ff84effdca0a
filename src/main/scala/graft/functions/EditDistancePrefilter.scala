package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Injected optimizer rule: prefilter edit-distance predicates with the
  * length-difference lower bound.
  *
  * `levenshtein(a, b) <= k` costs O(|a|·|b|) per row. But edit distance
  * obeys `|length(a) - length(b)| <= levenshtein(a, b)` (each edit
  * changes the length by at most 1), so the rule rewrites
  *
  * {{{ levenshtein(a, b) <= k  ==>  abs(length(a) - length(b)) <= k
  *                                  AND levenshtein(a, b) <= k }}}
  *
  * The guard is O(1), sits first in the codegen'd short-circuit AND, and
  * skips the DP entirely for rows whose lengths already prove
  * non-matching — on a candidate-pair stream with heterogeneous lengths
  * that is most rows. The rewrite is an implication, not a heuristic:
  * whenever the original predicate is true the guard is true, and a NULL
  * input nulls both conjuncts, so three-valued logic is preserved
  * exactly.
  *
  * This is the engine's demonstration of preference-order (c) from the
  * build plan — `SparkSessionExtensions.injectOptimizerRule` — used
  * where it belongs: a provable algebraic rewrite the planner cannot
  * know, WITHOUT a custom physical operator (the built-ins express the
  * semantics; only the cost model needed help). Idempotent under the
  * optimizer's fixed-point batches: a Filter whose condition already
  * contains the guard is left untouched.
  */
object EditDistancePrefilter extends Rule[LogicalPlan] {

  private def guardFor(l: Expression, r: Expression, k: Expression): Expression =
    LessThanOrEqual(Abs(Subtract(Length(l), Length(r))), k)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) =>
      val newCond = cond.transformUp {
        case le @ LessThanOrEqual(Levenshtein(l, r, None), k: Literal)
            if !cond.exists(_.semanticEquals(guardFor(l, r, k))) =>
          And(guardFor(l, r, k), le)
      }
      if (newCond fastEquals cond) f else f.copy(condition = newCond)
  }
}
