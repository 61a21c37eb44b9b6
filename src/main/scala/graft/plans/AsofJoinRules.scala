package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, AttributeSet, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rules restoring Catalyst's pruning/pushdown THROUGH the
  * custom [[AsofJoinNode]] — a custom logical node is opaque to
  * ColumnPruning and PushDownPredicates, so without these rules a
  * 40-column table under a 4-column as-of projection still scans all
  * 40 columns: exactly the "filter pushed? columns pruned?" failure
  * the 100 TB lens flags. Injected via
  * `SparkSessionExtensions.injectOptimizerRule` (fixed-point batch;
  * both rules are no-ops once applied — the `eq` guards).
  *
  * Soundness:
  *  - Column pruning: the node only NEEDS its key/ts attributes plus
  *    whatever the parent projection references; children shrink to
  *    that set (never below key/ts).
  *  - Filter pushdown: as-of output is 1:1 with LEFT rows (left-outer
  *    semantics), and a row's match depends only on its own (key, ts)
  *    — so a conjunct referencing ONLY left columns commutes with the
  *    join and pushes into the left child. Right-side conjuncts do
  *    NOT commute (they'd turn null-extension into row loss) and stay
  *    above.
  */
object AsofJoinPruning extends Rule[LogicalPlan] with PredicateHelper {

  private def needed(a: AsofJoinNode, refs: AttributeSet): AttributeSet =
    refs ++ AttributeSet(Seq(a.leftKey, a.rightKey, a.leftTs, a.rightTs))

  private def prune(child: LogicalPlan, keep: AttributeSet): LogicalPlan = {
    val kept = child.output.filter(keep.contains)
    if (kept.size == child.output.size) child else Project(kept, child)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(_, a: AsofJoinNode) =>
      val keep = needed(a, p.references)
      val (nl, nr) = (prune(a.left, keep), prune(a.right, keep))
      if ((nl eq a.left) && (nr eq a.right)) p
      else p.copy(child = a.copy(left = nl, right = nr))

    case f @ Filter(cond, a: AsofJoinNode) =>
      val (leftOnly, rest) = splitConjunctivePredicates(cond)
        .partition(c => c.references.subsetOf(a.left.outputSet) &&
          c.deterministic)
      if (leftOnly.isEmpty) f
      else {
        val pushed = a.copy(left = Filter(leftOnly.reduce(And), a.left))
        if (rest.isEmpty) pushed else Filter(rest.reduce(And), pushed)
      }
  }
}
