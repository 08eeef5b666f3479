package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, IntegerLiteral, LessThan, LessThanOrEqual, PredicateHelper, RowNumber, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: plan `row_number() OVER (PARTITION BY g ORDER BY o)
  * <= k` filters as the bounded-heap [[TopKPerGroup]] operator.
  *
  * Users write the standard SQL idiom (window + rank filter); Spark's
  * own InferWindowGroupLimit (3.5+) bounds the per-group row count but
  * still plans Sort nodes on (partition, order) below the Window —
  * a full sort of every partition's data. This rule removes the Window
  * entirely: one hash shuffle on the group keys, a k-element heap per
  * group, O(n log k) and no sort — the difference that matters when a
  * hot group holds 10⁹ rows at 100 TB.
  *
  * Fires only when the rewrite is exactly equivalent:
  *  - single window expression, and it is ROW_NUMBER (rank/dense_rank
  *    can emit >k rows under ties — the heap cannot);
  *  - non-empty PARTITION BY (the heap exec is per-group, not global);
  *  - some conjunct bounds the rank above by a positive int literal.
  * All original conjuncts are kept as a residual filter above the new
  * node (e.g. `rn = 3` first bounds the heap at 3, then selects rank 3;
  * unrelated conjuncts filter exactly as before). Ties beyond the
  * ORDER BY are broken arbitrarily — precisely row_number's own
  * contract.
  */
object TopKRewriteRule extends Rule[LogicalPlan] with PredicateHelper {

  /** Heap state is O(groups·k) per task; past this bound a sort-based
    * plan is the safer default, so the rule declines to fire. */
  val MaxK = 10000

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond,
        Window(Seq(alias @ Alias(WindowExpression(RowNumber(), _), _)),
          partitionSpec, orderSpec, child, _))
        if partitionSpec.nonEmpty && orderSpec.nonEmpty =>
      val rn = alias.toAttribute
      val conjuncts = splitConjunctivePredicates(cond)
      val bound = conjuncts.flatMap(rankUpperBound(_, rn)) match {
        case Nil => None
        case bs => Some(bs.min)
      }
      bound match {
        case Some(k) if k >= 1 && k <= MaxK =>
          // WindowGroupLimit below the Window (inserted by Spark's own
          // InferWindowGroupLimit when this rule runs late) becomes
          // redundant: the heap IS the group limit. Strip it — but only
          // when it provably limits the SAME grouping/ordering at a
          // bound no tighter than k; anything else (a hand-built plan,
          // a future Spark inserting WGL elsewhere) keeps its node.
          val realChild = child match {
            case WindowGroupLimit(wp, wo, _, limit, grandChild)
                if limit >= k &&
                  wp.length == partitionSpec.length &&
                  wp.zip(partitionSpec).forall { case (a, b) => a.semanticEquals(b) } &&
                  wo.length == orderSpec.length &&
                  wo.zip(orderSpec).forall { case (a, b) => a.semanticEquals(b) } =>
              grandChild
            case other => other
          }
          // When this rule fires inside the operator-optimization batch
          // it can beat PushDownPredicates to the Window, and once the
          // child is the custom node stock pushdown no longer moves
          // partition-key conjuncts below it — losing scan pruning. Do
          // that split here: conjuncts over partition attributes only
          // (the exact condition under which pushing through a window
          // is semantics-preserving — dropping whole groups cannot
          // change ranks inside surviving groups) go below the heap,
          // where later batch iterations push them into the scan.
          val partAttrs = org.apache.spark.sql.catalyst.expressions.AttributeSet(
            partitionSpec.collect { case a: Attribute => a })
          val (pushable, residual) = conjuncts.partition { c =>
            c.deterministic && c.references.nonEmpty &&
              c.references.subsetOf(partAttrs)
          }
          val pushedChild =
            if (pushable.isEmpty) realChild
            else Filter(pushable.reduce(org.apache.spark.sql.catalyst.expressions.And), realChild)
          val topk = TopKPerGroup(k, partitionSpec,
            orderSpec, rn, pushedChild)
          if (residual.isEmpty) topk
          else Filter(residual.reduce(org.apache.spark.sql.catalyst.expressions.And), topk)
        case _ => f
      }
  }

  /** `k` such that the conjunct implies rank <= k, if it is a
    * comparison of the rank attribute with an int literal. */
  private def rankUpperBound(e: Expression, rn: Attribute): Option[Int] = e match {
    case LessThanOrEqual(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) => Some(k)
    case LessThan(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) => Some(k - 1)
    case EqualTo(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) => Some(k)
    case GreaterThanOrEqual(IntegerLiteral(k), a: Attribute) if a.semanticEquals(rn) => Some(k)
    case GreaterThan(IntegerLiteral(k), a: Attribute) if a.semanticEquals(rn) => Some(k - 1)
    case EqualTo(IntegerLiteral(k), a: Attribute) if a.semanticEquals(rn) => Some(k)
    case _ => None
  }
}
