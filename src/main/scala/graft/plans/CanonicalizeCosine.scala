package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graft.CosineSimilarity

/** Optimizer rule: canonicalize the argument order of the commutative
  * `cosine_sim(a, b)` so syntactically different but equivalent calls
  * (`cosine_sim(x, y)` vs `cosine_sim(y, x)`) become identical expression
  * trees — which lets Catalyst's common-subexpression elimination and
  * plan/cache matching recognize them as one computation.
  *
  * Safe to the bit: the kernel multiplies x_i·y_i element-wise and the
  * two norm accumulators are symmetric, so swapping operands produces the
  * identical double result (IEEE multiplication is commutative).
  *
  * Ordering key is the deterministic semanticHash of each child (stable
  * across plans, insensitive to cosmetic differences like capitalization
  * of attribute names). */
object CanonicalizeCosine extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case cs @ CosineSimilarity(l, r)
          if l.semanticHash() > r.semanticHash() =>
        cs.copy(left = r, right = l)
    }
}
