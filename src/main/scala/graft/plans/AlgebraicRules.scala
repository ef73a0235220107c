package graft.plans

import graft.functions.{DotProduct, SquaredNorm}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Algebraic rewrites over the library's own expressions, injected as
  * optimizer rules via [[GraftExtensions]] — the same mechanism
  * Catalyst's built-in simplifications use, extended to the custom
  * kernel vocabulary.
  *
  * `dot_product(x, x)` is `squared_norm(x)`: the self-dot shows up
  * naturally when similarity formulas are assembled generically (a
  * cosine against a candidate list that happens to include the query
  * itself, or norm terms written as dots), and the rewrite halves the
  * array traffic — one operand read instead of two — inside the same
  * codegen'd loop. The match is on `semanticEquals`, so it fires for
  * alias-equivalent operands, not just syntactic copies.
  */
object DotSelfToNorm extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case DotProduct(a, b) if a.semanticEquals(b) => SquaredNorm(a)
    }
}
