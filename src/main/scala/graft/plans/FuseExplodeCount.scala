package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Coalesce, Explode, Literal, Size}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Generate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer exemplar (SURVEY §4: "a Rule[LogicalPlan] that rewrites
  * explode(split(...)) + count into a combined generator-aggregate would
  * be optimization-only, not semantics").
  *
  * Rewrites
  *   Aggregate(count(*)) ← [Project] ← Generate(explode(arr), outer=false)
  * into
  *   Aggregate(coalesce(sum(coalesce(size(arr), 0)), 0))
  *
  * i.e. "how many tokens in total" no longer materializes one row per
  * token: the generator disappears and each input row contributes its
  * array size. On a 100 TB corpus with ~500 tokens/doc this removes a
  * 500× row blowup ahead of the aggregate.
  *
  * Safety conditions:
  *  - global aggregate (no grouping) whose only aggregate is an
  *    UNFILTERED count(1)/count(*) — counting all rows, so generator
  *    OUTPUT is irrelevant; a FILTER clause disqualifies the rewrite;
  *  - explode (not posexplode/inline), outer = false: explode emits
  *    exactly size(arr) rows; size is built with legacySizeOfNull=false
  *    so size(null) = NULL -> coalesce(size, 0) = 0, config-independent;
  *  - outer coalesce(..., 0) preserves count()'s value (0, never null)
  *    on an empty input relation.
  *
  * Injected via [[graft.functions.GraftExtensions]] (injectOptimizerRule).
  */
object FuseExplodeCount extends Rule[LogicalPlan] {

  private def isCountStar(e: AggregateExpression): Boolean = e match {
    // filter must be None: count(*) FILTER (WHERE p) counts a subset of the
    // generated rows, which size(arr) cannot express — leave it untouched.
    case AggregateExpression(Count(Seq(Literal(1, _))), Complete, false, None, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(Nil, aggExprs, child, _) =>
      val counts = aggExprs.collect {
        case a @ Alias(ae: AggregateExpression, _) if isCountStar(ae) => a
      }
      // every output must be a count(*) alias for the rewrite to apply
      if (counts.size == aggExprs.size && counts.nonEmpty) {
        child match {
          case GenerateExplode(arr, genChild) =>
            // legacySizeOfNull = false pinned explicitly: under the legacy
            // setting size(null) = -1, which coalesce would pass through
            // (it only replaces NULL), corrupting the count by -1 per null
            // row. With false, size(null) = NULL -> coalesce -> 0, matching
            // explode's zero rows regardless of session config.
            val sizeExpr = Coalesce(Seq(Size(arr, legacySizeOfNull = false), Literal(0)))
            val sum = Coalesce(Seq(
              AggregateExpression(Sum(sizeExpr), Complete, isDistinct = false),
              Literal(0L)))
            Aggregate(Nil,
              counts.map(a => Alias(sum, a.name)(exprId = a.exprId)),
              genChild)
          case _ => agg
        }
      } else agg
  }

  /** Matches Generate(Explode(arr)) possibly under a Project that only
    * forwards child attributes (the DataFrame API inserts one). */
  private object GenerateExplode {
    def unapply(plan: LogicalPlan): Option[(org.apache.spark.sql.catalyst.expressions.Expression, LogicalPlan)] =
      plan match {
        case Generate(Explode(arr), _, false, _, _, genChild) =>
          Some((arr, genChild))
        case Project(projectList, Generate(Explode(arr), _, false, _, _, genChild))
            if projectList.forall(_.isInstanceOf[Attribute]) =>
          Some((arr, genChild))
        case _ => None
      }
  }
}
