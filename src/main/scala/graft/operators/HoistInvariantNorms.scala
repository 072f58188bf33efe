package graft.operators

import graft.functions.DotProduct
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference,
  ExprId, NamedExpression}
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Custom Catalyst optimization: hoist join-invariant squared norms out
  * of post-join projections.
  *
  * Every cosine computed above a join — the shape of all the
  * brute-force / candidate-rerank similarity operators — expands to
  * `dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b)))`, and Spark evaluates
  * the whole expression once per JOINED ROW. But `dot(a,a)` only
  * depends on one side: a Q×N candidate join performs 3·Q·N
  * dim-length dot products where Q·N + Q + N suffice. This rule
  * rewrites
  *
  * {{{ Project[... dot(x,x) ...](Join(L, R)) }}}
  *
  * to compute each side-invariant `dot(x,x)` in a projection UNDER the
  * join (where it runs once per side row) and references the result
  * above — identical IEEE arithmetic, ~3× less vector math on the
  * pair-scoring stage. `CollapseProject` then merges the injected
  * projection into the side's existing one, so the plan gains no extra
  * operator.
  *
  * Scope: Inner and Cross joins (every similarity operator in the
  * engine); `x` must be a direct attribute of exactly one side. The
  * rewrite removes the matched pattern from the post-join projection,
  * so the rule is idempotent under the optimizer's fixed point.
  * Registered via [[graft.GraftExtensions]] (`injectOptimizerRule`,
  * the `spark.sql.extensions` deployment path) and
  * [[graft.GraftCatalog.install]] (`experimental.extraOptimizations`,
  * the imperative per-session path).
  */
object HoistInvariantNorms extends Rule[LogicalPlan] {

  private val Marker = "__graft_normsq"

  private def selfDots(exprs: Seq[NamedExpression])
      : Seq[AttributeReference] =
    exprs.flatMap(_.collect {
      case DotProduct(a: AttributeReference, b: AttributeReference)
          if a.exprId == b.exprId => a
    }).groupBy(_.exprId).map(_._2.head).toSeq

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projectList, j @ Join(left, right, jt, _, _))
        if (jt == Inner || jt == Cross) && selfDots(projectList).nonEmpty =>
      val leftOut = left.outputSet
      val rightOut = right.outputSet
      val byAttr: Map[ExprId, (AttributeReference, Boolean)] =
        selfDots(projectList).flatMap { a =>
          if (leftOut.contains(a)) Some(a.exprId -> (a, true))
          else if (rightOut.contains(a)) Some(a.exprId -> (a, false))
          else None
        }.toMap
      if (byAttr.isEmpty) p
      else {
        val aliases: Map[ExprId, Alias] = byAttr.map {
          case (id, (a, _)) =>
            id -> Alias(DotProduct(a, a), s"${Marker}_${a.name}")()
        }
        def withNorms(side: LogicalPlan, wantLeft: Boolean): LogicalPlan = {
          val mine = byAttr.collect {
            case (id, (_, isLeft)) if isLeft == wantLeft => aliases(id)
          }.toSeq
          if (mine.isEmpty) side
          else Project(side.output ++ mine, side)
        }
        val substituted = projectList.map(_.transform {
          case DotProduct(a: AttributeReference, b: AttributeReference)
              if a.exprId == b.exprId && byAttr.contains(a.exprId) =>
            aliases(a.exprId).toAttribute
        }.asInstanceOf[NamedExpression])
        Project(substituted,
          j.copy(left = withNorms(left, wantLeft = true),
            right = withNorms(right, wantLeft = false)))
      }
  }
}
