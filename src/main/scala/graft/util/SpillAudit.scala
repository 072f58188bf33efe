package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Post-execution spill audit (round-5 VERDICT item 8): reads the
  * `spill`-class SQL metrics off the EXECUTED plan tree, so a query
  * that silently fell out of memory (sort/aggregate/join spill) is a
  * measurable fact, not a hunch from wall-clock noise. Synchronous —
  * metrics are populated by the time the action returns, unlike
  * listener-bus task metrics which arrive async.
  *
  * AQE wraps the real tree: `AdaptiveSparkPlanExec.executedPlan` holds
  * the final re-planned tree and `QueryStageExec.plan` the
  * materialized stages — both are traversed, as are subqueries.
  */
object SpillAudit {

  private def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val inner = p match {
      case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
      case q: QueryStageExec => allNodes(q.plan)
      case other => other.children.flatMap(allNodes)
    }
    val subs = p.subqueries.flatMap(allNodes)
    (p +: inner) ++ subs
  }

  /** Total bytes spilled (memory + disk) across every node of the last
    * execution of `df`. Call AFTER an action has run the plan. */
  def spillBytes(df: DataFrame): Long =
    allNodes(df.queryExecution.executedPlan)
      .flatMap(_.metrics)
      .collect {
        case (name, m)
            if name.toLowerCase.contains("spill") &&
              m.metricType == "size" =>
          math.max(0L, m.value)
      }
      .sum
}
