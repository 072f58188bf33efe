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

  private[graft] def allNodes(p: SparkPlan,
      seen: java.util.IdentityHashMap[SparkPlan, AnyRef])
      : Seq[SparkPlan] = {
    // identity-dedupe: a reused exchange/query stage is referenced from
    // several parents; visiting it once per parent would double-count
    // its spill metric
    if (seen.containsKey(p)) return Nil
    seen.put(p, None)
    val inner = p match {
      case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan, seen)
      case q: QueryStageExec => allNodes(q.plan, seen)
      case other => other.children.flatMap(allNodes(_, seen))
    }
    val subs = p.subqueries.flatMap(allNodes(_, seen))
    (p +: inner) ++ subs
  }

  /** Executes `df`'s OWN QueryExecution — NOT a derived plan the way
    * `df.count()` does (count compiles a new `groupBy().count()` query,
    * leaving the original tree unexecuted, its metrics zero and its
    * adaptive plan non-final). Use before reading [[spillBytes]] or
    * rendering the AQE-final plan of the exact query. */
  def executeOwnPlan(df: DataFrame): Unit = {
    df.queryExecution.toRdd.count()
    ()
  }

  /** Total bytes spilled (memory + disk) across every node of the last
    * execution of `df`. Call AFTER an action has run THIS dataframe's
    * own plan (see [[executeOwnPlan]]; a bare `df.count()` runs a
    * different QueryExecution and leaves these metrics untouched). */
  def spillBytes(df: DataFrame): Long =
    allNodes(df.queryExecution.executedPlan,
      new java.util.IdentityHashMap[SparkPlan, AnyRef]())
      .flatMap(_.metrics)
      .collect {
        case (name, m)
            if name.toLowerCase.contains("spill") &&
              m.metricType == "size" =>
          math.max(0L, m.value)
      }
      .sum
}
