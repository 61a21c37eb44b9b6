package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}

/** Shared physical-plan walker for the single-partition-window lock
  * (SCALING.md round-8 rule): collect every `WindowExec` /
  * `WindowGroupLimitExec` with an EMPTY partition spec, descending
  * into AQE wrappers, finalized query stages, cached-plan relations,
  * and (scalar/broadcast) subqueries — anywhere a window could hide.
  * Used by Round8PlanSpec (named-family lock + negative control) and
  * Round9PlanSpec (the registry-wide sweep).
  */
object PlanWindows {

  def windows(p: SparkPlan): Seq[SparkPlan] = {
    val here = p match {
      case w: WindowExec if w.partitionSpec.isEmpty => Seq(w)
      case w: WindowGroupLimitExec if w.partitionSpec.isEmpty => Seq(w)
      case _ => Nil
    }
    val kids: Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case m: InMemoryTableScanExec => Seq(m.relation.cachedPlan)
      case o => o.children
    }
    val subs = p.subqueries
    here ++ (kids ++ subs).flatMap(windows)
  }

  def releaseAll(): Unit = {
    graft.queries.DedupQueries.releaseSignatureCache()
    graft.queries.SimilarityQueries.releaseCaches()
    graft.queries.ParityQueries.releaseCaches()
    graft.queries.EventQueries.releaseCaches()
    graft.queries.TextQueries.releaseCaches()
  }
}
