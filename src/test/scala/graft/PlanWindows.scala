package graft

import org.apache.spark.sql.execution.{InputAdapter, ProjectExec, SortExec, SparkPlan, WholeStageCodegenExec}
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

  /** Every global SortExec in the plan (round-10 verdict ask 8's
    * second lock class). A global sort is a range-exchange of the
    * ENTIRE row stream — fine as the bounded presentation sort every
    * registry query ends with (outputs are grids/histograms/top-k; the
    * driver's oracle compare requires a total ORDER BY), a scale-killer
    * when a full fact table is range-shuffled mid-pipeline. Local
    * sorts (SortMergeJoin children, window child sorts,
    * sortWithinPartitions, Rank's per-partition sorts) have
    * `global = false` and are never collected; `orderBy().limit()`
    * plans as TakeOrderedAndProject, which contains no SortExec.
    */
  def globalSorts(p: SparkPlan): Seq[SortExec] = {
    val here = p match {
      case s: SortExec if s.global => Seq(s)
      case _ => Nil
    }
    val kids: Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case m: InMemoryTableScanExec => Seq(m.relation.cachedPlan)
      case o => o.children
    }
    here ++ (kids ++ p.subqueries).flatMap(globalSorts)
  }

  /** The presentation sort: the global SortExec reachable from the
    * root through output-shape-only wrappers (AQE, finalized stages,
    * codegen, projection). This is the one every query is REQUIRED to
    * have (deterministic oracle compare) and it sorts the final
    * bounded output — never an offender.
    */
  def rootSort(p: SparkPlan): Option[SortExec] = p match {
    case a: AdaptiveSparkPlanExec => rootSort(a.executedPlan)
    case q: QueryStageExec => rootSort(q.plan)
    case w: WholeStageCodegenExec => rootSort(w.child)
    case i: InputAdapter => rootSort(i.child)
    case pr: ProjectExec => rootSort(pr.child)
    case s: SortExec if s.global => Some(s)
    case _ => None
  }

  /** Global sorts that are NOT the presentation sort — the lock's
    * offender set: each one range-shuffles an interior row stream that
    * at 100 TB is unbounded unless the query can argue a grid ceiling.
    */
  def interiorGlobalSorts(root: SparkPlan): Seq[SortExec] = {
    val top = rootSort(root)
    globalSorts(root).filterNot(s => top.exists(_ eq s))
  }

  def releaseAll(): Unit = {
    graft.queries.DedupQueries.releaseSignatureCache()
    graft.queries.SimilarityQueries.releaseCaches()
    graft.queries.ParityQueries.releaseCaches()
    graft.queries.EventQueries.releaseCaches()
    graft.queries.TextQueries.releaseCaches()
  }
}
