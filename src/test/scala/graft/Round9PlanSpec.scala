package graft

/** Round-9 verdict item 1: the single-partition-window lock, made
  * REGISTRY-WIDE. Round8PlanSpec locks the named global-rank family;
  * this spec executes EVERY query in `SparkEntry.queries` at sf0.001
  * and walks its final physical plan (AQE stages, cached relations,
  * subqueries — the shared [[PlanWindows]] walker, negative-control-
  * proven in Round8PlanSpec). An unpartitioned Window may appear ONLY
  * in a query whitelisted here with its bounded-grid justification —
  * and the whitelist is EXACT-MATCH in both directions, so a stale
  * entry (a query that migrates off its window, or is deleted) fails
  * the spec just like a new offender does.
  */
class Round9PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Queries whose unpartitioned windows run over a frame bounded by
    * a DOMAIN, never by the data (SCALING.md's E152 clause) — each
    * with the grid and its ceiling. Calendar grids grow with wall-
    * clock time, not corpus volume: an hourly grid is ~9k rows/year,
    * a daily one ~365 — both microscopic at any data scale. The
    * cents grid is bounded by the price DOMAIN (≤ ~10⁶ distinct
    * rounded cents for any bounded price range). The isotonic/
    * skyline frames are algorithm-bounded (fixed bucket count /
    * Pareto frontier of a bounded-cardinality quality pair).
    */
  private val boundedGrid: Map[String, String] = Map(
    "a43_max_drawdown" -> "daily close grid (~365 rows/year)",
    "t_gap_fill" -> "hourly calendar spine (~9k rows/year)",
    "a30_ks_test" -> "distinct rounded-cents grid (price domain)",
    "w11_rolling_range" -> "daily grid, rangeBetween -6..0 (~365/yr)",
    "t_incident_episodes" -> "hourly calendar grid",
    "t_cusum_shift" -> "hourly calendar grid",
    "t_cumulative_users" -> "hourly calendar grid",
    "t_rolling_corr" -> "hourly calendar grid, rows -23..0",
    "t_autocorrelation" -> "hourly calendar grid",
    "t_record_breaks" -> "hourly calendar grid",
    "t_runs_test" -> "hourly calendar grid",
    "a36_survival_km" -> "distinct duration-hours grid (calendar-bounded)",
    "a52_nelson_aalen" -> "distinct duration-hours grid (calendar-bounded)",
    "a37_logrank" -> "distinct duration-hours grid (calendar-bounded)",
    "tx31_skyline" -> "Pareto frontier of the (d1,d2) grid (quality-domain-bounded)",
    "tx38_isotonic_calibration" -> "fixed 64-bucket score grid",
    "t_theil_sen" -> "hourly calendar grid index + calendar²-bounded pair-slope rank (~40M/yr² ceiling; monthly grid or pair-sampling past that)",
    "a74_sprt" -> "hourly calendar grid cumulative walk (~9k rows/year)",
    "t_ljung_box" -> "hourly calendar grid, 12 row-lag passes",
    "a76_hodges_lehmann" -> "24·25/2 = 300-pair Walsh grid rank (hod-grid-bounded)",
    "a77_cramer_von_mises" -> "distinct rounded-cents grid (price domain)",
    "t_pettitt" -> "hourly calendar grid index + running rank sum (~9k rows/year)",
    "t_forecast_skill" -> "hourly calendar grid, two row-lag passes")
  // t_pacf's lag windows run at CONSTRUCTION time (the ρ stats are
  // collected before the driver-side DL recursion), so its final plan
  // carries no Window — the walker sees the bounded calendar-grid
  // passes only through t_autocorrelation/t_ljung_box, which share
  // the identical formulation and ARE whitelisted.

  test("registry-wide: unpartitioned Windows appear EXACTLY in the bounded-grid whitelist") {
    val names = SparkEntry.queries.keys.toSeq.sorted
    val withWindow = scala.collection.mutable.LinkedHashSet[String]()
    names.foreach { q =>
      val df = SparkEntry.queries(q)(spark, sf)
      df.collect() // finalize AQE so stage plans are the real ones
      if (PlanWindows.windows(df.queryExecution.executedPlan).nonEmpty)
        withWindow += q
      PlanWindows.releaseAll()
      spark.catalog.clearCache()
    }
    val offenders = withWindow.toSet -- boundedGrid.keySet
    val stale = boundedGrid.keySet -- withWindow
    assert(offenders.isEmpty,
      "unpartitioned Window (single-task funnel) outside the bounded-grid " +
        s"whitelist: ${offenders.toSeq.sorted.mkString(", ")} — migrate onto " +
        "ops/Rank or document the grid's DOMAIN ceiling here")
    assert(stale.isEmpty,
      "stale whitelist entries (no unpartitioned Window found — remove them " +
        s"so the lock stays tight): ${stale.toSeq.sorted.mkString(", ")}")
  }
}
