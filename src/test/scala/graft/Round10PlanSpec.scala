package graft

import org.apache.spark.sql.functions._

/** Round-10 verdict ask 8: the SECOND registry-wide lock class —
  * unbounded global sorts. The window lock (Round9PlanSpec) catches
  * single-task Window funnels; the analogous scale-killer is a global
  * `orderBy` whose output feeds further computation instead of a
  * `limit`/`TakeOrderedAndProject` or the final presentation: a range
  * exchange of an interior row stream is a full-data shuffle PLUS a
  * driver-side range-boundary sampling job, and at 100 TB it is the
  * slowest operator in any plan it appears in.
  *
  * Every registry query ends with a total ORDER BY (the driver's
  * oracle compare hashes sorted rows), so the ROOT sort is required
  * and exempt — it orders the final bounded grid/histogram, not the
  * data. The lock therefore fires on INTERIOR global sorts only
  * (PlanWindows.interiorGlobalSorts), with the same two-direction
  * exact-match whitelist discipline as the window lock: an offender
  * must be listed with its bounded-grid justification, and a stale
  * entry fails the spec.
  */
class Round10PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Queries with a justified interior global sort. Empty today: the
    * registry's interior orderings all ride local sorts (SortMergeJoin,
    * window child sorts, Rank's range exchange + sortWithinPartitions)
    * or TakeOrderedAndProject. Keep it that way.
    */
  private val boundedInterior: Map[String, String] = Map.empty

  test("negative control: an interior global sort IS caught by the walker") {
    import spark.implicits._
    // order-sensitive aggregate over a global orderBy: EliminateSorts
    // must keep the sort (collect_list is order-dependent), and it
    // sits under the Aggregate — interior, not presentation
    val df = Seq((3, "c"), (1, "a"), (2, "b")).toDF("k", "s")
      .orderBy("k").agg(collect_list("s").as("xs"))
    df.collect()
    val interior = PlanWindows.interiorGlobalSorts(df.queryExecution.executedPlan)
    assert(interior.nonEmpty,
      "walker failed to catch a known interior global sort — the lock is dead")
    // ...and the presentation sort alone is NOT flagged
    val ok = Seq((3, 1), (1, 2)).toDF("k", "v").groupBy("k")
      .agg(sum("v").as("sv")).orderBy("k")
    ok.collect()
    assert(PlanWindows.interiorGlobalSorts(ok.queryExecution.executedPlan).isEmpty,
      "presentation-only sort must not be flagged")
  }

  test("registry-wide: interior global sorts appear EXACTLY in the whitelist") {
    val names = SparkEntry.queries.keys.toSeq.sorted
    val withSort = scala.collection.mutable.LinkedHashSet[String]()
    names.foreach { q =>
      val df = SparkEntry.queries(q)(spark, sf)
      df.collect() // finalize AQE so stage plans are the real ones
      if (PlanWindows.interiorGlobalSorts(df.queryExecution.executedPlan).nonEmpty)
        withSort += q
      PlanWindows.releaseAll()
      spark.catalog.clearCache()
    }
    val offenders = withSort.toSet -- boundedInterior.keySet
    val stale = boundedInterior.keySet -- withSort
    assert(offenders.isEmpty,
      "interior global sort (full range-exchange mid-pipeline) outside the " +
        s"whitelist: ${offenders.toSeq.sorted.mkString(", ")} — replace with " +
        "a local sort / TakeOrdered, or document the grid's DOMAIN ceiling here")
    assert(stale.isEmpty,
      "stale whitelist entries (no interior global sort found — remove them " +
        s"so the lock stays tight): ${stale.toSeq.sorted.mkString(", ")}")
  }
}
