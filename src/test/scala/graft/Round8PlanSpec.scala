package graft

import org.apache.spark.sql.execution.SparkPlan

/** Structural lock for the round-7 verdict's one scale-killer class:
  * a `Window` with an EMPTY partition spec plans as a single task and
  * funnels its whole input through one core — correct and fast at
  * sf0.1, dead at 100 TB. The six global-rank queries (plus sim12's
  * borderline lexical arm) were migrated onto ops/Rank (distributed
  * range-partitioned rank/prefix-sum) and TakeOrdered top-k; this
  * spec walks each EXECUTED plan — through AQE stages, cached
  * relations, and subqueries — and fails if any unpartitioned Window
  * node ever reappears (the a27/E152 discipline, made structural).
  */
class Round8PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  // the six migrated queries + sim12's borderline arm, plus the
  // born-clean ops/Rank consumers added since (tx42's data-scale
  // prefix sum, tx43's AUC grid) — every global-rank query the
  // registry has is locked here
  private val migrated = Seq("a38_mann_whitney", "w13_gini_mean_diff",
    "tx39_vocab_growth", "audit_key_skew", "g6_hits", "g11_rich_club",
    "sim12_hybrid_rrf", "tx42_sequence_packing", "tx43_auc_exact",
    "w15_equidepth_hist")

  private def releaseAll(): Unit = PlanWindows.releaseAll()

  // the walker lives in the shared [[PlanWindows]] object (the
  // round-9 registry-wide sweep uses the same one — so the negative
  // control below proves BOTH specs' lock is non-vacuous)
  private def windows(p: SparkPlan): Seq[SparkPlan] = PlanWindows.windows(p)

  test("no single-partition Window node in the migrated global-rank family") {
    migrated.foreach { q =>
      val df = SparkEntry.queries(q)(spark, sf)
      df.collect() // finalize AQE so stage plans are the real ones
      val bad = windows(df.queryExecution.executedPlan)
      assert(bad.isEmpty,
        s"$q regrew an unpartitioned Window (single-task funnel):\n" +
          bad.map(_.verboseString(3)).mkString("\n"))
      releaseAll()
    }
  }

  test("the walker detects a planted unpartitioned Window (negative control)") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val spark0 = spark
    import spark0.implicits._
    val df = (1 to 50).toDF("v")
      .withColumn("rk", row_number().over(Window.orderBy("v")))
    df.collect()
    assert(windows(df.queryExecution.executedPlan).nonEmpty,
      "plan walker failed to find a planted single-partition Window — " +
        "the family lock above would be vacuous")
  }

  test("q21 plans its EXISTS/NOT-EXISTS as semi + anti on the fact key") {
    val df = SparkEntry.queries("q21_waiting_suppliers")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"q21 degraded to a product:\n${plan.take(2000)}")
    assert(plan.contains("LeftSemi"),
      s"q21 EXISTS is not a semi join:\n${plan.take(2000)}")
    assert(plan.contains("LeftAnti"),
      s"q21 NOT EXISTS is not an anti join:\n${plan.take(2000)}")
    releaseAll()
  }

  test("q9's only big-big join is equi on the composite supply key") {
    val df = SparkEntry.queries("q9_product_profit")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // partsupp's |supplier|-count rides a 1-row broadcast crossJoin
    // (the registry's scalar-broadcast pattern, which plans as a BNLJ
    // over single rows) — so unlike q21 only CartesianProduct is
    // banned here, and the fact⋈supply join must be a real equi join
    assert(!plan.contains("CartesianProduct"),
      s"q9 degraded to a product:\n${plan.take(2000)}")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
      || plan.contains("BroadcastHashJoin"),
      s"q9 lost its equi joins:\n${plan.take(2000)}")
    releaseAll()
  }

  test("g6_hits top-15 plans as TakeOrdered, not sort-all") {
    val df = SparkEntry.queries("g6_hits")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"g6_hits lost its TakeOrdered top-k:\n${plan.take(2000)}")
    releaseAll()
  }
}
