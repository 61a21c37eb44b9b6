package graft

/** Plan-shape locks for the round-7 selection/linkage/similarity
  * operators: each one's scale story is a specific join/window
  * physics, and a planner or code change that silently degrades it to
  * a product or a global single-partition sort would still hash-match
  * the oracle — these asserts are the only guard.
  */
class Round7PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def executedPlan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("skyline / linkage / prefix-filter plans contain no cartesian or BNLJ") {
    // dedup_banding_recall is exempt: its three 1-row count aggregates
    // combine via crossJoin (the registry's scalar-broadcast pattern),
    // which plans as a BNLJ over single rows — not a data product.
    Seq("tx31_skyline", "j8_record_linkage", "j8b_sorted_neighborhood",
      "dedup_prefix_filter", "tx32_phrase_search")
      .foreach { q =>
        val plan = executedPlan(q)
        assert(!plan.contains("CartesianProduct"),
          s"$q plan has a cartesian product:\n${plan.take(2000)}")
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$q plan has a nested-loop join:\n${plan.take(2000)}")
        graft.queries.DedupQueries.releaseSignatureCache()
      }
  }

  test("skyline frontier joins back as a broadcast") {
    val plan = executedPlan("tx31_skyline")
    assert(plan.contains("BroadcastHashJoin"),
      s"frontier join-back is not broadcast:\n${plan.take(2000)}")
  }

  test("q18 aggregates before joining and never goes nested-loop") {
    val plan = executedPlan("q18_large_orders")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"q18 plan degraded to a product:\n${plan.take(2000)}")
    // the HAVING cut must run on the aggregate BELOW the join —
    // a plan that joins the raw fact table first re-shuffles 6B rows
    // at SF100 for nothing
    val aggIdx = plan.indexOf("HashAggregate")
    val joinIdx = math.max(plan.indexOf("SortMergeJoin"),
      plan.indexOf("BroadcastHashJoin"))
    assert(aggIdx >= 0 && joinIdx >= 0,
      s"q18 plan missing agg or join:\n${plan.take(2000)}")
    assert(plan.contains("sum_qty"),
      s"q18 whale cut not visible in plan:\n${plan.take(2000)}")
  }

  test("q14 broadcasts part and pushes the shipdate window to the scan") {
    val plan = executedPlan("q14_promo_revenue")
    assert(plan.contains("BroadcastHashJoin"),
      s"q14 part side not broadcast:\n${plan.take(2000)}")
    assert(plan.contains("PushedFilters") && plan.contains("l_shipdate"),
      s"q14 shipdate window not pushed to the lineitem scan:\n${plan.take(3000)}")
  }

  test("TPC-H family plan locks: broadcast dims, semi join, no products") {
    // q7/q8: dimensions broadcast, facts shuffle once, never a product
    Seq("q7_nation_trade", "q8_market_share").foreach { q =>
      val plan = executedPlan(q)
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"),
        s"$q degraded to a product:\n${plan.take(2000)}")
      assert(plan.contains("BroadcastHashJoin"),
        s"$q dimensions not broadcast:\n${plan.take(2000)}")
    }
    // q4b: the EXISTS must plan as a semi join (an inner join would
    // fan out per matching lineitem and need a distinct)
    val q4 = executedPlan("q4b_priority_semi")
    assert(q4.contains("LeftSemi"),
      s"q4b EXISTS not planned as a semi join:\n${q4.take(2000)}")
  }

  test("late TPC-H shapes: scan fold, outer join, no products") {
    // q6: no join at all — a single aggregated scan
    val q6 = executedPlan("q6_forecast_revenue")
    assert(!q6.contains("Join"), s"q6 grew a join:\n${q6.take(1500)}")
    // q13: the zero-order customers require an outer join
    val q13 = executedPlan("q13_cust_order_dist")
    assert(q13.contains("LeftOuter"), s"q13 lost the outer join:\n${q13.take(1500)}")
    // q17/q19: never a product
    Seq("q17_small_qty_revenue", "q19_disjunctive_revenue").foreach { q =>
      val plan = executedPlan(q)
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"),
        s"$q degraded to a product:\n${plan.take(1500)}")
    }
  }

  test("entity clustering never goes cartesian") {
    val plan = executedPlan("j8c_entity_clusters")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"j8c plan has a product:\n${plan.take(2000)}")
  }

  test("sorted-neighborhood window partitions by the blocking key") {
    // the per-nation window must NOT collapse to a global
    // single-partition sort — that is the whole point of blocking
    val plan = executedPlan("j8b_sorted_neighborhood")
    assert(plan.contains("hashpartitioning(nk"),
      s"window not partitioned by nk:\n${plan.take(2000)}")
  }
}
