package graft

/** Plan-shape lock for the FastSS fuzzy joins: the whole point of the
  * deletion-neighborhood candidate set is that the join stays an
  * EQUI-join on the variant key — at no depth may the planner fall
  * back to a cartesian/broadcast-nested-loop product (which would be
  * O(probes × corpus) at 100 TB). Also locks the incremental near-dup
  * asymmetric join to the same contract.
  */
class FuzzyJoinPlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def executedPlan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("j6 / j6b / dedup_incremental_near plans contain no cartesian or BNLJ") {
    Seq("j6_fuzzy_join", "j6b_fuzzy_join_d2", "dedup_incremental_near").foreach { q =>
      val plan = executedPlan(q)
      assert(!plan.contains("CartesianProduct"),
        s"$q plan has a cartesian product:\n${plan.take(2000)}")
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"$q plan has a nested-loop join:\n${plan.take(2000)}")
    }
  }

  test("depth-2 variant fan-out matches the documented blow-up band") {
    // 18-char keys: depth-1 explodes ≤ 19 variants, depth-2 ≤ 172
    // (×9.05 theoretical). On THESE keys the measured ratio is ~6.2:
    // the digit runs in "Customer#000000XXX" make many 2-deletion
    // variants coincide, and array_distinct collapses them — the
    // repeated-character discount every FastSS index enjoys. Lock the
    // measured band so a variant-generation change shows up.
    import org.apache.spark.sql.functions._
    val cust = graft.sources.Tables.table(spark, sf, "customer")
      .select("c_custkey", "c_name")
    val n = cust.count()
    def variants(depth: Int): Long = {
      val c = col("c_name")
      val d1 = transform(sequence(lit(1), length(c)),
        i => concat(c.substr(lit(1), i - 1), c.substr(i + 1, lit(1000))))
      val d2 = flatten(transform(sequence(lit(1), length(c) - 1), i =>
        transform(sequence(i + 1, length(c)), j =>
          concat(c.substr(lit(1), i - 1), c.substr(i + 1, j - i - 1),
            c.substr(j + 1, lit(1000))))))
      val arr = if (depth == 1) array_distinct(concat(array(c), d1))
        else array_distinct(concat(array(c), d1, d2))
      cust.select(explode(arr)).count()
    }
    val v1 = variants(1)
    val v2 = variants(2)
    val ratio = v2.toDouble / v1
    assert(ratio > 4 && ratio < 9.1, s"fan-out ratio $ratio (v1=$v1/$n, v2=$v2/$n)")
  }
}
