package graft

import org.apache.spark.sql.functions._

import graft.ext.Dedup
import graft.sources.Bucketing

/** The two write-time scale tools: bucketed co-located joins (no
  * Exchange in the join plan) and watermark-bounded streaming dedup.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without a shuffle exchange") {
    val facts = (1 to 1000).map(i => (i.toLong % 100, s"f$i")).toDF("k", "payload")
    val dims = (1 to 500).map(i => (i.toLong % 100, i * 1.0)).toDF("k", "weight")
    Bucketing.writeBucketed(facts, "b_facts", "k", 8)
    Bucketing.writeBucketed(dims, "b_dims", "k", 8)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcast so the join must pick sort-merge — the case
      // bucketing optimizes
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_facts").join(spark.table("b_dims"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == 1000L * 5)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_facts")
      spark.sql("DROP TABLE IF EXISTS b_dims")
    }
  }

  test("registered j4_bucketed_join plan: only the final aggregate shuffles") {
    val df = SparkEntry.queries("j4_bucketed_join")(spark, "/root/testdata/sf0.001")
    df.collect() // force execution so AQE finalizes the plan
    val plan = df.queryExecution.executedPlan.toString
    // inspect only the AQE-finalized plan (the printed "Initial Plan"
    // section repeats the tree and would double-count nodes)
    val finalPlan = plan.linesIterator
      .takeWhile(!_.contains("== Initial Plan ==")).toSeq
    val joinIdx = finalPlan.indexWhere(_.contains("SortMergeJoin"))
    assert(joinIdx >= 0, plan)
    // tree prints top-down, so anything BELOW the join (its inputs)
    // prints after it: the bucket-co-located sides must be
    // exchange-free, while the tiny group-by above the join may shuffle
    val exchangeBelow = finalPlan.drop(joinIdx + 1).filter(_.contains("Exchange"))
    assert(exchangeBelow.isEmpty,
      s"bucketed join sides still shuffle (Exchange below SortMergeJoin):\n$plan")
    assert(finalPlan.drop(joinIdx).exists(_.contains("Bucketed: true")), plan)
  }

  test("streaming dedup keeps first arrival and bounds state by watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(java.sql.Timestamp, String)](spark)
    val deduped = Dedup.streamingExactDedup(
      input.toDF().toDF("ts", "text"), md5(col("text")), "ts", "10 minutes")

    val query = deduped.writeStream
      .format("memory").queryName("stream_dedup")
      .outputMode("append")
      .start()
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

    input.addData(Seq(t(0) -> "alpha", t(1) -> "beta", t(2) -> "alpha"))
    query.processAllAvailable()
    // same fingerprints arriving in a later batch, still within state
    input.addData(Seq(t(3) -> "alpha", t(4) -> "beta", t(5) -> "gamma"))
    query.processAllAvailable()
    query.stop()

    val texts = spark.table("stream_dedup")
      .collect().map(_.getString(1)).sorted.toSeq
    assert(texts == Seq("alpha", "beta", "gamma"))
  }
}
