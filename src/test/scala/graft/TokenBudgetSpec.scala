package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.stream.{BudgetDoc, TokenBudget}

/** transformWithState per-source token-budget admission: the running
  * total survives across micro-batches (cross-batch state), admission
  * cuts off once the budget is exhausted, and sources are isolated.
  */
class TokenBudgetSpec extends SparkSpec {
  import spark.implicits._

  test("budget admission carries state across batches and isolates keys") {
    val saved = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    // transformWithState supports only the RocksDB provider
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[BudgetDoc](spark)
      val query = TokenBudget.admit(input.toDS(), budgetPerSource = 100L)
        .writeStream.format("memory").queryName("budget_test")
        .outputMode("append").start()

      // batch 1: srcA consumes 60 of its 100-token budget
      input.addData(BudgetDoc("srcA", 1L, 60L))
      query.processAllAvailable()
      // batch 2: srcA's 50-token doc still admitted (60 < 100 at entry,
      // budget is a soft cap crossed once); srcB independent
      input.addData(BudgetDoc("srcA", 2L, 50L), BudgetDoc("srcB", 3L, 30L))
      query.processAllAvailable()
      // batch 3: srcA now at 110 >= 100 → rejected; srcB still open
      input.addData(BudgetDoc("srcA", 4L, 10L), BudgetDoc("srcB", 5L, 30L))
      query.processAllAvailable()
      query.stop()

      val out = spark.table("budget_test")
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getBoolean(3)))
        .sortBy(_._1)
      assert(out.toSeq == Seq(
        (1L, 60L, true),   // srcA: 0 -> 60
        (2L, 110L, true),  // srcA: 60 < 100, admitted, -> 110
        (3L, 30L, true),   // srcB independent: 0 -> 30
        (4L, 110L, false), // srcA exhausted: rejected, total unchanged
        (5L, 60L, true)))  // srcB: 30 -> 60
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None    => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
