package graft

import org.apache.spark.sql.functions._

import graft.sink.ParquetSnapshotSink

/** The F4 trailing-time-range read path must prune date partitions,
  * not just filter rows: `readSince` carries the batch_date bound the
  * scan can prune on (a bare `timestamp >= x` filter on the derived
  * double column cannot prune anything).
  */
class SinkPruningSpec extends SparkSpec {
  import spark.implicits._

  test("readSince prunes old batch_date partitions and keeps exact rows") {
    val root = java.nio.file.Files.createTempDirectory("graft_prune").toString
    val sink = new ParquetSnapshotSink(root)
    // two snapshots on different days: 2024-01-01 and 2024-01-03
    val day1 = 1704103200.0 // 2024-01-01 10:00:00 UTC
    val day3 = 1704276000.0 // 2024-01-03 10:00:00 UTC
    sink.write("work_hours", Seq(("A", 1L)).toDF("k", "count")
      .withColumn("timestamp", lit(day1)))
    sink.write("work_hours", Seq(("B", 2L)).toDF("k", "count")
      .withColumn("timestamp", lit(day3)))

    val pruned = sink.readSince(spark, "work_hours", day3 - 3600)
    val rows = pruned.collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("B"))

    val scan = pruned.queryExecution.executedPlan.toString
    val partFilters = scan.linesIterator
      .find(_.contains("PartitionFilters"))
      .getOrElse(fail(s"no PartitionFilters in plan:\n$scan"))
    assert(partFilters.contains("batch_date"), partFilters)

    // the plain read path would NOT prune: its plan has an empty
    // partition-filter list (documents why readSince exists)
    val unpruned = sink.read(spark, "work_hours")
      .filter(col("timestamp") >= day3 - 3600)
    val unprunedScan = unpruned.queryExecution.executedPlan.toString
    val unprunedFilters = unprunedScan.linesIterator
      .find(_.contains("PartitionFilters")).getOrElse("")
    assert(unprunedFilters.contains("PartitionFilters: []"), unprunedFilters)
  }
}
