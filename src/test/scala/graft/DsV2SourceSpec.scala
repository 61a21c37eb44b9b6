package graft

import org.apache.spark.sql.functions._

/** DocsRangeSource contract: full-scan content matches the generator
  * arithmetic; id-range filters narrow the range INSIDE the source
  * (scan description proves it, and the scan then carries no
  * residual); non-id filters stay residual; column pruning reaches
  * the reader.
  */
class DsV2SourceSpec extends SparkSpec {

  private def src(rows: Int) = spark.read
    .format("graft.sources.DocsRangeSource")
    .option("rows", rows.toString).option("partitions", "3").load()

  test("full scan matches the generator arithmetic") {
    val got = src(100).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1)
    val exp = (0L until 100L).map(i =>
      (i, i % 7, (i * 2654435761L) % 100000L, s"doc_$i"))
    assert(got.toSeq == exp)
  }

  test("id-range filter narrows the generated range, no residual") {
    val df = src(50000).filter(col("id") >= 10000 && col("id") < 30000)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("range=[10000,30000)"),
      s"pushdown did not narrow the range:\n${plan.take(2000)}")
    assert(df.count() == 20000)
  }

  test("non-id filters stay residual above the scan") {
    val df = src(1000).filter(col("cat") === 3)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("range=[0,1000)"),
      s"cat filter wrongly narrowed the range:\n${plan.take(2000)}")
    assert(plan.contains("Filter"), s"residual filter missing:\n${plan.take(2000)}")
    assert(df.count() == (0 until 1000).count(_ % 7 == 3))
  }

  test("micro-batch stream drains a bounded backlog under admission control") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dsv2_stream")
    try {
      val batches = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      val q = spark.readStream.format("graft.sources.DocsRangeSource")
        .option("rows", "1000").option("partitions", "3")
        .option("maxRowsPerBatch", "300").load()
        .writeStream
        .option("checkpointLocation", s"$dir/cp")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          val r = df.agg(count(lit(1)), min("id"), max("id")).collect()(0)
          batches.synchronized {
            batches += ((r.getLong(0), r.getLong(1), r.getLong(2)))
          }
          ()
        }
        .start()
      q.awaitTermination(120000)
      // 1000 rows at ≤300/batch → 4 batches with the exact boundaries
      assert(batches.sortBy(_._2).toSeq == Seq(
        (300L, 0L, 299L), (300L, 300L, 599L),
        (300L, 600L, 899L), (100L, 900L, 999L)), s"got $batches")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("column pruning reaches the reader") {
    val df = src(1000).select("cat")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("cols=cat"),
      s"pruned schema not propagated:\n${plan.take(2000)}")
  }
}
