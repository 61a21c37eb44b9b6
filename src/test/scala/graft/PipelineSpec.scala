package graft

import java.nio.file.Files

import scala.util.Random

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.ops.Derive
import graft.sink.InMemorySnapshotSink
import graft.stream.{Pipeline, PipelineConfig, Simulator}

/** Streaming end-to-end (SURVEY §5.3): seeded simulator batches → file
  * stream → foreachBatch fan-out → snapshot sinks, run deterministically
  * with Trigger.AvailableNow.
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private val cfg = Simulator.Config()
  private val seedRows = Simulator.generateSeed(200)

  test("file-stream e2e: fused pipeline populates all 8 snapshot tables") {
    val inDir = Files.createTempDirectory("graft_in").toString
    val ckpt = Files.createTempDirectory("graft_ckpt").toString
    val rng = new Random(7)
    var total = 0
    (0 until 5).foreach { i =>
      val batch = Simulator.sampleBatch(seedRows, rng, cfg)
      Simulator.writeBatchCsv(batch, inDir, 1700000000L + i)
      total += batch.length
    }

    val sink = new InMemorySnapshotSink
    var tick = 0.0
    val pipeline = new Pipeline(sink, PipelineConfig(
      fused = true,
      trigger = Trigger.AvailableNow(),
      clock = () => { tick += 1; 1700000000.0 + tick }))
    val queries = pipeline.start(spark, inDir, ckpt)
    queries.foreach(_.awaitTermination())

    val expected = Set("summary_statistics", "age_group_distribution",
      "education_income", "gender_income", "work_hours",
      "occupation_stats", "raw_data")
    // anomalies table only appears when some batch had a |z|>3 row
    assert(expected.subsetOf(sink.tableNames))
    assert(sink.rowCount("raw_data") == total)
    // per-batch snapshot counts re-aggregate to the raw total (A8 invariant)
    val reagg = sink.read(spark, "age_group_distribution")
      .agg(sum("count")).head().getLong(0)
    assert(reagg == total)
  }

  test("two-query parity mode: stats and agg queries run independently") {
    val inDir = Files.createTempDirectory("graft_in2").toString
    val ckpt = Files.createTempDirectory("graft_ckpt2").toString
    val rng = new Random(11)
    val batch = Simulator.sampleBatch(seedRows, rng, cfg)
    Simulator.writeBatchCsv(batch, inDir, 1700000100L)

    val sink = new InMemorySnapshotSink
    val pipeline = new Pipeline(sink, PipelineConfig(
      fused = false,
      trigger = Trigger.AvailableNow(),
      clock = () => 1700000100.0))
    val queries = pipeline.start(spark, inDir, ckpt)
    assert(queries.length == 2) // T4: two concurrent queries, one source
    queries.foreach(_.awaitTermination())

    assert(sink.rowCount("summary_statistics") == 1)
    assert(sink.rowCount("raw_data") == batch.length)
  }

  test("anomalous hours rows land in the anomalies table with metadata") {
    val sink = new InMemorySnapshotSink
    val pipeline = new Pipeline(sink, PipelineConfig(clock = () => 1.0))
    // 29 normal rows + one 100-hour outlier
    val rows = seedRows.take(29).map(_.copy(hours_per_week = Some(40))) :+
      seedRows(29).copy(hours_per_week = Some(100))
    pipeline.runBatch(Derive.enrich(rows.toDF()), epochId = 0L)

    val anomalies = sink.read(spark, "anomalies")
    assert(anomalies.count() == 1)
    val row = anomalies.head()
    assert(row.getAs[String]("anomaly_type") == "hours_outlier")
    assert(row.getAs[Int]("hours_per_week") == 100)
    assert(row.getAs[Double]("z_score") > 3.0)
  }

  test("empty batch writes nothing") {
    val sink = new InMemorySnapshotSink
    val pipeline = new Pipeline(sink, PipelineConfig(clock = () => 1.0))
    pipeline.runBatch(Derive.enrich(seedRows.toDF().limit(0)), epochId = 0L)
    assert(sink.tableNames.isEmpty)
  }

  test("all-equal hours batch (stddev=0) produces stats but no anomalies") {
    val sink = new InMemorySnapshotSink
    val pipeline = new Pipeline(sink, PipelineConfig(clock = () => 1.0))
    val rows = seedRows.take(10).map(_.copy(hours_per_week = Some(40)))
    pipeline.runBatch(Derive.enrich(rows.toDF()), epochId = 0L)
    assert(sink.rowCount("summary_statistics") == 1)
    assert(!sink.tableNames.contains("anomalies"))
  }
}
