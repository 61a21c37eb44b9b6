package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.stream.DocumentPipeline

/** End-to-end streaming ingest: enrichment columns appear, the quality
  * gate drops junk before any state, and cross-batch duplicate
  * fingerprints are suppressed.
  */
class DocumentPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def t(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  private val good =
    "the quick brown fox jumps over a lazy dog of unusual size and temperament " +
      "walking the river bank at dawn with great care and poise under a pale sky"

  test("ingest enriches, quality-gates, and dedups across batches") {
    val input = MemoryStream[(Timestamp, String)](spark)
    val out = DocumentPipeline.ingest(
      input.toDF().toDF("ts", "text"), "ts")

    val query = out.writeStream
      .format("memory").queryName("doc_ingest")
      .outputMode("append")
      .start()

    input.addData(Seq(
      t(0) -> good,
      t(1) -> "x x",          // junk → quality gate
      t(2) -> (good + " again")))
    query.processAllAvailable()
    input.addData(Seq(
      t(3) -> good,           // duplicate fingerprint, later batch → dropped
      t(4) -> (good + " fresh")))
    query.processAllAvailable()
    query.stop()

    val rows = spark.table("doc_ingest")
    assert(Seq("n_tokens", "quality", "lang_pred", "fingerprint")
      .forall(rows.columns.contains))
    val texts = rows.collect().map(_.getAs[String]("text")).sorted.toSeq
    assert(texts == Seq(good, good + " again", good + " fresh").sorted)
    assert(rows.collect().forall(_.getAs[String]("lang_pred") == "en"))
  }
}
