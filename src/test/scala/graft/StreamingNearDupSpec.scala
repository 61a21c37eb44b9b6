package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.stream.StreamingNearDup

/** Streaming near-dup semantics: a document arriving in a LATER
  * micro-batch that shares a MinHash band bucket with an earlier
  * document produces a collision row naming the first arrival;
  * dissimilar text produces none; bucket state expires on event-time
  * timeout so a post-expiry near-dup is (by design) not flagged.
  */
class StreamingNearDupSpec extends SparkSpec {
  import spark.implicits._

  private def t(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  private val baseText =
    "the quick brown fox jumps over the lazy dog near the river bank today"

  test("cross-batch banded collision flags near-dups, ignores dissimilar text") {
    val input = MemoryStream[(Long, String, Timestamp)](spark)
    val docs = input.toDF().toDF("doc_id", "text", "ts")
    val out = StreamingNearDup.detect(docs, "ts",
      watermarkDelay = "1 minute", stateTtlMs = 10 * 60 * 1000)

    val query = out.writeStream
      .format("memory").queryName("near_dup_hits")
      .outputMode("append")
      .start()

    // batch 1: the original + an unrelated doc
    input.addData(Seq(
      (1L, baseText, t(0)),
      (2L, "completely different subject matter entirely unrelated words list", t(0))))
    query.processAllAvailable()
    // batch 2: a near-dup of doc 1 (one word changed — most shingles
    // survive, so some band of the 8 must collide) + fresh text
    input.addData(Seq(
      (3L, baseText.replace("today", "tonight"), t(1)),
      (4L, "yet another disjoint vocabulary paragraph with novel content", t(1))))
    query.processAllAvailable()
    query.stop()

    val hits = spark.table("near_dup_hits").as[StreamingNearDup.Collision]
      .collect().map(c => (c.doc_id, c.first_doc)).distinct
    assert(hits.toSet == Set((3L, 1L)), s"hits: ${hits.toSeq}")
  }

  test("identical text collides on every band; state expires after TTL") {
    val input = MemoryStream[(Long, String, Timestamp)](spark)
    val docs = input.toDF().toDF("doc_id", "text", "ts")
    val out = StreamingNearDup.detect(docs, "ts",
      watermarkDelay = "1 minute", stateTtlMs = 5 * 60 * 1000)

    val query = out.writeStream
      .format("memory").queryName("near_dup_ttl")
      .outputMode("append")
      .start()

    input.addData(Seq((10L, baseText, t(0))))
    query.processAllAvailable()
    // exact copy: all 8 bands collide → 8 rows for the pair
    input.addData(Seq((11L, baseText, t(1))))
    query.processAllAvailable()
    // push the watermark far past lastHit + TTL → buckets evicted
    input.addData(Seq((12L, "filler watermark advancing text block", t(30))))
    query.processAllAvailable()
    // post-expiry copy: no state left, so NOT flagged (and it becomes
    // the new first arrival for its buckets)
    input.addData(Seq((13L, baseText, t(31))))
    query.processAllAvailable()
    query.stop()

    val rows = spark.table("near_dup_ttl").as[StreamingNearDup.Collision].collect()
    val pair = rows.filter(c => c.doc_id == 11L && c.first_doc == 10L)
    assert(pair.length == 8, s"expected 8 band hits, got ${pair.length}")
    assert(!rows.exists(_.doc_id == 13L), s"post-expiry doc flagged: ${rows.toSeq}")
  }
}
