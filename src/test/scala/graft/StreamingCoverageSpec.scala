package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.stream.StatefulOps
import graft.stream.StatefulOps.IntervalEvent

/** Streaming interval union (j16's semantics with watermark-bounded
  * state): overlapping intervals merge, islands seal once the
  * watermark passes their end (sub-watermark arrivals never reach the
  * operator — Spark's stateful late-row drop makes sealed islands
  * immutable), and inactivity timeout emits the final totals.
  */
class StreamingCoverageSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s"2024-01-01 $s")

  test("merge, seal at the watermark, expire with final totals") {
    val input = MemoryStream[IntervalEvent](spark)
    val out = StatefulOps.intervalCoverage(
      input.toDS(), watermarkDelay = "1 minute",
      inactivityTimeoutMs = 10 * 60 * 1000)

    val query = out.writeStream
      .format("memory").queryName("coverage")
      .outputMode("update")
      .start()

    // batch 1: two overlapping intervals (one 90 s island) + a
    // detached 30 s island; watermark still at origin → both open
    input.addData(Seq(
      IntervalEvent(1L, ts("10:00:00"), 60000L),
      IntervalEvent(1L, ts("10:00:30"), 60000L),
      IntervalEvent(1L, ts("10:05:00"), 30000L)))
    query.processAllAvailable()
    // batch 2: a third 20 s island between them (above the batch-start
    // watermark 10:04); the first island (end 10:01:30 < 10:04) seals
    input.addData(Seq(IntervalEvent(1L, ts("10:04:10"), 20000L)))
    query.processAllAvailable()
    // batch 3: far-future u2 event pushes the watermark past u1's
    // inactivity timeout → final expired row with all islands sealed
    input.addData(Seq(IntervalEvent(2L, ts("11:00:00"), 1000L)))
    query.processAllAvailable()
    query.stop()

    val rows = spark.table("coverage")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
      .filter(_._1 == 1L)

    // batch 1: 90 s + 30 s covered, both islands still open
    assert(rows.contains((1L, 120000L, 2L, 2L, false)))
    // batch 2: 3 islands totalling 140 s; the first sealed, two open
    assert(rows.contains((1L, 140000L, 3L, 2L, false)))
    // expiry: final totals, nothing pending
    assert(rows.filter(_._5).toSeq === Seq((1L, 140000L, 3L, 0L, true)))
  }

  test("interval merging is order-insensitive within a batch") {
    val input = MemoryStream[IntervalEvent](spark)
    val out = StatefulOps.intervalCoverage(
      input.toDS(), watermarkDelay = "1 minute",
      inactivityTimeoutMs = 60 * 1000)
    val query = out.writeStream
      .format("memory").queryName("coverage2")
      .outputMode("update")
      .start()
    // chain arriving out of order: [20,30) [0,10) [10,21) → one island
    input.addData(Seq(
      IntervalEvent(7L, ts("10:00:20"), 10000L),
      IntervalEvent(7L, ts("10:00:00"), 10000L),
      IntervalEvent(7L, ts("10:00:10"), 11000L)))
    query.processAllAvailable()
    query.stop()
    val rows = spark.table("coverage2")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter(_._1 == 7L)
    assert(rows.toSeq === Seq((7L, 30000L, 1L)))
  }
}
