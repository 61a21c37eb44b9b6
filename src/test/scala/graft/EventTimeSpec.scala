package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.stream.EventTimeWindows

/** Streaming event-time semantics: tumbling windows finalize in append
  * mode once the watermark passes, and events later than the watermark
  * are dropped — the state-eviction contract the 100 TB streaming path
  * depends on. (Batch window arithmetic is oracle-checked separately
  * via EventQueries.)
  */
class EventTimeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("watermarked tumbling windows emit finalized windows and drop late data") {
    val input = MemoryStream[(Timestamp, Double)](spark)
    val windowed = EventTimeWindows.tumbling(
      input.toDF().toDF("ts", "value"), "ts", "value",
      duration = "10 minutes", watermarkDelay = "5 minutes")

    val query = windowed.writeStream
      .format("memory").queryName("tumbling_test")
      .outputMode("append")
      .start()

    def runBatch(rows: (Timestamp, Double)*): Unit = {
      input.addData(rows)
      query.processAllAvailable()
    }

    // batch 1: two events in [10:00,10:10), one in [10:10,10:20)
    runBatch(ts(1) -> 1.0, ts(4) -> 3.0, ts(12) -> 10.0)
    // batch 2: advance event time to 10:40 → at batch end the
    // watermark becomes 10:35 → both earlier windows finalize/emit
    runBatch(ts(40) -> 7.0)
    // batch 3: a late event in the already-finalized [10:00,10:10)
    // window (end 10:10 < watermark 10:35) must be DROPPED, not merged
    runBatch(ts(2) -> 100.0)
    query.processAllAvailable()
    query.stop()

    val out = spark.table("tumbling_test")
      .collect().map(r => (r.getTimestamp(0).toString, r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    // the late 100.0 is absent from the finalized 10:00 window
    assert(out.toSeq == Seq(
      ("2024-01-01 10:00:00.0", 2L, 2.0),
      ("2024-01-01 10:10:00.0", 1L, 10.0)))
  }

  test("session windows merge within gap and close gap after last event") {
    val input = MemoryStream[(String, Timestamp)](spark)
    val sessions = EventTimeWindows.sessions(
      input.toDF().toDF("user", "ts"), "user", "ts",
      gap = "5 minutes", watermarkDelay = "1 minute")

    val query = sessions.writeStream
      .format("memory").queryName("session_test")
      .outputMode("append")
      .start()

    // u1: events at 10:00, 10:03, 10:06 chain into ONE session
    // (each within 5 min of the last), ending 10:11; u2: 10:00 and
    // 10:20 are two sessions. The 11:00 events push the watermark past
    // every session end so all finalize.
    input.addData(Seq(
      ("u1", ts(0)), ("u1", ts(3)), ("u1", ts(6)),
      ("u2", ts(0)), ("u2", ts(20))))
    query.processAllAvailable()
    input.addData(Seq(("u1", ts(59)), ("u2", ts(59))))
    query.processAllAvailable()
    query.stop()

    val out = spark.table("session_test")
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString,
        r.getTimestamp(2).toString, r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    assert(out.toSeq == Seq(
      ("u1", "2024-01-01 10:00:00.0", "2024-01-01 10:11:00.0", 3L),
      ("u2", "2024-01-01 10:00:00.0", "2024-01-01 10:05:00.0", 1L),
      ("u2", "2024-01-01 10:20:00.0", "2024-01-01 10:25:00.0", 1L)))
  }
}
