package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.stream.StreamJoins

/** Stream-stream interval-join semantics: in-window clicks attach to
  * their impression, out-of-window clicks do not, and the left-outer
  * variant emits the unmatched impression with nulls only after the
  * watermark proves no future match can arrive (the state-eviction
  * contract).
  */
class StreamJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("inner interval join attributes clicks within the window") {
    val imps = MemoryStream[(Long, Timestamp)](spark)
    val clicks = MemoryStream[(Long, Timestamp)](spark)
    val joined = StreamJoins.intervalJoin(
      imps.toDF().toDF("ad_id", "imp_ts"), "ad_id", "imp_ts",
      clicks.toDF().toDF("click_ad", "click_ts"), "click_ad", "click_ts",
      within = "10 minutes", watermarkDelay = "5 minutes")

    val query = joined.writeStream
      .format("memory").queryName("attribution_inner")
      .outputMode("append").start()

    imps.addData(Seq((1L, ts(0)), (2L, ts(0))))
    clicks.addData(Seq(
      (1L, ts(5)),   // within 10 min of ad 1's impression → match
      (1L, ts(25)),  // 25 min later → outside window, no match
      (2L, ts(11)))) // 11 min later → outside window, no match
    query.processAllAvailable()
    query.stop()

    val out = spark.table("attribution_inner")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getTimestamp(3).toString))
    assert(out.toSeq == Seq((1L, 1L, "2024-01-01 10:05:00.0")))
  }

  test("leftOuter emits unmatched impressions with nulls after the watermark passes") {
    val imps = MemoryStream[(Long, Timestamp)](spark)
    val clicks = MemoryStream[(Long, Timestamp)](spark)
    val joined = StreamJoins.intervalJoin(
      imps.toDF().toDF("ad_id", "imp_ts"), "ad_id", "imp_ts",
      clicks.toDF().toDF("click_ad", "click_ts"), "click_ad", "click_ts",
      within = "10 minutes", watermarkDelay = "5 minutes",
      joinType = "leftOuter")

    val query = joined.writeStream
      .format("memory").queryName("attribution_outer")
      .outputMode("append").start()

    imps.addData(Seq((1L, ts(0)), (2L, ts(0))))
    clicks.addData(Seq((1L, ts(5))))
    query.processAllAvailable()
    // push BOTH watermarks far past ad 2's match horizon
    // (imp_ts + 10 min window + 5 min delay = 10:15) so the unmatched
    // impression finalizes and emits with a null click
    imps.addData(Seq((99L, ts(50))))
    clicks.addData(Seq((99L, ts(50))))
    query.processAllAvailable()
    query.stop()

    val out = spark.table("attribution_outer")
      .filter("ad_id IN (1, 2)")
      .collect().map(r => (r.getLong(0), Option(r.get(2)).map(_.asInstanceOf[Long])))
      .sortBy(_._1)
    assert(out.toSeq == Seq(1L -> Some(1L), 2L -> None))
  }

  test("stream-static enrichment broadcasts the dim and keeps the stream stateless") {
    val events = MemoryStream[(String, Long)](spark)
    val dim = Seq(("src1", "en", 2), ("src2", "de", 5)).toDF("source", "lang", "quota")
    val enriched = graft.stream.StreamJoins.enrichWithDim(
      events.toDF().toDF("source", "doc_id"), dim, Seq("source"))

    val query = enriched.writeStream
      .format("memory").queryName("dim_enriched")
      .outputMode("append").start()
    // stop() before any assertion can throw — a failed assert must not
    // leak a running query into the suite-shared session
    val plan = try {
      events.addData(Seq(("src1", 1L), ("src2", 2L), ("srcX", 3L)))
      query.processAllAvailable()
      query.asInstanceOf[org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
        .streamingQuery.lastExecution.executedPlan.toString
    } finally query.stop()
    // the join must be a broadcast-hash join with NO stateful operator
    // (stream-static holds no state; nothing to watermark or evict)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("StateStore"), plan)

    val out = spark.table("dim_enriched")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getInt(3)))
      .sortBy(_._2)
    // inner: the unknown source drops; known sources carry dim columns
    assert(out.toSeq == Seq(("src1", 1L, "en", 2), ("src2", 2L, "de", 5)))
  }
}
