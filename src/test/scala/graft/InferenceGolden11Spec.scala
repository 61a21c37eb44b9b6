package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Published-value micro-goldens, part 11 — exact order statistics
  * and the gap-fill interpolator.
  *
  * Anchors:
  *  - Type-7 quantiles (Hyndman & Fan 1996, the R/pandas default):
  *    quantile({1,2,3,4}) = (1.75, 2.50, 3.25) — the fractional
  *    h = (n−1)p + 1 positions that distinguish type 7 from every
  *    other of the nine published definitions; the query reports ×4
  *    integers, so the expected values are exact longs 700/1000/1300
  *    in cents.
  *  - Floor interpolation: the gap-filled ramp between two observed
  *    points is the exact integer-division line, pinned on a case
  *    where the division does NOT divide evenly (the floor, not the
  *    round, is the contract).
  */
@graft.Golden
class InferenceGolden11Spec extends SparkSpec {

  private def fixture(name: String, tables: (String, DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"golden11_$name").toString
    tables.foreach { case (t, df) =>
      df.coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  private def run(q: String, dir: String): Array[Row] =
    try SparkEntry.queries(q)(spark, dir).collect()
    finally {
      graft.queries.EventQueries.releaseCaches()
      graft.queries.TextQueries.releaseCaches()
      graft.queries.ParityQueries.releaseCaches()
      PlanWindows.releaseAll()
      spark.catalog.clearCache()
    }

  private val Day0 = 1704067200L

  private def eventsAt(rows: Seq[(Long, Long, Long, String, Double)]): DataFrame = {
    import spark.implicits._
    rows.toDF("event_id", "sec", "user_id", "event_type", "value")
      .select(col("event_id"), timestamp_seconds(col("sec")).as("ts"),
        col("user_id"), col("event_type"), col("value"),
        lit("{}").as("props"))
  }

  // ===================================================================
  // 1. Type-7 quartiles — the Hyndman-Fan fixture R documents
  // ===================================================================

  test("w18_five_number reproduces R's type-7 quartiles on {1,2,3,4}: " +
      "(1.75, 2.50, 3.25), exact as x4 longs") {
    val ev = eventsAt((1L to 4L).map(i =>
      (i, Day0 + i, i, "view", i.toDouble)))
    val r = run("w18_five_number", fixture("t7", "events" -> ev)).head
    assert(r.getAs[Long]("n") == 4L)
    assert(r.getAs[Long]("min_cents") == 100L)
    assert(r.getAs[Long]("max_cents") == 400L)
    assert(r.getAs[Long]("q1_x4") == 700L) // 4 · 175 cents
    assert(r.getAs[Long]("med_x4") == 1000L) // 4 · 250
    assert(r.getAs[Long]("q3_x4") == 1300L) // 4 · 325

    // a second sample where every quartile lands ON an observation
    // (n = 5: h is integral at all three quarters): {10,20,30,40,50}
    // → (20, 30, 40)
    val ev5 = eventsAt((1L to 5L).map(i =>
      (i, Day0 + i, i, "view", i * 10.0)))
    val r5 = run("w18_five_number", fixture("t7b", "events" -> ev5)).head
    assert(r5.getAs[Long]("q1_x4") == 4L * 2000L)
    assert(r5.getAs[Long]("med_x4") == 4L * 3000L)
    assert(r5.getAs[Long]("q3_x4") == 4L * 4000L)
  }

  // ===================================================================
  // 2. Gap fill — the exact floor-interpolated ramp
  // ===================================================================

  test("t_gap_fill interpolates gaps on the exact integer-division line " +
      "(floor, not round) and flags observed rows") {
    // error events with value > 150 before Jan 15: hour 0 → 1 event,
    // hour 3 → 3 events; hours 1-2 are gaps filled at
    // 1 + (2·k) div 3 = 1, 2 — the floor pins
    var eid = 0L
    def err(h: Long, k: Int): Seq[(Long, Long, Long, String, Double)] =
      (1 to k).map { i =>
        eid += 1; (eid, Day0 + h * 3600L + i, eid, "error", 200.0)
      }
    val ev = eventsAt(err(0L, 1) ++ err(3L, 3))
    val out = run("t_gap_fill", fixture("gap", "events" -> ev))
      .map(r => (r.getAs[Long]("cnt_filled"), r.getAs[Boolean]("observed")))
    assert(out.toSeq == Seq(
      (1L, true), (1L, false), (2L, false), (3L, true)))
  }
}
