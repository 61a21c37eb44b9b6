package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Published-value micro-goldens, part 12 — the arrival-process
  * monitors.
  *
  * Anchors:
  *  - Burstiness (Goh & Barabási 2008): B = (σ−μ)/(σ+μ) is exactly
  *    −1 for a PACEMAKER (constant inter-arrival gaps, σ = 0) — the
  *    published floor of the [−1, 1) scale; a hand two-gap mix is
  *    recomputed definitionally.
  *  - Record statistics: a strictly increasing hourly series makes
  *    EVERY hour a running-max record (n_records = n), a constant
  *    series exactly one — the two ends the i.i.d. expectation
  *    H_n ≈ ln n sits between.
  *  - Hour-of-day uniformity: χ² = 0 on an exactly uniform profile
  *    and the point-mass ceiling T·(k−1)/T·… = 23·T/(T) — i.e.
  *    chi2 = 23·T/24·…, computed hand-exact: all volume in one hour
  *    gives chi2 = 23·T/…, asserted from the engine's own exact
  *    integers (Σ(24o−T)² = 552T² ⇒ chi2 = 23T).
  *  - Autocorrelation: a period-2 series attains ρ = −1 at odd lags
  *    and +1 at even lags exactly (every aligned pair lies on one
  *    line — the Cauchy-Schwarz equality case at each pinned lag).
  */
@graft.Golden
class InferenceGolden12Spec extends SparkSpec {

  private def fixture(name: String, tables: (String, DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"golden12_$name").toString
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

  private def round6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private val Day0 = 1704067200L

  private def eventsAt(rows: Seq[(Long, Long, Long, String, Double)]): DataFrame = {
    import spark.implicits._
    rows.toDF("event_id", "sec", "user_id", "event_type", "value")
      .select(col("event_id"), timestamp_seconds(col("sec")).as("ts"),
        col("user_id"), col("event_type"), col("value"),
        lit("{}").as("props"))
  }

  private def hourlyEvents(counts: Seq[Long]): DataFrame = {
    var eid = 0L
    eventsAt(counts.zipWithIndex.flatMap { case (k, h) =>
      (1L to k).map { i =>
        eid += 1; (eid, Day0 + h * 3600L + i, eid % 5, "view", 1.0)
      }
    })
  }

  // ===================================================================
  // 1. Burstiness — the Goh-Barabási pacemaker floor B = −1
  // ===================================================================

  test("t_burstiness is exactly -1 for constant-gap arrivals (the " +
      "Goh-Barabasi pacemaker floor) and matches the definition on a mix") {
    val regular = eventsAt((0 until 10).map(i =>
      (i.toLong + 1, Day0 + i * 60L, 1L, "view", 1.0)))
    val r = run("t_burstiness", fixture("pace", "events" -> regular)).head
    assert(r.getAs[Double]("mean_gap_s") == 60.0)
    assert(r.getAs[Double]("burstiness") == -1.0)

    // two-gap mix 10,30,10,30...: mu = 20, sigma = 10 ⇒ B = -1/3
    val gaps = Seq(10L, 30L, 10L, 30L, 10L, 30L)
    val times = Day0 +: gaps.scanLeft(Day0)(_ + _).tail
    val mixed = eventsAt(times.zipWithIndex.map { case (sec, i) =>
      (i.toLong + 1, sec, 1L, "view", 1.0) })
    val r2 = run("t_burstiness", fixture("mix", "events" -> mixed)).head
    val mu = gaps.sum.toDouble / gaps.length
    val sg = math.sqrt(gaps.map(g => (g - mu) * (g - mu)).sum / gaps.length)
    assert(r2.getAs[Double]("burstiness") == round6((sg - mu) / (sg + mu)))
  }

  // ===================================================================
  // 2. Records — every hour (increasing) vs exactly one (constant)
  // ===================================================================

  test("t_record_breaks counts every hour of a strictly increasing series " +
      "as a record, and exactly one on a constant series") {
    val up = run("t_record_breaks", fixture("rec_up",
      "events" -> hourlyEvents((1L to 8L).toSeq))).head
    assert(up.getAs[Long]("n_hours") == 8L)
    assert(up.getAs[Long]("n_records") == 8L)

    val flat = run("t_record_breaks", fixture("rec_flat",
      "events" -> hourlyEvents(Seq.fill(8)(3L)))).head
    assert(flat.getAs[Long]("n_records") == 1L)
  }

  // ===================================================================
  // 3. Hour-of-day uniformity — zero and the point-mass ceiling
  // ===================================================================

  test("t_hour_uniformity: chi2 = 0 on an exactly uniform day profile; " +
      "a single-hour point mass gives the exact 23T ceiling") {
    // 2 events in every hod of one day
    val uniform = hourlyEvents(Seq.fill(24)(2L))
    val r = run("t_hour_uniformity", fixture("uni", "events" -> uniform)).head
    assert(r.getAs[Long]("t") == 48L)
    assert(r.getAs[Double]("chi2") == 0.0)
    assert(r.getAs[Long]("nonuniform") == 0L)

    // all 48 events in hod 0: Σ(24o−T)² = 552·T² ⇒ chi2 = 23·T
    val point = eventsAt((1L to 48L).map(i =>
      (i, Day0 + i, i % 5, "view", 1.0))) // 00:00-00:00:48, one hod
    val r2 = run("t_hour_uniformity", fixture("point", "events" -> point)).head
    assert(r2.getAs[Double]("chi2") == 23.0 * 48)
    assert(r2.getAs[Long]("nonuniform") == 1L)
  }

  // ===================================================================
  // 4. ACF — ±1 at every pinned lag on a period-2 series
  // ===================================================================

  test("t_autocorrelation attains rho = -1 at odd and +1 at even pinned " +
      "lags on a period-2 series (per-lag Cauchy-Schwarz equality)") {
    val counts = (0 until 30).map(h => if (h % 2 == 0) 1L else 3L)
    val out = run("t_autocorrelation", fixture("acf",
      "events" -> hourlyEvents(counts)))
      .map(r => r.getAs[Long]("lag") -> r.getAs[Double]("acf")).toMap
    assert(out == Map(1L -> -1.0, 2L -> 1.0, 3L -> -1.0,
      6L -> 1.0, 12L -> 1.0, 24L -> 1.0))
  }
}
