package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Published-value micro-goldens, part 3: the TIME-SERIES family
  * (t_*), of which only t_pettitt carried an independent anchor
  * before this spec — the same mirror-correlation blind spot the
  * round-11 a72/t_pettitt bugs proved real, closed for the series
  * operators the monitoring stack leans on.
  *
  * Anchors:
  *  - Theil-Sen (Sen 1968): on an exact line the median pairwise
  *    slope IS the line's slope; and the published breakdown
  *    property — with 1 corrupted point in 5 (4/10 contaminated
  *    pairs < the 29% breakdown bound) the slope estimate is
  *    UNCHANGED, the robustness claim the query's own scaladoc makes
  *    against OLS.
  *  - Wald-Wolfowitz runs test (1940): a perfectly alternating
  *    series attains the maximal run count R = n, and z assembles
  *    from the published moments μ_R = 2n₁n₂/n + 1,
  *    σ²_R = 2n₁n₂(2n₁n₂−n)/(n²(n−1)).
  *  - Holt linear smoothing (Holt 1957 / Gardner 1985 §3): double
  *    exponential smoothing initialized l₁ = x₁, b₁ = x₂−x₁ tracks
  *    a LINEAR series exactly — every one-step forecast equals the
  *    observation, residuals identically zero (the level+trend
  *    invariance that distinguishes it from single EWMA's
  *    documented ramp lag).
  *  - CUSUM (Page 1954): the reset form S_t = max(0, S_{t-1} + x_t
  *    − target) is identically zero on a constant series, and the
  *    post-shift walk is a hand-computable integer ramp.
  *  - Seasonal strength (Hyndman & Athanasopoulos, FPP3 §4.3):
  *    F_s = 1 − Var(remainder)/Var(detrended) hits its published
  *    ceilings — 1 for a pure hour-of-day profile (zero residual)
  *    and 0 when the variance is entirely cross-day (per-hod means
  *    flat).
  *  - DTW (Sakoe & Chiba 1978): zero iff identical aligned series;
  *    bounded above by the lockstep L1 distance (the diagonal is
  *    one admissible warping path); and an independent imperative
  *    O(n·m) banded DP recompute, a derivation path disjoint from
  *    the engine's nested higher-order-function fold.
  */
@graft.Golden
class InferenceGolden3Spec extends SparkSpec {

  private def fixture(name: String, tables: (String, DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"golden3_$name").toString
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

  private val Day0 = 1704067200L // 2024-01-01 00:00:00 UTC

  /** events whose hourly count series is exactly `counts` (count k in
    * hour h ⇒ k events spread inside that hour).
    */
  private def hourlyEvents(counts: Seq[Long]): DataFrame = {
    import spark.implicits._
    var eid = 0L
    val rows = counts.zipWithIndex.flatMap { case (k, h) =>
      (1L to k).map { i =>
        eid += 1
        (eid, Day0 + h * 3600L + i, eid % 5, "view", 1.0)
      }
    }
    rows.toDF("event_id", "sec", "user_id", "event_type", "value")
      .select(col("event_id"), timestamp_seconds(col("sec")).as("ts"),
        col("user_id"), col("event_type"), col("value"),
        lit("{}").as("props"))
  }

  // ===================================================================
  // 1. Theil-Sen — exact line, then Sen's breakdown property
  // ===================================================================

  test("t_theil_sen_counts recovers an exact line and ignores one outlier " +
      "(Sen 1968 breakdown property)") {
    // counts 1,4,7,10,13 at hours 0..4: every pairwise slope is 3,
    // every intercept residual is 1. (This golden surfaced the
    // round-12 shadowed-name find: the count-series def had been
    // silently hidden behind the cent-sum t_theil_sen for rounds.)
    val r = run("t_theil_sen_counts", fixture("ts_line",
      "events" -> hourlyEvents(Seq(1L, 4L, 7L, 10L, 13L)))).head
    assert(r.getAs[Long]("n_pairs") == 10L)
    assert(r.getAs[Double]("slope") == 3.0)
    assert(r.getAs[Double]("intercept") == 1.0)

    // corrupt the last point 13 → 130: only 4 of 10 pairwise slopes
    // are contaminated, the median is still 3 (OLS slope would be
    // ~26) — and the median intercept is still 1
    val r2 = run("t_theil_sen_counts", fixture("ts_out",
      "events" -> hourlyEvents(Seq(1L, 4L, 7L, 10L, 130L)))).head
    assert(r2.getAs[Double]("slope") == 3.0)
    assert(r2.getAs[Double]("intercept") == 1.0)

    // and the registered cent-sum twin on the same fixture: value is
    // pinned 1.0 per event, so the cent series is 100× the count
    // series — slope 300 (it reports slope only)
    val r3 = run("t_theil_sen", fixture("ts_cents",
      "events" -> hourlyEvents(Seq(1L, 4L, 7L, 10L, 13L)))).head
    assert(r3.getAs[Long]("n_pairs") == 10L)
    assert(r3.getAs[Double]("theil_sen") == 300.0)
  }

  // ===================================================================
  // 2. Runs test — the maximal-alternation ceiling R = n
  // ===================================================================

  test("t_runs_test: a perfectly alternating series attains R = n with " +
      "the Wald-Wolfowitz z from the published moments") {
    // 12 hours alternating 1,3 around median 2: every hour starts a
    // run — R = 12, n1 = n2 = 6
    val counts = (0 until 12).map(h => if (h % 2 == 0) 1L else 3L)
    val r = run("t_runs_test", fixture("runs",
      "events" -> hourlyEvents(counts))).head
    assert(r.getAs[Long]("n") == 12L)
    assert(r.getAs[Long]("n1") == 6L && r.getAs[Long]("n2") == 6L)
    assert(r.getAs[Long]("runs") == 12L)
    // μ_R = 2·36/12 + 1 = 7; σ²_R = 2·36·60/(144·11)
    val mu = 2.0 * 36 / 12 + 1.0
    val sg = math.sqrt(2.0 * 36 * (2.0 * 36 - 12) / (144.0 * 11))
    assert(r.getAs[Double]("z") == round6((12.0 - mu) / sg))
  }

  // ===================================================================
  // 3. Holt — linear-series invariance: residuals identically zero
  // ===================================================================

  test("t_holt_forecast tracks a linear series exactly (zero residual " +
      "at every step — the Holt/Gardner trend invariance)") {
    // x_t = 2 + 3t for t = 0..5; emitted rows are t = 2..5
    val counts = (0 until 6).map(t => 2L + 3L * t)
    val out = run("t_holt_forecast", fixture("holt",
      "events" -> hourlyEvents(counts)))
    assert(out.length == 4)
    out.foreach { r =>
      assert(r.getAs[Double]("forecast") == r.getAs[Long]("cnt").toDouble)
      assert(r.getAs[Double]("resid") == 0.0)
    }
  }

  // ===================================================================
  // 4. CUSUM — Page's zero-on-constant, and a hand-computed step ramp
  // ===================================================================

  test("t_cusum_shift is identically zero on a constant series and " +
      "matches the definitional walk on a step shift") {
    val flat = run("t_cusum_shift", fixture("cusum0",
      "events" -> hourlyEvents(Seq.fill(10)(4L))))
    assert(flat.length == 10)
    flat.foreach { r =>
      assert(r.getAs[Long]("cusum") == 0L)
      assert(r.getAs[Long]("shifted") == 0L)
    }

    // 10 hours at 1 then 10 at 5: recompute the engine's scaled walk
    // p_t = Σ (cnt·n − s), cusum = p − min(0, running-min p) naively
    val counts = Seq.fill(10)(1L) ++ Seq.fill(10)(5L)
    val out = run("t_cusum_shift", fixture("cusum1",
      "events" -> hourlyEvents(counts)))
    val n = counts.length.toLong
    val s = counts.sum
    var p = 0L
    var minP = 0L
    val expected = counts.map { c =>
      p += c * n - s
      minP = math.min(minP, p)
      val cu = p - math.min(0L, minP)
      (cu, if (cu > 2 * s) 1L else 0L)
    }
    assert(out.map(r => (r.getAs[Long]("cusum"),
      r.getAs[Long]("shifted"))).toSeq == expected)
    assert(out.map(_.getAs[Long]("shifted")).sum > 0) // the shift fires
  }

  // ===================================================================
  // 5. Seasonal strength — Hyndman's F_s ceilings 1 and 0
  // ===================================================================

  test("t_stl_strength attains F_s = 1 on a pure hour-of-day profile " +
      "and F_s = 0 on a pure day effect (FPP3 seasonal-strength bounds)") {
    // 2 days × 24 hod, cnt = 1 + hod: the hod profile explains all
    // variance — zero residual, strength exactly 1
    val seasonal = (0 until 48).map(h => 1L + (h % 24))
    val r = run("t_stl_strength", fixture("stl1",
      "events" -> hourlyEvents(seasonal))).head
    assert(r.getAs[Long]("n_hours") == 48L)
    assert(r.getAs[Double]("sse_resid") == 0.0)
    assert(r.getAs[Double]("strength") == 1.0)

    // day 1 all 1, day 2 all 3: per-hod means are flat (2), so the
    // seasonal model explains nothing — strength exactly 0
    val dayEffect = Seq.fill(24)(1L) ++ Seq.fill(24)(3L)
    val r2 = run("t_stl_strength", fixture("stl0",
      "events" -> hourlyEvents(dayEffect))).head
    assert(r2.getAs[Double]("sst") == 48.0)
    assert(r2.getAs[Double]("sse_resid") == 48.0)
    assert(r2.getAs[Double]("strength") == 0.0)
  }

  // ===================================================================
  // 6. DTW — zero-iff-identical, L1 upper bound, independent DP
  // ===================================================================

  /** Orders fixture: priority p's monthly cent series = `cents`
    * (months Jan.. of 2024, one order per month).
    */
  private def dtwOrders(series: Seq[(String, Seq[Long])]): DataFrame = {
    import spark.implicits._
    series.flatMap { case (pri, cents) =>
      cents.zipWithIndex.map { case (c, m) =>
        (pri + m.toString, pri, f"2024-${m + 1}%02d-15", c / 100.0)
      }
    }.toDF("ok", "o_orderpriority", "ds", "o_totalprice")
      .select(monotonically_increasing_id().as("o_orderkey"),
        col("o_orderpriority"), to_date(col("ds")).as("o_orderdate"),
        col("o_totalprice"))
  }

  /** Standard banded DTW (Sakoe-Chiba r = 8) by the imperative
    * textbook DP — independent of the engine's nested-HOF fold.
    */
  private def dtwRef(a: Seq[Long], b: Seq[Long], band: Int = 8): Long = {
    val Inf = 1000000000000000L
    val d = Array.fill(a.length + 1, b.length + 1)(Inf)
    d(0)(0) = 0L
    for (i <- 1 to a.length; j <- 1 to b.length)
      if (math.abs(i - j) <= band) {
        val best = math.min(d(i - 1)(j), math.min(d(i)(j - 1), d(i - 1)(j - 1)))
        if (best < Inf) d(i)(j) = math.abs(a(i - 1) - b(j - 1)) + best
      }
    d(a.length)(b.length)
  }

  test("t_dtw_monthly: zero iff identical, bounded by lockstep L1, and " +
      "equal to the imperative Sakoe-Chiba DP") {
    val sa = Seq(10000L, 30000L, 40000L, 100000L)
    val sb = Seq(20000L, 30000L, 40000L, 40000L)
    val dir = fixture("dtw", "orders" -> dtwOrders(Seq(
      "1-URGENT" -> sa, "2-HIGH" -> sa, "3-MEDIUM" -> sb)))
    val out = run("t_dtw_monthly", dir)
      .map(r => (r.getAs[String]("p1"), r.getAs[String]("p2")) ->
        r.getAs[Long]("dtw_cents")).toMap
    assert(out(("1-URGENT", "2-HIGH")) == 0L) // identical series
    val got = out(("1-URGENT", "3-MEDIUM"))
    assert(got == dtwRef(sa, sb))
    val l1 = sa.zip(sb).map { case (x, y) => math.abs(x - y) }.sum
    assert(got <= l1) // the diagonal is one admissible path
    assert(out(("2-HIGH", "3-MEDIUM")) == got)
  }
}
