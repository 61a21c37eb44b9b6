package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Published-value micro-goldens, part 7 — the regression/correlation
  * closers.
  *
  * Anchors:
  *  - OLS (the Gauss normal-equations property): on data that lies
  *    EXACTLY on a plane y = β₀ + β₁x₁ + β₂x₂, the least-squares
  *    solve recovers the coefficients exactly — any residual is a
  *    bug in the sufficient statistics or the Cramer solve.
  *  - Pearson correlation: the ±1 ceilings on exact affine data
  *    (Cauchy-Schwarz equality case), and the degenerate-variance
  *    guard pinning to NULL rather than 0/0.
  *  - PACF via Durbin-Levinson (Durbin 1960): recomputed end-to-end
  *    from explicit O(n²) pair-loop autocorrelations through an
  *    independently-coded Levinson recursion, plus the definitional
  *    identity φ₁₁ = ρ₁ (the lag-1 PACF IS the lag-1 ACF — the one
  *    value the recursion cannot disguise).
  */
@graft.Golden
class InferenceGolden7Spec extends SparkSpec {

  private def fixture(name: String, tables: (String, DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"golden7_$name").toString
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

  private def hourlyEvents(counts: Seq[Long]): DataFrame = {
    import spark.implicits._
    var eid = 0L
    counts.zipWithIndex.flatMap { case (k, h) =>
      (1L to k).map { i =>
        eid += 1
        (eid, Day0 + h * 3600L + i, eid % 5, "view", 1.0)
      }
    }.toDF("event_id", "sec", "user_id", "event_type", "value")
      .select(col("event_id"), timestamp_seconds(col("sec")).as("ts"),
        col("user_id"), col("event_type"), col("value"),
        lit("{}").as("props"))
  }

  // ===================================================================
  // 1. Two-feature OLS — exact-plane recovery
  // ===================================================================

  test("a31_ols_hourly recovers an exact plane y = 2 + 3*trend + 5*hod " +
      "to the coefficient (the Gauss normal-equations property)") {
    // 48 hours from Day0 (midnight UTC): x1 = hour index, x2 = hour
    // of day = x1 % 24 — correlated but not collinear over two days
    val counts = (0 until 48).map(h => 2L + 3L * h + 5L * (h % 24))
    val r = run("a31_ols_hourly", fixture("ols",
      "events" -> hourlyEvents(counts))).head
    assert(r.getAs[Long]("n") == 48L)
    assert(r.getAs[Double]("b0") == 2.0)
    assert(r.getAs[Double]("b_trend") == 3.0)
    assert(r.getAs[Double]("b_hod") == 5.0)
  }

  // ===================================================================
  // 2. Pearson per group — the Cauchy-Schwarz equality ceilings
  // ===================================================================

  test("a29_correlation attains r = +1 and -1 exactly on affine data and " +
      "NULLs out the zero-variance group") {
    import spark.implicits._
    // flag A: disc*1000 = 2*qty (r = 1); flag B: 100 - 2*qty (r = -1);
    // flag C: constant discount (zero variance -> NULL by the guard)
    val rows =
      Seq((10L, 0.020), (20L, 0.040), (30L, 0.060)).map { case (q, d) => ("A", q, d) } ++
      Seq((10L, 0.080), (20L, 0.060), (30L, 0.040)).map { case (q, d) => ("B", q, d) } ++
      Seq((10L, 0.050), (20L, 0.050), (30L, 0.050)).map { case (q, d) => ("C", q, d) }
    val li = rows.toDF("l_returnflag", "l_quantity", "l_discount")
    val out = run("a29_correlation", fixture("corr", "lineitem" -> li))
      .map(r => r.getAs[String]("flag") ->
        (if (r.isNullAt(r.fieldIndex("r_qty_disc"))) None
         else Some(r.getAs[Double]("r_qty_disc")))).toMap
    assert(out("A").contains(1.0))
    assert(out("B").contains(-1.0))
    assert(out("C").isEmpty)
  }

  // ===================================================================
  // 3. PACF — independent Durbin-Levinson from pair-loop ACF
  // ===================================================================

  test("t_pacf matches an independently-coded Durbin-Levinson over " +
      "explicit pair-loop autocorrelations; phi_11 = rho_1 (Durbin 1960)") {
    // a fixed aperiodic 24-hour series (values 1..9, no structure)
    val counts = Seq(1L, 4L, 2L, 8L, 5L, 7L, 3L, 6L, 9L, 2L, 5L, 1L,
      7L, 4L, 8L, 3L, 9L, 6L, 2L, 7L, 5L, 8L, 4L, 6L)
    val out = run("t_pacf", fixture("pacf",
      "events" -> hourlyEvents(counts)))
      .map(r => r.getAs[Long]("lag") -> r.getAs[Double]("pacf")).toMap
    assert(out.size == 8)

    // the engine's per-lag rho: Pearson over aligned (x_t, x_{t-k})
    // pairs, rounded to 9 dp — recomputed here with explicit loops
    def rho(k: Int): Double = {
      val pairs = (k until counts.length).map(t =>
        (counts(t).toDouble, counts(t - k).toDouble))
      val n = pairs.length
      val sy = pairs.map(_._1).sum; val sx = pairs.map(_._2).sum
      val syy = pairs.map(p => p._1 * p._1).sum
      val sxx = pairs.map(p => p._2 * p._2).sum
      val sxy = pairs.map(p => p._1 * p._2).sum
      BigDecimal((n * sxy - sx * sy) /
          math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val rhos = (1 to 8).map(k => k -> rho(k)).toMap

    // Levinson recursion, coded fresh (arrays, not the engine's maps)
    val phi = Array.ofDim[Double](9, 9)
    phi(1)(1) = rhos(1)
    var v = 1.0 - rhos(1) * rhos(1)
    for (k <- 2 to 8) {
      val acc = (1 until k).map(j => phi(k - 1)(j) * rhos(k - j)).sum
      phi(k)(k) = (rhos(k) - acc) / v
      for (j <- 1 until k)
        phi(k)(j) = phi(k - 1)(j) - phi(k)(k) * phi(k - 1)(k - j)
      v = v * (1.0 - phi(k)(k) * phi(k)(k))
    }
    (1 to 8).foreach { k =>
      assert(out(k.toLong) == round6(phi(k)(k)),
        s"lag $k: engine ${out(k.toLong)} vs DL ${round6(phi(k)(k))}")
    }
    assert(out(1L) == round6(rhos(1))) // the definitional identity
  }
}
