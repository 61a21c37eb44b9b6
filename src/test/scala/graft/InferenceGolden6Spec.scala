package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Published-value micro-goldens, part 6 — the mop-up of the last
  * estimator families with no derivation-independent anchor: the
  * A/B z-test, binary-segmentation changepoint, the hash-seeded
  * Poisson bootstrap pair, the Ljung-Box portmanteau, overdispersion,
  * and the power/MDE planner.
  *
  * Anchors:
  *  - Two-proportion z (the standard pooled form): identical arms
  *    give z = 0 exactly; an unequal fixture is recomputed from the
  *    definitional formula with the published 1.96 criterion.
  *  - Binary segmentation (Scott & Knott 1974 / CUSUM-gain form): on
  *    a clean step the gain G(i) = s²/i + (S−s)²/(n−i) is maximized
  *    exactly at the step — recomputed by an explicit argmax loop.
  *  - Bootstrap degeneracy: every resample of a CONSTANT sample has
  *    the same mean and median as the sample — all 50 hash-seeded
  *    Poisson replicates must collapse to the constant (Efron 1979's
  *    trivial fixed point; any weighting bug breaks it).
  *  - Ljung-Box (1978): a perfectly periodic series attains the
  *    ceiling ρ²_k = 1 at EVERY lag, so Q = n(n+2)·Σ_{k≤12} 1/(n−k)
  *    in closed form (the engine's aligned-pair Pearson hits ±1
  *    exactly because every lagged pair lies on one line).
  *  - Dispersion: a deterministic (constant-rate) arrival stream has
  *    variance 0, so the variance-to-mean index is exactly 0 — the
  *    floor of the Poisson D = 1 calibration the query's scaladoc
  *    cites.
  *  - Power/MDE: the pinned 2.801585 is the published z₀.₉₇₅ + z₀.₈
  *    = 1.959964 + 0.841621 (the α = 0.05 / power = 0.80 planning
  *    standard); a two-point fixture recomputes MDE by hand.
  */
@graft.Golden
class InferenceGolden6Spec extends SparkSpec {

  private def fixture(name: String, tables: (String, DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"golden6_$name").toString
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

  // ===================================================================
  // 1. Two-proportion z-test — identical arms give z = 0 exactly
  // ===================================================================

  test("a22_ab_test: identical arms give z = 0 and not-significant; an " +
      "unequal fixture matches the pooled-variance formula") {
    def ev(armEvents: Seq[(Long, Int, Int)]): DataFrame = {
      // (user parity, total events, purchases)
      var eid = 0L
      eventsAt(armEvents.flatMap { case (uid, n, k) =>
        (1 to n).map { i =>
          eid += 1
          (eid, Day0 + eid, uid, if (i <= k) "purchase" else "view", 1.0)
        }
      })
    }
    val eq = run("a22_ab_test", fixture("ab_eq",
      "events" -> ev(Seq((0L, 10, 3), (1L, 10, 3))))).head
    assert(eq.getAs[Double]("z") == 0.0)
    assert(!eq.getAs[Boolean]("significant"))

    val ne = run("a22_ab_test", fixture("ab_ne",
      "events" -> ev(Seq((0L, 20, 10), (1L, 20, 5))))).head
    val (pa, pb, pp) = (0.5, 0.25, 15.0 / 40.0)
    val z = (pa - pb) / math.sqrt(pp * (1.0 - pp) * (1.0 / 20 + 1.0 / 20))
    assert(ne.getAs[Double]("z") == round6(z))
    assert(!ne.getAs[Boolean]("significant")) // z ≈ 1.633 < 1.96
  }

  // ===================================================================
  // 2. Binary segmentation — the clean step is the exact argmax
  // ===================================================================

  test("a47_changepoint_binseg finds a clean step exactly, matching an " +
      "explicit argmax over every split") {
    import spark.implicits._
    // one order per day: 10 days at $10 then 10 days at $50
    val daily = (0 until 20).map(i => (if (i < 10) 10.0 else 50.0, i))
    val ords = daily.map { case (price, i) =>
      (i.toLong + 1, f"2024-01-${i + 1}%02d", price)
    }.toDF("o_orderkey", "ds", "o_totalprice")
      .select(col("o_orderkey"), to_date(col("ds")).as("o_orderdate"),
        col("o_totalprice"))
    val r = run("a47_changepoint_binseg", fixture("binseg",
      "orders" -> ords)).head

    // explicit argmax over all splits of the cents series
    val cs = daily.map { case (p, _) => math.round(p * 100) }
    val st = cs.sum.toDouble
    val n = cs.length
    val gains = (1 until n).map { i =>
      val s = cs.take(i).sum.toDouble
      i -> (s * s / i + (st - s) * (st - s) / (n - i))
    }
    val (bestI, bestG) = gains.maxBy(_._2)
    assert(bestI == 10) // the step
    val day0 = 19723L // 2024-01-01 as epoch days
    assert(r.getAs[Long]("split_day") == day0 + bestI - 1)
    assert(r.getAs[Long]("n_days") == 20L)
    assert(r.getAs[Long]("mean_left_cents") == 1000L)
    assert(r.getAs[Long]("mean_right_cents") == 5000L)
    assert(r.getAs[Double]("gain") ==
      BigDecimal(bestG - st * st / n)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  // ===================================================================
  // 3+4. Bootstrap — every resample of a constant is the constant
  // ===================================================================

  test("a33_bootstrap_ci and a40_bootstrap_median collapse to the constant " +
      "on constant data (the bootstrap's trivial fixed point)") {
    val const = eventsAt((1L to 40L).map(i =>
      (i, Day0 + i, i % 7, "view", 7.25)))
    val dir = fixture("boot", "events" -> const)
    val means = run("a33_bootstrap_ci", dir)
    assert(means.length >= 45) // replicates with n_eff = 0 are legal but rare
    means.foreach { r =>
      assert(r.getAs[Double]("mean_cents") == 725.0)
      assert(r.getAs[Long]("n_eff") > 0L)
    }
    val medians = run("a40_bootstrap_median", dir)
    assert(medians.length >= 45)
    medians.foreach(r => assert(r.getAs[Long]("median_cents") == 725L))
  }

  // ===================================================================
  // 5. Ljung-Box — the periodic ceiling Q = n(n+2)·Σ 1/(n−k)
  // ===================================================================

  test("t_ljung_box attains the periodic ceiling: every lag's rho is " +
      "exactly +-1, so Q = n(n+2) sum 1/(n-k)") {
    // 30 hours alternating 1,3 — every lagged pair set lies on one
    // line, so the aligned-pair Pearson is exactly ±1 at every lag
    var eid = 0L
    val rows = (0 until 30).flatMap { h =>
      val k = if (h % 2 == 0) 1 else 3
      (1 to k).map { i => eid += 1; (eid, Day0 + h * 3600L + i, eid % 5, "view", 1.0) }
    }
    val r = run("t_ljung_box", fixture("lb",
      "events" -> eventsAt(rows))).head
    assert(r.getAs[Long]("n") == 30L && r.getAs[Long]("n_lags") == 12L)
    // replicate the engine's ×1e15 per-term pin on the exact-ceiling
    // terms, then compare the 6-dp Q to the closed form
    val sterm = (1 to 12).map(k => math.round(1.0e15 / (30 - k))).sum
    assert(r.getAs[Double]("q_lb") == round6(30.0 * 32 * sterm / 1.0e15))
    val closed = 30.0 * 32 * (1 to 12).map(k => 1.0 / (30 - k)).sum
    assert(math.abs(r.getAs[Double]("q_lb") - closed) < 1e-6)
  }

  // ===================================================================
  // 6. Dispersion — deterministic arrivals have index exactly 0
  // ===================================================================

  test("a34_dispersion is exactly 0 on a constant-rate stream (the floor " +
      "under the Poisson D = 1 calibration)") {
    var eid = 0L
    val rows = (0 until 10).flatMap { h =>
      (1 to 4).map { i => eid += 1; (eid, Day0 + h * 3600L + i, eid, "view", 1.0) }
    }
    val r = run("a34_dispersion", fixture("disp",
      "events" -> eventsAt(rows))).head
    assert(r.getAs[Long]("n_hours") == 10L)
    assert(r.getAs[Double]("mean_per_hour") == 4.0)
    assert(r.getAs[Double]("dispersion") == 0.0)
  }

  // ===================================================================
  // 7. Power/MDE — the published z-quantile sum on a hand fixture
  // ===================================================================

  test("a66_power_mde reproduces the hand MDE with the published " +
      "z(0.975) + z(0.80) = 2.801585 planning constant") {
    import spark.implicits._
    // arm by custkey parity: both arms hold {$10, $20}
    val ords = Seq((1L, 1L, 10.0), (2L, 3L, 20.0),
      (3L, 2L, 10.0), (4L, 4L, 20.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val r = run("a66_power_mde", fixture("mde", "orders" -> ords)).head
    assert(r.getAs[Long]("na") == 2L && r.getAs[Long]("nb") == 2L)
    assert(r.getAs[Double]("mean_a") == 15.0)
    assert(r.getAs[Double]("mean_b") == 15.0)
    // pooled v = (0.5e6 + 0.5e6)/2 cents² ⇒ σ = √(5e5)/100 dollars
    val v = 5.0e5
    assert(r.getAs[Double]("sigma") == round6(math.sqrt(v) / 100.0))
    val mdeAbs = (1.959964 + 0.841621) * math.sqrt(v) * math.sqrt(1.0) / 100.0
    assert(r.getAs[Double]("mde_abs") == round6(mdeAbs))
    assert(r.getAs[Double]("mde_rel") == round6(mdeAbs * 100.0 / 1500.0))
  }
}
