package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Published-value micro-goldens, part 2: the survival, proportion,
  * sequential, and distribution-distance families InferenceGoldenSpec
  * does not reach (round-12 continuation of the verdict-2 program).
  *
  * Same rationale as part 1: the DuckDB oracle gates cross-ENGINE
  * divergence, not cross-DERIVATION error, so each family here is
  * anchored two independent ways — (1) a citable published worked
  * example or structural theorem, (2) a naive definitional
  * recomputation in plain Scala, disjoint from the engine's
  * histogram/window/fold derivations.
  *
  * Anchors used:
  *  - Kaplan-Meier and the log-rank test: the Freireich et al. (1965)
  *    6-MP leukemia-remission trial — THE canonical survival worked
  *    example (reproduced in Kleinbaum & Klein, "Survival Analysis",
  *    Ch. 1-2): 6-MP arm KM survival 0.857, 0.807, 0.753, 0.690,
  *    0.627, 0.538, 0.448 at weeks 6,7,10,13,16,22,23; two-arm
  *    log-rank χ² = 16.793 with E(placebo) = 10.75, Var = 6.257.
  *  - Nelson-Aalen: the additive estimator H(t) = Σ d/n (Nelson 1972,
  *    Aalen 1978) on the same arm, definitionally recomputed.
  *  - Pearson χ² / Cramér's V: the balanced-2×2 value χ² = 4 (every
  *    cell contributes exactly (±5)²/25 = 1), independence ⇒ χ² = 0,
  *    and Cramér's (1946) ceilings V = 1 at perfect association /
  *    V = 0 at independence — the ceiling only holds when EMPTY cells
  *    contribute (0−e)²/e = e, which is what the round-12 grid fix
  *    guarantees.
  *  - Wilson score interval: Newcombe (1998, Stat. in Medicine 17),
  *    worked example 81/263 ⇒ 95% interval (0.2553, 0.3662); and the
  *    boundary theorem that the interval never escapes [0,1] — at
  *    p̂ = 1 the upper bound is exactly 1 (the Wald interval's
  *    published failure mode, the query's own scaladoc motivation).
  *  - SPRT: Wald's (1947) boundaries A = (1−β)/α = 19; a pure-success
  *    run crosses at exactly ⌈ln A / ln(p₁/p₀)⌉ = 6 observations and
  *    a pure-failure run at ⌈ln A / ln(q₀/q₁)⌉ = 24 — the minimal
  *    sample-number lattice walk, checked in the engine's pinned
  *    ×10⁹ integer ladder.
  *  - Two-sample Cramér-von Mises: Anderson (1962, Ann. Math.
  *    Statist. 33) rank formula T = U/(nm·N) − (4mn−1)/(6N) with
  *    U = nΣ(rᵢ−i)² + mΣ(sⱼ−j)²; the {1,2,3} vs {4,5,6} separation
  *    gives T = 19/36 = 0.527778, and identical samples give T = 0.
  *  - Energy distance: Székely & Rizzo (2004) E = 2E|X−Y| − E|X−X'|
  *    − E|Y−Y'|, zero iff equal distributions; hand fixtures.
  *
  * Fixtures flow through the REAL query closures over temp parquet
  * corpora, so session detection, censoring edges, the hourly grid,
  * and the cents pinning are exercised, not re-derived.
  */
@graft.Golden
class InferenceGolden2Spec extends SparkSpec {

  // ----- fixture plumbing (InferenceGoldenSpec's, self-contained) ---

  private def fixture(name: String, tables: (String, DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"golden2_$name").toString
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

  /** events rows from epoch SECONDS (UTC session TZ pinned). */
  private def eventsAt(rows: Seq[(Long, Long, Long, String, Double)]): DataFrame = {
    import spark.implicits._
    rows.toDF("event_id", "sec", "user_id", "event_type", "value")
      .select(col("event_id"), timestamp_seconds(col("sec")).as("ts"),
        col("user_id"), col("event_type"), col("value"),
        lit("{}").as("props"))
  }

  private def round6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  // ----- the Freireich (1965) remission-time fixture ----------------

  /** 2024-01-01 00:00:00 UTC — a day boundary, so the engine's
    * day-floored d0 lands exactly here.
    */
  private val Day0 = 1704067200L
  private val Edge = Day0 + 19 * 86400L // 2024-01-20 00:00:00

  private val Gap = 21600L // the engine's 6 h session/censor horizon

  /** 6-MP arm (Freireich 1965): 9 relapses, 12 censored, in weeks. */
  private val MpDeaths = Seq(6L, 6L, 6L, 7L, 10L, 13L, 16L, 22L, 23L)
  private val MpCens = Seq(6L, 9L, 10L, 11L, 17L, 19L, 20L, 25L, 32L, 32L, 34L, 35L)

  /** Placebo arm: 21 relapses, none censored, in weeks. */
  private val PlDeaths = Seq(1L, 1L, 2L, 2L, 3L, 4L, 4L, 5L, 5L, 8L, 8L, 8L,
    8L, 11L, 11L, 12L, 12L, 15L, 17L, 22L, 23L)

  /** One subject = one user with a 2-event session of w·600 s (so the
    * engine's (last−first) div 600 duration bucket IS the week
    * count; max w = 35 ⇒ 21000 s < the 6 h gap, one session).
    * Died subjects end well before Edge−6h; censored subjects end
    * inside the final 6 h window; a lone anchor event at Edge pins
    * the corpus edge (duration-0, censored, invisible to every
    * week ≥ 1 risk set).
    */
  private def survivalEvents(
      early: Seq[(Long, Boolean)], // (weeks, died) starting day 1-2
      late: Seq[(Long, Boolean)]): DataFrame = { // starting day 17+
    var eid = 0L
    def next(): Long = { eid += 1; eid }
    val rows = Seq.newBuilder[(Long, Long, Long, String, Double)]
    early.zipWithIndex.foreach { case ((w, died), i) =>
      require(died, "early arm must be uncensored in this fixture")
      val uid = 100L + i
      val s0 = Day0 + i * 3600L
      rows += ((next(), s0, uid, "view", 0.0))
      rows += ((next(), s0 + w * 600L, uid, "view", 0.0))
    }
    late.zipWithIndex.foreach { case ((w, died), i) =>
      val uid = 500L + i
      if (died) {
        val s0 = Day0 + 16 * 86400L + i * 3600L
        rows += ((next(), s0, uid, "view", 0.0))
        rows += ((next(), s0 + w * 600L, uid, "view", 0.0))
      } else {
        val s1 = Edge - 18000L + i * 60L // inside (Edge−6h, Edge)
        rows += ((next(), s1 - w * 600L, uid, "view", 0.0))
        rows += ((next(), s1, uid, "view", 0.0))
      }
    }
    rows += ((next(), Edge, 999L, "view", 0.0)) // edge anchor
    eventsAt(rows.result())
  }

  /** (time, died) subject list for naive recomputation. */
  private def subjects(arms: Seq[(Long, Boolean)]*): Seq[(Long, Boolean)] =
    arms.flatten

  // ===================================================================
  // 1. Kaplan-Meier — the Freireich 6-MP arm published curve
  // ===================================================================

  test("a36_survival_km reproduces the published Freireich 6-MP curve " +
      "(0.857, 0.807, ..., 0.448)") {
    val dir = fixture("km", "events" -> survivalEvents(
      early = Seq.empty,
      late = MpDeaths.map(_ -> true) ++ MpCens.map(_ -> false)))
    val out = run("a36_survival_km", dir)
      .map(r => (r.getAs[Long]("dur_10min"), r.getAs[Long]("n_risk"),
        r.getAs[Long]("deaths"), r.getAs[Double]("survival")))

    // naive product-limit recompute: S(t) = Π_{s ≤ t} (1 − d_s/n_s),
    // n_s = #{duration ≥ s}, censored-at-s still at risk at s — the
    // same double-product op order as the engine's packed fold
    val subj = subjects(MpDeaths.map(_ -> true), MpCens.map(_ -> false),
      Seq(0L -> false)) // the edge anchor is a duration-0 censored row
    val deathTimes = subj.collect { case (t, true) => t }.distinct.sorted
    var s = 1.0
    val expected = deathTimes.map { t =>
      val n = subj.count(_._1 >= t).toLong
      val d = subj.count(x => x._1 == t && x._2).toLong
      s *= (1.0 - d.toDouble / n.toDouble)
      (t, n, d, round6(s))
    }
    assert(out.toSeq == expected)

    // the published table (Gehan 1965 / Kleinbaum & Klein Table 1.1,
    // 4 dp): risk sets 21,17,15,12,11,7,6 and the survival ladder
    assert(out.map(_._2).toSeq == Seq(21L, 17L, 15L, 12L, 11L, 7L, 6L))
    val published = Seq(0.8571, 0.8067, 0.7529, 0.6902, 0.6275, 0.5378, 0.4482)
    out.map(_._4).zip(published).foreach { case (got, pub) =>
      assert(math.abs(got - pub) < 5e-5, s"KM $got vs published $pub")
    }
  }

  // ===================================================================
  // 2. Nelson-Aalen — additive hazard on the same arm
  // ===================================================================

  test("a52_nelson_aalen matches the definitional H(t) = sum d/n " +
      "(Nelson 1972) on the Freireich arm") {
    val dir = fixture("na", "events" -> survivalEvents(
      early = Seq.empty,
      late = MpDeaths.map(_ -> true) ++ MpCens.map(_ -> false)))
    val out = run("a52_nelson_aalen", dir)
      .map(r => (r.getAs[Long]("dur_10min"), r.getAs[Long]("n_risk"),
        r.getAs[Long]("deaths"), r.getAs[Double]("cum_hazard"),
        r.getAs[Double]("se")))

    val subj = subjects(MpDeaths.map(_ -> true), MpCens.map(_ -> false),
      Seq(0L -> false))
    val deathTimes = subj.collect { case (t, true) => t }.distinct.sorted
    var h = 0.0
    var v = 0.0
    val expected = deathTimes.map { t =>
      val n = subj.count(_._1 >= t).toLong
      val d = subj.count(x => x._1 == t && x._2).toLong
      h += d.toDouble / n.toDouble
      v += d.toDouble / (n.toDouble * n.toDouble)
      (t, n, d, round6(h), round6(math.sqrt(v)))
    }
    assert(out.toSeq == expected)
    // first step is the exact rational 3/21 = 0.142857; the ladder
    // ends at 0.752114 (vs KM's −ln S = 0.802 — NA ≤ −ln KM always)
    assert(out.head._4 == 0.142857)
    assert(out.last._4 == 0.752114)
  }

  // ===================================================================
  // 3. Log-rank — the two-arm Freireich trial, χ² = 16.793
  // ===================================================================

  test("a37_logrank reproduces the published Freireich two-arm chi2 = 16.793") {
    // group 1 = sessions starting in the first 15 days = placebo;
    // group 2 = the 6-MP arm (its censored subjects must sit at the
    // corpus edge, which forces them late — hence this mapping)
    val dir = fixture("logrank", "events" -> survivalEvents(
      early = PlDeaths.map(_ -> true),
      late = MpDeaths.map(_ -> true) ++ MpCens.map(_ -> false)))
    val out = run("a37_logrank", dir)
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n1_sessions") == 21L)
    assert(r.getAs[Long]("n2_sessions") == 22L) // 21 subjects + edge anchor
    assert(r.getAs[Long]("o1") == 21L) // every placebo subject relapsed

    // naive recompute from the standard definition over pooled death
    // times (Kleinbaum & Klein eq. 2.1-2.3)
    val subj = PlDeaths.map(t => (t, true, 1)) ++
      MpDeaths.map(t => (t, true, 2)) ++ MpCens.map(t => (t, false, 2)) :+
      ((0L, false, 2))
    val deathTimes = subj.collect { case (t, true, _) => t }.distinct.sorted
    var e1 = 0.0
    var va = 0.0
    var o1 = 0L
    deathTimes.foreach { t =>
      val n = subj.count(_._1 >= t).toDouble
      val n1 = subj.count(x => x._1 >= t && x._3 == 1).toDouble
      val d = subj.count(x => x._1 == t && x._2).toDouble
      o1 += subj.count(x => x._1 == t && x._2 && x._3 == 1).toLong
      if (n >= 2) {
        e1 += d * n1 / n
        va += d * (n1 / n) * (1.0 - n1 / n) * (n - d) / (n - 1.0)
      }
    }
    val chi2 = (o1 - e1) * (o1 - e1) / va
    assert(r.getAs[Long]("o1") == o1)
    assert(r.getAs[Double]("e1") == round6(e1))
    assert(r.getAs[Double]("var") == round6(va))
    assert(r.getAs[Double]("chi2") == round6(chi2))

    // the published values (Kleinbaum & Klein Ch. 2): E₁ = 10.75,
    // Var = 6.257, χ² = 16.793
    assert(math.abs(r.getAs[Double]("e1") - 10.75) < 0.001)
    assert(math.abs(r.getAs[Double]("var") - 6.257) < 0.001)
    assert(math.abs(r.getAs[Double]("chi2") - 16.793) < 0.001)
  }

  // ===================================================================
  // 4. Pearson chi-square — balanced 2×2, every cell contributing 1
  // ===================================================================

  test("a24_chi_square: the balanced 20/30/30/20 table gives chi2 = 4 " +
      "exactly; independence gives 0") {
    // arm = user_id % 2; uniform margins make every e = 25, so each
    // cell contributes (±5)²/25 = 1 — χ² = 4, dof = 1, hand-exact
    def ev(counts: Seq[(String, Long, Int)]): DataFrame = {
      var eid = 0L
      val rows = counts.flatMap { case (tp, uid, k) =>
        (1 to k).map { _ => eid += 1; (eid, Day0 + eid, uid, tp, 1.0) }
      }
      eventsAt(rows)
    }
    val dir = fixture("chi2", "events" -> ev(Seq(
      ("view", 0L, 20), ("view", 1L, 30), ("click", 0L, 30), ("click", 1L, 20))))
    val r = run("a24_chi_square", dir).head
    assert(r.getAs[Long]("n") == 100L)
    assert(r.getAs[Double]("chi2") == 4.0)
    assert(r.getAs[Long]("dof") == 1L)

    val dir2 = fixture("chi2ind", "events" -> ev(Seq(
      ("view", 0L, 20), ("view", 1L, 20), ("click", 0L, 30), ("click", 1L, 30))))
    val r2 = run("a24_chi_square", dir2).head
    assert(r2.getAs[Double]("chi2") == 0.0)
  }

  // ===================================================================
  // 5. Cramér's V — the V = 1 perfect-association ceiling
  // ===================================================================

  private val Segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE",
    "HOUSEHOLD", "MACHINERY")
  private val Pris = Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
    "4-NOT SPECIFIED", "5-LOW")

  private def tpch(orderPri: Seq[(Long, Int)]): Seq[(String, DataFrame)] = {
    // customer i ∈ 1..5 carries segment Segs(i−1); orderPri maps
    // custkey → priority index
    import spark.implicits._
    val cust = (1 to 5).map(i => (i.toLong, Segs(i - 1)))
      .toDF("c_custkey", "c_mktsegment")
    val ords = orderPri.zipWithIndex.map { case ((ck, pi), i) =>
      (i.toLong + 1, ck, Pris(pi), 100.0 + i)
    }.toDF("o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice")
    Seq("customer" -> cust, "orders" -> ords)
  }

  test("a67_cramers_v attains Cramér's published ceilings: V = 1 at " +
      "perfect association (with empty cells contributing), V = 0 at independence") {
    // perfect association: segment i places ONLY priority-i orders
    // (4 each) — a 5×5 diagonal table. χ² = N·min(r−1,c−1) = 80 and
    // V = 1 (Cramér 1946) REQUIRE the 20 empty cells' (0−e)²/e = e
    // terms: dropping them gives χ² = 64, V = 0.894 — the grid fix
    // this golden pins
    val diag = for { ck <- 1L to 5L; _ <- 1 to 4 } yield (ck, ck.toInt - 1)
    val dir = fixture("cramerv", tpch(diag): _*)
    val r = run("a67_cramers_v", dir).head
    assert(r.getAs[Long]("n") == 20L)
    assert(r.getAs[Double]("chi2") == 80.0)
    assert(r.getAs[Double]("cramers_v") == 1.0)

    // independence: every customer places one order of each priority
    val flat = for { ck <- 1L to 5L; pi <- 0 until 5 } yield (ck, pi)
    val dir2 = fixture("cramerv0", tpch(flat): _*)
    val r2 = run("a67_cramers_v", dir2).head
    assert(r2.getAs[Double]("chi2") == 0.0)
    assert(r2.getAs[Double]("cramers_v") == 0.0)
  }

  test("a67_cramers_v degenerate table (single observed segment): the " +
      "round-13-advice guard pins V = 0 and dof = 0, never NaN") {
    // all orders from customer 1 → r = 1, c = 3: min(r−1,c−1) = 0 and
    // chi2 = 0 — without greatest(…,1) the V division is 0/0 → NaN,
    // whose bit pattern the two engines need not agree on
    val one = Seq((1L, 0), (1L, 1), (1L, 2), (1L, 1))
    val r = run("a67_cramers_v", fixture("cramerv1", tpch(one): _*)).head
    assert(r.getAs[Long]("n") == 4L)
    assert(r.getAs[Long]("dof") == 0L)
    assert(r.getAs[Double]("chi2") == 0.0)
    assert(r.getAs[Double]("cramers_v") == 0.0)
  }

  // ===================================================================
  // 6. Wilson score interval — Newcombe's 81/263 worked example
  // ===================================================================

  test("a39_wilson_ci reproduces Newcombe (1998) example 81/263 -> " +
      "(0.2553, 0.3662) and the exact p-hat = 1 upper bound of 1") {
    var eid = 0L
    def ev(tp: String, k: Int): Seq[(Long, Long, Long, String, Double)] =
      (1 to k).map { _ => eid += 1; (eid, Day0 + eid, eid % 7, tp, 1.0) }
    val dir = fixture("wilson",
      "events" -> eventsAt(ev("click", 81) ++ ev("view", 182)))
    val out = run("a39_wilson_ci", dir)
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("k"), r.getAs[Long]("n"),
          r.getAs[Double]("lo"), r.getAs[Double]("hi"))).toMap
    val (k, n, lo, hi) = out("click")
    assert(k == 81L && n == 263L)
    // published to 4 dp in Newcombe's Table II (method 3)
    assert(math.abs(lo - 0.2553) < 5e-5, s"lo $lo")
    assert(math.abs(hi - 0.3662) < 5e-5, s"hi $hi")
    // naive recompute of the closed form with z = 1.96
    val z = 1.96
    val center = (81.0 + z * z / 2) / (263.0 + z * z)
    val hw = z * math.sqrt(81.0 * 182.0 / 263.0 + z * z / 4) / (263.0 + z * z)
    assert(lo == round6(center - hw) && hi == round6(center + hw))

    // boundary theorem: at k = n the upper bound is exactly 1 (and
    // the interval stays inside [0,1] — the Wald interval fails both)
    val dir2 = fixture("wilson1", "events" -> eventsAt(ev("view", 50)))
    val r2 = run("a39_wilson_ci", dir2).head
    assert(r2.getAs[Double]("hi") == 1.0)
    assert(r2.getAs[Double]("lo") > 0.9 && r2.getAs[Double]("lo") < 1.0)
  }

  // ===================================================================
  // 7. SPRT — Wald's minimal crossing counts on the lnA = ln 19 lattice
  // ===================================================================

  test("a74_sprt crosses at Wald's minimal sample numbers: 6 straight " +
      "successes for H1, 24 straight failures for H0") {
    // ceil(ln 19 / ln(0.25/0.15)) = ceil(5.764) = 6 (Wald 1947):
    // one purchase per hour → the 6th hour's cumulative LLR is the
    // first at/above the A boundary, exactly in the ×1e9 lattice
    def hourly(tp: String, hours: Int): DataFrame =
      eventsAt((0 until hours).map(h =>
        (h.toLong + 1, Day0 + h * 3600L + 1800L, h.toLong, tp, 1.0)))
    val dir = fixture("sprt1", "events" -> hourly("purchase", 10))
    val r = run("a74_sprt", dir).head
    assert(r.getAs[String]("decision") == "accept_h1")
    assert(r.getAs[Long]("n_at_cross") == 6L)
    assert(r.getAs[Long]("cross_hr") == (Day0 + 5 * 3600L) * 1000L)
    assert(r.getAs[Long]("llr9_at_cross") == 6L * 510825624L)
    assert(r.getAs[Long]("llr9_final") == 10L * 510825624L)

    // ceil(ln 19 / ln(0.85/0.75)) = ceil(23.525) = 24
    val dir2 = fixture("sprt0", "events" -> hourly("view", 30))
    val r2 = run("a74_sprt", dir2).head
    assert(r2.getAs[String]("decision") == "accept_h0")
    assert(r2.getAs[Long]("n_at_cross") == 24L)
    assert(r2.getAs[Long]("llr9_at_cross") == 24L * -125163143L)

    // the continue band: 5 successes then silence never crosses
    val dir3 = fixture("sprtc", "events" -> hourly("purchase", 5))
    val r3 = run("a74_sprt", dir3).head
    assert(r3.isNullAt(r3.fieldIndex("cross_hr")))
    assert(r3.getAs[Long]("llr9_final") == 5L * 510825624L)
  }

  // ===================================================================
  // 8. Two-sample Cramér-von Mises — Anderson's (1962) rank formula
  // ===================================================================

  test("a77_cramer_von_mises matches Anderson's rank formula: " +
      "{1,2,3} vs {4,5,6} gives T = 19/36; identical samples give 0") {
    def ev(clicks: Seq[Double], purchases: Seq[Double]): DataFrame = {
      var eid = 0L
      val rows = clicks.map { v => eid += 1; (eid, Day0 + eid, eid, "click", v) } ++
        purchases.map { v => eid += 1; (eid, Day0 + eid, eid, "purchase", v) }
      eventsAt(rows)
    }
    val dir = fixture("cvm", "events" -> ev(Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)))
    val r = run("a77_cramer_von_mises", dir).head
    assert(r.getAs[Long]("n") == 3L && r.getAs[Long]("m") == 3L)
    assert(r.getAs[Double]("t_cvm") == round6(19.0 / 36.0)) // 0.527778

    // Anderson's independent derivation: T = U/(nm·N) − (4mn−1)/(6N),
    // U = nΣ(rᵢ−i)² + mΣ(sⱼ−j)² over pooled ranks (tie-free fixture)
    val xs = Seq(1.0, 2.0, 3.0)
    val ys = Seq(4.0, 5.0, 6.0)
    val pooled = (xs ++ ys).sorted
    def ranks(s: Seq[Double]): Seq[Int] = s.map(v => pooled.indexOf(v) + 1)
    val u = xs.length * ranks(xs).zipWithIndex
      .map { case (ri, i) => (ri - (i + 1)) * (ri - (i + 1)) }.sum +
      ys.length * ranks(ys).zipWithIndex
        .map { case (sj, j) => (sj - (j + 1)) * (sj - (j + 1)) }.sum
    val nn = xs.length; val mm = ys.length; val tot = nn + mm
    val tAnderson = u.toDouble / (nn.toDouble * mm * tot) -
      (4.0 * mm * nn - 1) / (6.0 * tot)
    assert(math.abs(r.getAs[Double]("t_cvm") - tAnderson) < 1e-6)

    val dir2 = fixture("cvm0", "events" -> ev(Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0, 3.0)))
    assert(run("a77_cramer_von_mises", dir2).head.getAs[Double]("t_cvm") == 0.0)
  }

  // ===================================================================
  // 9. Energy distance — Székely-Rizzo's zero-iff-equal and a hand value
  // ===================================================================

  test("a59_energy_distance: hand fixture gives E = 45.0; identical " +
      "samples give the Székely-Rizzo zero") {
    // BUILDING {10, 20}, MACHINERY {40}:
    // E = 2·(30+20)/2 − 2·10/4 − 0 = 50 − 5 = 45 (dollars)
    import spark.implicits._
    def tpchVals(b: Seq[Double], m: Seq[Double]): Seq[(String, DataFrame)] = {
      val cust = Seq((1L, "BUILDING"), (2L, "MACHINERY"))
        .toDF("c_custkey", "c_mktsegment")
      val ords = (b.map((1L, _)) ++ m.map((2L, _))).zipWithIndex
        .map { case ((ck, v), i) => (i.toLong + 1, ck, "1-URGENT", v) }
        .toDF("o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice")
      Seq("customer" -> cust, "orders" -> ords)
    }
    val dir = fixture("energy", tpchVals(Seq(10.0, 20.0), Seq(40.0)): _*)
    val r = run("a59_energy_distance", dir).head
    assert(r.getAs[Long]("na") == 2L && r.getAs[Long]("nb") == 1L)
    assert(r.getAs[Double]("energy_dist") == 45.0)

    val dir2 = fixture("energy0", tpchVals(Seq(10.0, 20.0), Seq(10.0, 20.0)): _*)
    assert(run("a59_energy_distance", dir2).head
      .getAs[Double]("energy_dist") == 0.0)
  }
}
