package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Published-value micro-goldens, part 4: the causal/robust/inequality
  * estimators — the last families carrying shared-derivation risk with
  * no independent anchor.
  *
  * Anchors:
  *  - Shapley value (Shapley 1953): the SYMMETRY + EFFICIENCY axioms —
  *    for a symmetric game v(S) = |S|/n the unique fair split is
  *    φ_c = v(N)/n for every channel (here 0.25 each); and a full
  *    naive recompute of Σ_S |S|!(n−1−|S|)!/n!·(v(S∪c)−v(S)) on an
  *    asymmetric game, a derivation disjoint from the engine's
  *    mask-grid fold.
  *  - CUPED (Deng, Xu, Kohavi & Walker 2013, WSDM): θ = cov(X,Y)/
  *    var(X) and the variance reduction is exactly ρ² — a linearly
  *    dependent pre-period covariate (Y = 2X) gives θ = 2 and
  *    ρ² = 1, the paper's own limiting case.
  *  - Difference-in-differences (the Card-Krueger 2×2 algebra): DiD =
  *    (ȳ_treat,post − ȳ_treat,pre) − (ȳ_ctrl,post − ȳ_ctrl,pre), a
  *    hand-exact four-cell contrast.
  *  - Median-of-means (Nemirovsky & Yudin 1983): corrupting ONE block
  *    of 15 leaves the MoM estimate exactly unmoved while the plain
  *    mean is dragged arbitrarily — the robustness theorem the
  *    estimator exists for.
  *  - Gini (Gini 1912): G = 0 on equal incomes, and the rank formula
  *    (2Σi·x₍ᵢ₎ − (n+1)Σx)/(nΣx) must agree with the independent
  *    mean-absolute-difference definition Σᵢⱼ|xᵢ−xⱼ|/(2n²x̄).
  *  - Markov stationary distribution: a DOUBLY STOCHASTIC chain has
  *    the uniform distribution as its stationary law (standard chain
  *    theory) — the engine's integer power iteration must hold the
  *    uniform mass exactly through all three rounds.
  */
@graft.Golden
class InferenceGolden4Spec extends SparkSpec {

  private def fixture(name: String, tables: (String, DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"golden4_$name").toString
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
  // 1. Shapley — symmetry/efficiency axioms, then a naive recompute
  // ===================================================================

  private val ChannelBits =
    Seq("view" -> 1L, "click" -> 2L, "signup" -> 4L, "error" -> 8L)

  /** Sessions for `spec`: per (mask, nSessions, nConversions), each
    * session a distinct user whose pre-purchase touch set is exactly
    * the mask's channels.
    */
  private def journeyEvents(spec: Seq[(Long, Int, Int)]): DataFrame = {
    var eid = 0L
    var uid = 0L
    val rows = Seq.newBuilder[(Long, Long, Long, String, Double)]
    spec.foreach { case (mask, nSess, nConv) =>
      (1 to nSess).foreach { i =>
        uid += 1
        var t = Day0 + uid * 86400L // one session per user, well apart
        ChannelBits.foreach { case (tp, bit) =>
          if ((mask & bit) != 0) {
            eid += 1; t += 60L
            rows += ((eid, t, uid, tp, 1.0))
          }
        }
        if (i <= nConv) {
          eid += 1; t += 60L
          rows += ((eid, t, uid, "purchase", 1.0))
        }
      }
    }
    eventsAt(rows.result())
  }

  /** Naive Shapley over the exactly-S characteristic function (absent
    * masks → 0, the engine's documented convention).
    */
  private def shapleyRef(v: Map[Long, Double]): Map[String, Double] = {
    def vOf(m: Long): Double = v.getOrElse(m, 0.0)
    val w = Map(0 -> 6.0, 1 -> 2.0, 2 -> 2.0, 3 -> 6.0)
    ChannelBits.map { case (name, c) =>
      val phi = (0L until 16L)
        .filter(sm => (sm & c) == 0)
        .map(sm => w(java.lang.Long.bitCount(sm)) * (vOf(sm + c) - vOf(sm)))
        .sum / 24.0
      name -> round6(phi)
    }.toMap
  }

  test("a53_shapley_attribution: the symmetric game v(S)=|S|/4 splits " +
      "0.25 to every channel (Shapley 1953 symmetry + efficiency)") {
    // every nonempty mask present with 4 sessions, |S| of them
    // converting — v(S) = |S|/4, a symmetric game: the unique
    // axiomatic split is v(N)/n = 1/4 per channel, and efficiency
    // Σφ = v(N) = 1 holds by construction
    val spec = (1L to 15L).map(m => (m, 4, java.lang.Long.bitCount(m)))
    val out = run("a53_shapley_attribution",
      fixture("shapley_sym", "events" -> journeyEvents(spec)))
      .map(r => r.getAs[String]("channel") -> r.getAs[Double]("phi")).toMap
    assert(out.size == 4)
    out.values.foreach(phi => assert(phi == 0.25, s"phi $phi != 0.25"))

    // asymmetric game: v({view}) = 1, v({click}) = 1/2,
    // v({view,click}) = 3/4, everything else absent — engine must
    // equal the naive permutation-weight recompute channel by channel
    val spec2 = Seq((1L, 4, 4), (2L, 4, 2), (3L, 4, 3))
    val out2 = run("a53_shapley_attribution",
      fixture("shapley_asym", "events" -> journeyEvents(spec2)))
      .map(r => r.getAs[String]("channel") -> r.getAs[Double]("phi")).toMap
    val ref = shapleyRef(Map(1L -> 1.0, 2L -> 0.5, 3L -> 0.75))
    assert(out2 == ref)
    // symmetry spot-check inside the recompute: signup and error are
    // interchangeable dummies here
    assert(out2("signup") == out2("error"))
  }

  // ===================================================================
  // 2. CUPED — θ = cov/var; a linear covariate removes ALL variance
  // ===================================================================

  private def cupedTables(spend: Seq[(Long, Double, Double)]): Seq[(String, DataFrame)] = {
    import spark.implicits._
    val cust = spend.map { case (ck, _, _) => (ck, "BUILDING") }
      .toDF("c_custkey", "c_mktsegment")
    val ords = spend.flatMap { case (ck, pre, post) =>
      Seq((ck * 2, ck, "1997-06-01", pre), (ck * 2 + 1, ck, "1998-06-01", post))
    }.toDF("o_orderkey", "o_custkey", "ds", "o_totalprice")
      .select(col("o_orderkey"), col("o_custkey"),
        to_date(col("ds")).as("o_orderdate"), col("o_totalprice"))
    Seq("customer" -> cust, "orders" -> ords)
  }

  test("a57_cuped: a linear pre-period covariate (Y = 2X) gives theta = 2 " +
      "and variance reduction exactly 1 (Deng et al. 2013 rho^2 law)") {
    val lin = Seq((1L, 10.0, 20.0), (2L, 20.0, 40.0),
      (3L, 30.0, 60.0), (4L, 40.0, 80.0))
    val r = run("a57_cuped", fixture("cuped_lin", cupedTables(lin): _*)).head
    assert(r.getAs[Long]("n") == 4L)
    assert(r.getAs[Double]("theta") == 2.0)
    assert(r.getAs[Double]("var_reduction") == 1.0)

    // general case vs the definitional cov/var recompute (in cents,
    // as the engine computes)
    val gen = Seq((1L, 10.0, 35.0), (2L, 20.0, 30.0),
      (3L, 30.0, 80.0), (4L, 40.0, 55.0))
    val r2 = run("a57_cuped", fixture("cuped_gen", cupedTables(gen): _*)).head
    val xs = gen.map(_._2 * 100)
    val ys = gen.map(_._3 * 100)
    val n = xs.length
    val mx = xs.sum / n
    val my = ys.sum / n
    val cxy = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
    val vx = xs.map(x => (x - mx) * (x - mx)).sum
    val vy = ys.map(y => (y - my) * (y - my)).sum
    assert(r2.getAs[Double]("theta") == round6(cxy / vx))
    assert(r2.getAs[Double]("var_reduction") == round6(cxy * cxy / (vx * vy)))
  }

  // ===================================================================
  // 3. Difference-in-differences — the hand-exact 2×2 contrast
  // ===================================================================

  test("a58_diff_in_diff reproduces the four-cell contrast exactly: " +
      "(18-10) - (9-5) = 4") {
    import spark.implicits._
    val cust = Seq((1L, "BUILDING"), (2L, "MACHINERY"))
      .toDF("c_custkey", "c_mktsegment")
    // treated pre {8, 12} (mean 10) / post {18}; control pre {5} /
    // post {9}
    val ords = Seq(
      (1L, 1L, "1997-03-01", 8.0), (2L, 1L, "1997-09-01", 12.0),
      (3L, 1L, "1998-03-01", 18.0),
      (4L, 2L, "1997-03-01", 5.0), (5L, 2L, "1998-03-01", 9.0))
      .toDF("o_orderkey", "o_custkey", "ds", "o_totalprice")
      .select(col("o_orderkey"), col("o_custkey"),
        to_date(col("ds")).as("o_orderdate"), col("o_totalprice"))
    val r = run("a58_diff_in_diff", fixture("did",
      "customer" -> cust, "orders" -> ords)).head
    assert(r.getAs[Double]("t_pre") == 10.0)
    assert(r.getAs[Double]("t_post") == 18.0)
    assert(r.getAs[Double]("c_pre") == 5.0)
    assert(r.getAs[Double]("c_post") == 9.0)
    assert(r.getAs[Double]("did") == 4.0)
  }

  // ===================================================================
  // 4. Median-of-means — one corrupted block moves nothing
  // ===================================================================

  test("a56_median_of_means: corrupting one block of 15 leaves MoM at the " +
      "clean value while the plain mean is dragged (Nemirovsky-Yudin)") {
    // event_id 1..15 → one event per block; block 7 corrupted
    val rows = (1L to 15L).map { i =>
      (i, Day0 + i, i, "view", if (i == 7L) 10000.0 else 10.0)
    }
    val r = run("a56_median_of_means", fixture("mom",
      "events" -> eventsAt(rows))).head
    assert(r.getAs[Long]("n") == 15L)
    assert(r.getAs[Double]("mom_mean") == 10.0)
    assert(r.getAs[Double]("plain_mean") == round6((14 * 10.0 + 10000.0) / 15))
  }

  // ===================================================================
  // 5. Gini — G = 0 on equality; rank formula ≡ mean-absolute-difference
  // ===================================================================

  test("a32_gini_spend: equal spends give G = 0; the rank formula agrees " +
      "with Gini's 1912 mean-absolute-difference definition") {
    import spark.implicits._
    val cust = ((1L to 4L).map(ck => (ck, 0L)) ++ (5L to 8L).map(ck => (ck, 1L)))
      .toDF("c_custkey", "c_nationkey")
    val spends = Map(1L -> 25.0, 2L -> 25.0, 3L -> 25.0, 4L -> 25.0,
      5L -> 0.01, 6L -> 0.01, 7L -> 0.01, 8L -> 99.97)
    val ords = spends.toSeq.sortBy(_._1).map { case (ck, v) => (ck * 10, ck, v) }
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val out = run("a32_gini_spend", fixture("gini",
      "customer" -> cust, "orders" -> ords))
      .map(r => r.getAs[Long]("nation_key") -> r.getAs[Double]("gini")).toMap
    assert(out(0L) == 0.0) // perfect equality

    // nation 1 vs the definitional G = Σᵢⱼ|xᵢ−xⱼ| / (2n²·mean)
    val xs = Seq(1L, 1L, 1L, 9997L).map(_.toDouble)
    val mad = (for { a <- xs; b <- xs } yield math.abs(a - b)).sum
    val g = mad / (2.0 * xs.length * xs.length * (xs.sum / xs.length))
    assert(out(1L) == round6(g))
  }

  // ===================================================================
  // 6. Markov stationary — doubly stochastic ⇒ uniform is invariant
  // ===================================================================

  test("a44_markov_stationary holds the uniform law exactly on a doubly " +
      "stochastic chain through all integer power-iteration rounds") {
    // transition counts click→click=2, click→view=2, view→click=2,
    // view→view=2: row- AND column-stochastic, so uniform (500000,
    // 500000) is stationary and the integer division is exact
    // (500000·2 div 4 = 250000 — no truncation loss any round)
    var eid = 0L
    def chain(uid: Long, types: Seq[String]): Seq[(Long, Long, Long, String, Double)] =
      types.zipWithIndex.map { case (tp, i) =>
        eid += 1
        (eid, Day0 + uid * 86400L + i * 60L, uid, tp, 1.0)
      }
    val rows = chain(1L, Seq("click", "view", "click", "view", "click")) ++
      chain(2L, Seq("click", "click", "click")) ++
      chain(3L, Seq("view", "view", "view"))
    val out = run("a44_markov_stationary", fixture("markov",
      "events" -> eventsAt(rows)))
      .map(r => r.getAs[String]("t") -> r.getAs[Long]("mass")).toMap
    assert(out == Map("click" -> 500000L, "view" -> 500000L))
  }
}
