package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Published-value micro-goldens, part 16 — second gauge-steered round
  * (GoldenCoverage's remaining clusters: the monitoring/series tail,
  * the sketch-overlap rung, the IR/stylometry scorers, the
  * optimizer-statistics ops, and the embedding-prep pair). Anchors:
  *
  *  - OLS trend: exact-line recovery (a perfect line returns its own
  *    slope and intercept — the least-squares residual-zero theorem)
  *    and the single-hour NULL guard.
  *  - Seasonal residual: the all-integer 1.25x/0.75x cross-multiplied
  *    thresholds are STRICT — hand fixtures sit exactly ON each
  *    boundary (unflagged) and just past it (flagged).
  *  - Rolling correlation: Pearson's ±1 ceilings on exactly linear /
  *    anti-linear hourly series, with the degenerate first frame
  *    (zero variance) pinned out.
  *  - Benford: the published log10(1 + 1/d) expectations (0.301030,
  *    0.176091, 0.079181) against hand-exact observed shares.
  *  - Gini mean difference: the rank-weighted closed form equals the
  *    hand pair enumeration, including a tie block.
  *  - Equi-depth histogram: distinct values spread one per bucket;
  *    a tie block straddling a cut lands WHOLE in its first rank's
  *    bucket (the documented honest drift).
  *  - KMV overlap: below k the whole theta-sketch estimator chain is
  *    EXACT (union sketch = the union, theta unused, rho = the true
  *    intersection) — the a42 exactness theorem lifted to pairs.
  *  - Norms: the 3-4-5 / 5-12-13 triangles; L2-normalize re-derives
  *    norm 1 and the exact first component.
  *  - BM25 (Robertson/Zaragoza, Lucene +1 idf): a hand corpus where
  *    df = N/2 makes idf = ln 2 exactly; scores replayed term by term.
  *  - PMI (Church-Hanks): a hand corpus where the collocation's PMI
  *    is ln 2 exactly.
  *  - Unigram Viterbi: an independent imperative DP over the same
  *    pinned piece table (derivation-disjoint from the aggregate-HOF
  *    fold and the DuckDB list_reduce), plus hand-walked words.
  */
@graft.Golden
class InferenceGolden16Spec extends SparkSpec {

  private def fixture(name: String, tables: (String, DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"golden16_$name").toString
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
      graft.queries.SimilarityQueries.releaseCaches()
      PlanWindows.releaseAll()
      spark.catalog.clearCache()
    }

  private def round6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private val Day0 = 1704067200L // 2024-01-01T00:00:00Z (session TZ is UTC)

  private def eventsRows(
      rows: Seq[(Long, Long, Long, String, Double)]): DataFrame = {
    import spark.implicits._
    rows.toDF("event_id", "sec", "user_id", "event_type", "value")
      .select(col("event_id"), timestamp_seconds(col("sec")).as("ts"),
        col("user_id"), col("event_type"), col("value"),
        lit("{}").as("props"))
  }

  /** c_h events of `tp` in hour h (UTC hours since Day0). */
  private def hourlyEvents(counts: Seq[(Long, String, Long)]): DataFrame = {
    var eid = 0L
    eventsRows(counts.flatMap { case (h, tp, c) =>
      (1L to c).map { i =>
        eid += 1; (eid, Day0 + h * 3600L + i, eid % 7, tp, 1.0)
      }
    })
  }

  private def ordersDf(cents: Seq[Long]): DataFrame = {
    import spark.implicits._
    cents.zipWithIndex.map { case (c, i) => (i.toLong + 1, 1L, c / 100.0) }
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
  }

  private def docsOf(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.map { case (id, text) => (id, text, "en", "s", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  // ===================================================================
  // 1. OLS trend — exact-line recovery, single-hour NULL guard
  // ===================================================================

  test("t_trend_slope recovers an exact line (slope 2, intercept 3) and " +
      "NULLs the single-hour degenerate") {
    val dir = fixture("trend", "events" -> hourlyEvents(
      Seq(0L, 1L, 2L, 3L).map(h => (h, "lin", 3L + 2L * h)) :+ ((0L, "one", 5L))))
    val out = run("t_trend_slope", dir)
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_hours"),
          Option(r.getAs[Any]("slope")), Option(r.getAs[Any]("intercept"))))
      .toMap
    assert(out("lin") == ((4L, Some(2.0), Some(3.0))))
    assert(out("one") == ((1L, None, None)))
  }

  // ===================================================================
  // 2. Seasonal residual — strict integer boundaries
  // ===================================================================

  test("t_seasonal_residual: exactly 1.25x/0.75x of the hour-of-day " +
      "baseline do NOT flag; just past them flags high/low") {
    def day(d: Long) = (d - 1L) * 24L // hours offset of 2024-01-d 00:00
    // baseline (before Jan 22): hod 5 on Jan 1 and Jan 2, counts 4+4
    val base = Seq((day(1) + 5, "view", 4L), (day(2) + 5, "view", 4L))
    // test week: cnt 6 -> 48 > 40 HIGH; cnt 5 -> 40 > 40 false (edge);
    // cnt 3 -> 24 < 24 false (edge); cnt 2 -> 16 < 24 LOW
    val test = Seq((day(22) + 5, "view", 6L), (day(23) + 5, "view", 5L),
      (day(24) + 5, "view", 3L), (day(25) + 5, "view", 2L))
    val out = run("t_seasonal_residual",
      fixture("seas", "events" -> hourlyEvents(base ++ test)))
      .map(r => (r.getAs[Long]("cnt"), r.getAs[Double]("base_avg"),
        r.getAs[String]("class")))
    assert(out.toSeq == Seq((6L, 4.0, "high"), (2L, 4.0, "low")))
  }

  // ===================================================================
  // 3. Rolling correlation — Pearson's ±1 ceilings
  // ===================================================================

  test("t_rolling_corr reads exactly +1 on a linear pair and -1 on an " +
      "anti-linear pair; the zero-variance first frame is pinned out") {
    // v = 2c: hours 0..2, click 1,2,3 / view 2,4,6
    val lin = (0L to 2L).flatMap(h => Seq(
      (h, "click", h + 1L), (h, "view", 2L * (h + 1L))))
    val o1 = run("t_rolling_corr", fixture("rc1", "events" -> hourlyEvents(lin)))
      .map(r => (r.getAs[Long]("n"), r.getAs[Double]("corr")))
    assert(o1.toSeq == Seq((2L, 1.0), (3L, 1.0))) // n=1 frame: d1=0, dropped
    // v = 5 - c: click 1,2,3 / view 4,3,2
    val anti = (0L to 2L).flatMap(h => Seq(
      (h, "click", h + 1L), (h, "view", 4L - h)))
    val o2 = run("t_rolling_corr", fixture("rc2", "events" -> hourlyEvents(anti)))
      .map(r => (r.getAs[Long]("n"), r.getAs[Double]("corr")))
    assert(o2.toSeq == Seq((2L, -1.0), (3L, -1.0)))
  }

  // ===================================================================
  // 4. Benford — the published log10(1 + 1/d) expectations
  // ===================================================================

  test("audit_benford reproduces the published first-digit expectations " +
      "against hand-exact observed shares") {
    // 15 x $1.00, 9 x $2.00, 6 x $5.00 -> obs 0.5 / 0.3 / 0.2
    val cents = Seq.fill(15)(100L) ++ Seq.fill(9)(200L) ++ Seq.fill(6)(500L)
    val out = run("audit_benford", fixture("ben", "orders" -> ordersDf(cents)))
      .map(r => r.getAs[String]("digit") ->
        (r.getAs[Long]("cnt"), r.getAs[Double]("obs_share"),
          r.getAs[Double]("exp_share"), r.getAs[Double]("chi2_term"))).toMap
    def e(d: Int) = math.log(1.0 + 1.0 / d.toDouble) / math.log(10.0)
    // Benford 1938 / Newcomb 1881 table values
    assert(out("1")._3 == 0.301030 && out("2")._3 == 0.176091 &&
      out("5")._3 == 0.079181)
    assert(out("1")._1 == 15L && out("1")._2 == 0.5)
    assert(out("1")._4 == round6((0.5 - e(1)) * (0.5 - e(1)) / e(1)))
    assert(out("5")._4 == round6((0.2 - e(5)) * (0.2 - e(5)) / e(5)))
  }

  // ===================================================================
  // 5. Gini mean difference — closed form == hand pair enumeration
  // ===================================================================

  test("w13_gini_mean_diff equals the hand pair enumeration, ties included") {
    // {1.00, 3.00, 6.00}: pair gaps 2 + 5 + 3 dollars -> mean 10/3
    val r1 = run("w13_gini_mean_diff",
      fixture("gmd1", "orders" -> ordersDf(Seq(100L, 300L, 600L)))).head
    assert(r1.getAs[Long]("n") == 3L)
    assert(r1.getAs[Double]("gmd_dollars") == 3.33)
    // tie block {1.00, 1.00, 3.00}: gaps 0 + 2 + 2 -> mean 4/3
    val r2 = run("w13_gini_mean_diff",
      fixture("gmd2", "orders" -> ordersDf(Seq(100L, 100L, 300L)))).head
    assert(r2.getAs[Double]("gmd_dollars") == 1.33)
  }

  // ===================================================================
  // 6. Equi-depth histogram — per-bucket spread and the tie straddle
  // ===================================================================

  test("w15_equidepth_hist: 8 distinct values land one per bucket; a tie " +
      "block straddling a cut stays whole in its first rank's bucket") {
    val r1 = run("w15_equidepth_hist",
      fixture("eq1", "orders" -> ordersDf((1L to 8L))))
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("n_rows"),
        r.getAs[Long]("lo_cents"), r.getAs[Long]("hi_cents")))
    assert(r1.toSeq == (0L to 7L).map(b => (b, 1L, b + 1, b + 1)))
    // {1 x5, 2 x3}: block of 1s -> bucket 0 (5 rows), block of 2s ->
    // bucket (5*8) div 8 = 5 (3 rows) - row counts drift from n/B
    // exactly where the tie straddles, never splitting a value
    val r2 = run("w15_equidepth_hist",
      fixture("eq2", "orders" -> ordersDf(Seq.fill(5)(1L) ++ Seq.fill(3)(2L))))
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("n_rows"),
        r.getAs[Long]("lo_cents")))
    assert(r2.toSeq == Seq((0L, 5L, 1L), (5L, 3L, 2L)))
  }

  // ===================================================================
  // 7. KMV overlap — below-k the estimator chain is exact
  // ===================================================================

  test("a45_kmv_overlap: below k the union sketch IS the union, so " +
      "jaccard/union/intersection estimates are exact") {
    def ev(id: Long, u: Long, dayOfMonth: Long, tp: String) =
      (id, Day0 + (dayOfMonth - 1L) * 86400L + 3600L, u, tp, 1.0)
    val purchase = Seq((1L, 1L), (1L, 2L), (2L, 1L), (3L, 1L), (4L, 1L))
    val error = Seq((1L, 1L), (2L, 1L), (5L, 1L), (5L, 2L))
    var id = 0L
    val rows =
      purchase.map { case (u, dm) => id += 1; ev(id, u, dm, "purchase") } ++
        error.map { case (u, dm) => id += 1; ev(id, u, dm, "error") }
    val r = run("a45_kmv_overlap",
      fixture("kmvo", "events" -> eventsRows(rows))).head
    assert(r.getAs[Long]("n_a") == 5L && r.getAs[Long]("n_b") == 4L)
    assert(r.getAs[Long]("inter_true") == 2L)
    assert(r.getAs[Long]("nu") == 7L && r.getAs[Long]("rho") == 2L)
    assert(r.getAs[Double]("union_est") == 7.0)
    assert(r.getAs[Double]("jaccard_est") ==
      BigDecimal(2.0 / 7.0).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.getAs[Double]("inter_est") == 2.0)
  }

  // ===================================================================
  // 8. Norms — the Pythagorean triangles; L2-normalize re-derives 1
  // ===================================================================

  private def embDf(rows: Seq[(Long, Seq[Float], Int)]): DataFrame = {
    import spark.implicits._
    rows.map { case (id, v, l) => (id, v.toArray, l) }
      .toDF("vec_id", "embedding", "label")
  }

  test("sim2_norm_stats reads the 3-4-5 and 5-12-13 triangles exactly") {
    val dir = fixture("nrm", "embeddings" -> embDf(Seq(
      (1L, Seq(3f, 4f), 1), (2L, Seq(6f, 8f), 1), (3L, Seq(5f, 12f), 2))))
    val out = run("sim2_norm_stats", dir)
      .map(r => r.getAs[Int]("label") ->
        (r.getAs[Long]("cnt"), r.getAs[Double]("avg_norm"),
          r.getAs[Double]("min_norm"), r.getAs[Double]("max_norm"))).toMap
    assert(out(1) == ((2L, 7.5, 5.0, 10.0)))
    assert(out(2) == ((1L, 13.0, 13.0, 13.0)))
  }

  test("sim6_l2_normalize: re-derived norms are 1, first components exact") {
    val dir = fixture("l2n", "embeddings" -> embDf(Seq(
      (1L, Seq(3f, 4f), 1), (2L, Seq(6f, 8f), 1), (3L, Seq(5f, 12f), 2))))
    val out = run("sim6_l2_normalize", dir)
      .map(r => r.getAs[Int]("label") ->
        (r.getAs[Double]("avg_renorm"), r.getAs[Double]("avg_c1"))).toMap
    assert(out(1) == ((1.0, 0.6))) // both rows normalize to (0.6, 0.8)
    assert(out(2) == ((1.0, round6(5.0 / 13.0))))
  }

  // ===================================================================
  // 9. BM25 — hand corpus with idf = ln 2 exactly
  // ===================================================================

  test("tx26_bm25 reproduces the Robertson/Zaragoza formula on a hand " +
      "corpus (df = N/2 makes the +1 idf exactly ln 2)") {
    // 4 docs of 4 tokens (avgdl = dl = 4): 'spark' in docs 1 (tf 1)
    // and 2 (tf 2); df = 2 of N = 4 -> idf = ln(1 + 2.5/2.5) = ln 2
    val dir = fixture("bm", "documents" -> docsOf(Seq(
      (1L, "spark a b c"), (2L, "spark spark b c"),
      (3L, "d e f g"), (4L, "h i j k"))))
    val out = run("tx26_bm25", dir)
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("bm25"),
        r.getAs[Long]("n_terms")))
    val idf = math.log(1.0 + (4.0 - 2.0 + 0.5) / (2.0 + 0.5))
    def w(tf: Double) = round6(idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * 1.0)))
    assert(out.toSeq == Seq((2L, w(2.0), 1L), (1L, w(1.0), 1L)))
    assert(w(1.0) == 0.693147) // the ln 2 read, visible
  }

  // ===================================================================
  // 10. PMI — Church-Hanks with PMI = ln 2 exactly
  // ===================================================================

  test("tx45_pmi_collocations: the alternating pair scores ln 2 exactly") {
    // 'x y' x5: cab = 5, n = 10, ca = cb = 5 -> PMI = ln(5*10/25) = ln 2
    val dir = fixture("pmi", "documents" -> docsOf(Seq(
      (1L, "x y x y x y x y x y"))))
    val out = run("tx45_pmi_collocations", dir)
      .map(r => (r.getAs[String]("ta"), r.getAs[String]("tb"),
        r.getAs[Long]("cab"), r.getAs[Double]("pmi")))
    assert(out.toSeq == Seq(("x", "y", 5L, 0.693147)))
  }

  // ===================================================================
  // 11. Unigram Viterbi — independent imperative DP replay
  // ===================================================================

  /** The pinned 46-piece table, replayed as a plain imperative DP —
    * derivation-disjoint from the query's aggregate-HOF fold and the
    * DuckDB list_reduce.
    */
  private val Pieces: Seq[(String, Long)] =
    Seq("the" -> 50L, "ing" -> 55L, "ion" -> 60L, "ent" -> 60L, "er" -> 38L,
      "in" -> 36L, "on" -> 38L, "an" -> 38L, "re" -> 38L, "at" -> 40L,
      "en" -> 40L, "es" -> 40L, "or" -> 42L, "te" -> 42L, "ti" -> 42L,
      "nd" -> 42L, "st" -> 42L, "ar" -> 44L, "al" -> 44L, "ed" -> 40L) ++
      ('a' to 'z').map(c => c.toString -> 60L)

  private def viterbiComb(w: String): Long = {
    val Inf = 1000000000000000L
    val dp = new Array[Long](w.length + 1)
    for (i <- 1 to w.length) {
      var best = dp(i - 1) + 100L * 1000L + 1L // unknown-char fallback
      Pieces.foreach { case (p, c) =>
        if (i >= p.length && w.substring(i - p.length, i) == p) {
          val prev = if (i == p.length) 0L else dp(i - p.length)
          best = math.min(best, prev + c * 1000L + 1L)
        }
      }
      dp(i) = math.min(best, Inf)
    }
    dp(w.length)
  }

  test("tx50_unigram_viterbi matches an independent imperative DP over " +
      "the pinned piece table (hand: the=1 piece/50, qq=2/120, thee=2/110)") {
    assert(viterbiComb("the") == 50L * 1000L + 1L)
    assert(viterbiComb("qq") == 120L * 1000L + 2L)
    assert(viterbiComb("thee") == 110L * 1000L + 2L)
    val words = Seq("the", "the", "qq", "thee")
    val dir = fixture("uvit", "documents" -> docsOf(Seq(
      (1L, words.mkString(" ")))))
    val r = run("tx50_unigram_viterbi", dir).head
    val combs = words.map(viterbiComb)
    val n = words.length.toLong
    assert(r.getAs[Long]("n_tokens") == n)
    assert(r.getAs[Double]("avg_pieces") ==
      round6(combs.map(_ % 1000L).sum.toDouble / n))
    assert(r.getAs[Double]("avg_cost") ==
      round6(combs.map(_ / 1000L).sum.toDouble / n))
    assert(combs.map(_ % 1000L).sum == 6L && combs.map(_ / 1000L).sum == 330L)
  }
}
