package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Published-value micro-goldens, part 15 — the first round steered by
  * the `never_goldened` gauge (GoldenCoverage): the largest uncovered
  * families by query count were agreement statistics, the sketch
  * rungs of the distinct-count ladder, the robust-center tail
  * (trimean/winsorized/weighted median), targeted spectral power, and
  * graph link-prediction/partition-quality. Anchors:
  *
  *  - Fleiss' kappa (Fleiss 1971): the query's single-rational-
  *    division form is re-derived through the TEXTBOOK P-bar / P-bar_e
  *    route with exact arithmetic, plus the kappa = 1 full-agreement
  *    ceiling (both only hold if the pair-count identity
  *    C(k,2)+C(3-k,2) is right).
  *  - KMV (Bar-Yossef et al. 2002): exactness below k is a THEOREM
  *    (the sketch holds every distinct hash), and above k the
  *    (k-1)*P/h_(k) estimate is replayed through an independent
  *    plain-Scala polynomial hash + sort.
  *  - Bitmap distinct: EXACT by construction — the OR-rollup must
  *    equal count(DISTINCT) while the sum of daily distincts
  *    overcounts by exactly the cross-day repeats (the
  *    non-additivity gap that makes naive distinct cubes wrong).
  *  - Tukey trimean (Tukey 1977) and winsorized mean: hand values on
  *    quartile ladders, including the gross-outlier clamp whose
  *    leverage the winsorization removes exactly.
  *  - Token-weighted median: the 2*cw >= W suffix rule hand-walked,
  *    including the exact-half boundary.
  *  - Goertzel at the w = 0 bin: power must equal |DFT|^2 at the
  *    quarter frequency — the test recomputes the bin from the DFT
  *    DEFINITION (alternating integer sums), independent of the
  *    s_t = x~_t - s_{t-2} recurrence; a constant series carries
  *    exactly zero post-centering power at every probe.
  *  - Resource-allocation link prediction (Zhou, Lu, Zhang 2009):
  *    hand graph where two shared SPECIALISTS outrank three shared
  *    generalists (the whole point of the 1/deg weighting), with the
  *    co-occurrence anti-join verified by a planted existing edge.
  *  - Newman modularity (Newman-Girvan 2004): two disjoint bicliques
  *    — LPA provably converges to one label per component under the
  *    min-label tie rule, and equal halves with no cross edges give
  *    Q = 1/2 exactly.
  */
@graft.Golden
class InferenceGolden15Spec extends SparkSpec {

  private def fixture(name: String, tables: (String, DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"golden15_$name").toString
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

  private val Day0 = 1704067200L // 2024-01-01T00:00:00Z = 473352 * 3600

  /** documents with every rater input explicit (n_chars is a COLUMN,
    * decoupled from the text, exactly as the corpus table has it).
    */
  private def docsExplicit(
      rows: Seq[(Long, String, String, String, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  private def eventsRows(
      rows: Seq[(Long, Long, Long, String, Double)]): DataFrame = {
    import spark.implicits._
    rows.toDF("event_id", "sec", "user_id", "event_type", "value")
      .select(col("event_id"), timestamp_seconds(col("sec")).as("ts"),
        col("user_id"), col("event_type"), col("value"),
        lit("{}").as("props"))
  }

  private def text(nTokens: Int): String = Seq.fill(nTokens)("w").mkString(" ")

  // ===================================================================
  // 1. Fleiss' kappa — ceiling and the textbook-route recompute
  // ===================================================================

  test("tx52_fleiss_kappa: full agreement gives kappa = 1 exactly") {
    // every doc passes all three raters or fails all three
    val pass = (1L to 3L).map(i => (i, text(60), "en", "s", 300L))
    val fail = (4L to 5L).map(i => (i, text(3), "xx", "s", 10L))
    val r = run("tx52_fleiss_kappa",
      fixture("fk1", "documents" -> docsExplicit(pass ++ fail))).head
    assert(r.getAs[Long]("n_docs") == 5L)
    assert(r.getAs[Long]("agree_pairs") == 15L) // 3 agreeing pairs per doc
    assert(r.getAs[Double]("kappa") == 1.0)
  }

  test("tx52_fleiss_kappa matches the textbook P-bar/P-bar_e derivation " +
      "on a mixed table") {
    // per-doc passing-rater counts k: the raters are (n_chars > 280,
    // tokens > 55, lang = en), each set independently per doc
    val ks = Seq(3, 0, 2, 1, 3, 1)
    val docs = ks.zipWithIndex.map { case (k, i) =>
      ((i + 1).toLong,
        text(if (k >= 2) 60 else 3),            // r2 passes for k >= 2
        if (k >= 3) "en" else "xx",             // r3 passes only at k = 3
        "s",
        if (k >= 1) 300L else 10L)              // r1 passes for k >= 1
    }
    val r = run("tx52_fleiss_kappa",
      fixture("fk2", "documents" -> docsExplicit(docs))).head
    val n = ks.length
    // textbook route (Fleiss 1971), exact arithmetic end to end:
    // P_i = [k(k-1) + (3-k)(2-k)] / (3*2), P-bar their mean,
    // P-bar_e = p1^2 + p0^2 with p1 = SK/(3N)
    val mc = new java.math.MathContext(40)
    def bd(l: Long) = BigDecimal(l, mc)
    val sk = ks.map(_.toLong).sum
    val pbar = BigDecimal(ks.map(k => k * (k - 1) + (3 - k) * (2 - k)).sum, mc) /
      bd(6L * n)
    val p1 = bd(sk) / bd(3L * n)
    val p0 = bd(3L * n - sk) / bd(3L * n)
    val pe = p1 * p1 + p0 * p0
    val kappa = ((pbar - pe) / (BigDecimal(1, mc) - pe))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Long]("n_docs") == n.toLong)
    assert(r.getAs[Double]("kappa") == kappa)
  }

  // ===================================================================
  // 2. KMV — the n <= k exactness theorem and the order-statistic replay
  // ===================================================================

  /** Independent plain-Scala replay of the query's hash chain:
    * polynomial codepoint fold mod P (seed 7), then the affine mix.
    */
  private def kmvHash(userId: Long): Long = {
    val P = 1000000007L
    val h0 = userId.toString.foldLeft(7L)((acc, ch) => (acc * 31 + ch.toInt) % P)
    (1103515245L * h0 + 12345L) % P
  }

  test("a42_kmv_distinct is EXACT below k (theorem) and replays the " +
      "(k-1)P/h_k order statistic above k") {
    // 10 distinct users, several events each: the sketch holds every
    // hash, so the estimate IS the count
    val below = (1L to 30L).map(i =>
      (i, Day0 + i, (i % 10) + 1, "view", 1.0))
    val r1 = run("a42_kmv_distinct",
      fixture("kmv1", "events" -> eventsRows(below))).head
    assert(r1.getAs[Long]("n_true") == 10L)
    assert(r1.getAs[Double]("kmv_est") == 10.0)

    // 200 distinct users: h_(64) from an independent hash replay
    val above = (1L to 200L).map(i => (i, Day0 + i, i, "view", 1.0))
    val r2 = run("a42_kmv_distinct",
      fixture("kmv2", "events" -> eventsRows(above))).head
    val hk = (1L to 200L).map(kmvHash).distinct.sorted.apply(63)
    val expected = BigDecimal(63.0 * 1000000007.0 / hk.toDouble)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r2.getAs[Long]("n_true") == 200L)
    assert(r2.getAs[Double]("kmv_est") == expected)
  }

  // ===================================================================
  // 3. Bitmap distinct — exact rollup, and the non-additivity gap
  // ===================================================================

  test("a48_bitmap_distinct: OR-rollup equals the exact distinct; the " +
      "daily sum overcounts by exactly the cross-day repeats") {
    def ev(id: Long, day: Long, user: Long, tp: String) =
      (id, Day0 + day * 86400L + id, user, tp, 1.0)
    // click: day0 users {1,2,3}, day1 users {2,3,4} -> exact 4, daily 6
    val click = Seq((1L, 0L, 1L), (2L, 0L, 2L), (3L, 0L, 3L),
      (4L, 1L, 2L), (5L, 1L, 3L), (6L, 1L, 4L))
      .map { case (id, day, u) => ev(id, day, u, "click") }
    // view: one user one day -> exact 1, daily 1
    val view = Seq(ev(7L, 0L, 10L, "view"))
    val out = run("a48_bitmap_distinct",
      fixture("bm", "events" -> eventsRows(click ++ view)))
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("exact_distinct"), r.getAs[Long]("daily_sum"),
          r.getAs[Long]("days_active"))).toMap
    assert(out("click") == ((4L, 6L, 2L)))
    assert(out("view") == ((1L, 1L, 1L)))
  }

  // ===================================================================
  // 4. Tukey trimean — hand quartiles, shoulder pull visible
  // ===================================================================

  private def nationOrders(vals: Seq[(Long, Double)]): Seq[(String, DataFrame)] = {
    import spark.implicits._
    val cust = vals.map(_._1).distinct.map(n => (n * 10, n))
      .toDF("c_custkey", "c_nationkey")
    val ords = vals.zipWithIndex.map { case ((n, v), i) =>
      (i.toLong + 1, n * 10, v)
    }.toDF("o_orderkey", "o_custkey", "o_totalprice")
    Seq("customer" -> cust, "orders" -> ords)
  }

  test("w14_trimean reproduces Tukey's (Q1 + 2M + Q3)/4 on hand " +
      "quartiles, incl. the skewed-shoulder case") {
    // nation 1: cents {100..400} -> Q1 175, M 250, Q3 325 -> trimean 250
    // nation 2: cents {100,100,100,1000} -> Q1 100, M 100, Q3 325
    //   (type-7 h = 3.25) -> trimean (100 + 200 + 325)/4 = 156.25 —
    //   the median alone reads 100, blind to the heavy shoulder
    val dir = fixture("tm", nationOrders(
      Seq((1L, 1.0), (1L, 2.0), (1L, 3.0), (1L, 4.0),
        (2L, 1.0), (2L, 1.0), (2L, 1.0), (2L, 10.0))): _*)
    val out = run("w14_trimean", dir)
      .map(r => r.getAs[Long]("nation_key") ->
        (r.getAs[Double]("median_cents"), r.getAs[Double]("trimean_cents")))
      .toMap
    assert(out(1L) == ((250.0, 250.0)))
    assert(out(2L) == ((100.0, 156.25)))
  }

  // ===================================================================
  // 5. Winsorized mean — the clamp removes the outlier's leverage exactly
  // ===================================================================

  test("w17_winsorized_mean clamps to the exact [p5, p95] order " +
      "statistics; the gross outlier keeps its vote, loses its leverage") {
    import spark.implicits._
    // cents {100, 200, ..., 1900, 100000}: n = 20, ceil-rank order
    // stats p5 = 1st = 100, p95 = 19th = 1900; raw mean 59.5 dollars,
    // winsorized (19000 + 1900)/20/100 = 10.45 — the outlier clamped
    // to 1900 instead of deleted
    val ords = ((1 to 19).map(_.toDouble) :+ 1000.0).zipWithIndex
      .map { case (v, i) => (i.toLong + 1, 1L, v) }
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val r = run("w17_winsorized_mean", fixture("wm", "orders" -> ords)).head
    assert(r.getAs[Long]("n") == 20L)
    assert(r.getAs[Double]("p5") == 1.0)
    assert(r.getAs[Double]("p95") == 19.0)
    assert(r.getAs[Double]("mean") == 59.5)
    assert(r.getAs[Double]("winsorized_mean") == 10.45)
  }

  // ===================================================================
  // 6. Token-weighted median — the 2*cw >= W suffix rule, hand-walked
  // ===================================================================

  test("tx35_weighted_median: first length whose cumulative token " +
      "weight reaches half, incl. the exact-half boundary") {
    // source s: (n_chars, ntok) = (10,1), (20,1), (30,6): W = 8 —
    // cum 1, 2, 8; first 2*cw >= 8 is the 30-char doc (the token mass
    // sits in the long doc; the plain doc median would say 20)
    // source t: (10,2), (20,2): W = 4 — 2*cw = 4 at the FIRST doc,
    // the exact-half boundary takes it
    val docs = docsExplicit(Seq(
      (1L, text(1), "en", "s", 10L),
      (2L, text(1), "en", "s", 20L),
      (3L, text(6), "en", "s", 30L),
      (4L, text(2), "en", "t", 10L),
      (5L, text(2), "en", "t", 20L)))
    val out = run("tx35_weighted_median", fixture("wmed", "documents" -> docs))
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("total_tokens"), r.getAs[Long]("wmedian_chars"))).toMap
    assert(out("s") == ((8L, 30L)))
    assert(out("t") == ((4L, 10L)))
  }

  // ===================================================================
  // 7. Goertzel at w = 0 — power == |DFT|^2 from the definition
  // ===================================================================

  /** The quarter-frequency DFT bin from the DEFINITION (cos/sin at
    * multiples of pi/2 are 0/±1, so the bin is two alternating
    * integer sums) — independent of the s_t = x~_t − s_{t−2}
    * recurrence the query folds.
    */
  private def dftQuarterPower(hourCounts: Seq[(Long, Long)], b: Long): Long = {
    val blocks = hourCounts.groupBy { case (h, _) => (473352L + h) / b }
      .map { case (blk, xs) => blk -> xs.map(_._2).sum }
      .toSeq.sortBy(_._1).map(_._2)
    val n = blocks.length
    val t = blocks.sum
    val xt = blocks.map(x => n * x - t)
    val re = xt.zipWithIndex.map { case (x, j) =>
      (j % 4) match { case 0 => x; case 2 => -x; case _ => 0L } }.sum
    val im = xt.zipWithIndex.map { case (x, j) =>
      (j % 4) match { case 1 => x; case 3 => -x; case _ => 0L } }.sum
    re * re + im * im
  }

  test("t_goertzel_power equals the quarter-bin |DFT|^2 from the " +
      "definition; a constant series carries zero power at every probe") {
    // 48 hours, 6-hour block pattern [5,3,1,3] repeated: a clean
    // 24-hour cycle (period 4 in B=6 blocks)
    val pattern = Seq(5L, 3L, 1L, 3L)
    val counts: Seq[(Long, Long)] =
      (0L until 48L).map(h => h -> pattern(((h / 6) % 4).toInt))
    var eid = 0L
    val rows = counts.flatMap { case (h, c) =>
      (1L to c).map { i => eid += 1; (eid, Day0 + h * 3600L + i, eid % 7, "view", 1.0) }
    }
    val out = run("t_goertzel_power",
      fixture("gz", "events" -> eventsRows(rows)))
      .map(r => r.getAs[Long]("period_hours") -> r.getAs[Long]("power")).toMap
    assert(out(24L) == dftQuarterPower(counts, 6L))
    assert(out(12L) == dftQuarterPower(counts, 3L))
    assert(out(8L) == dftQuarterPower(counts, 2L))
    // the 24-hour cycle must actually carry energy at the 24 h probe
    assert(out(24L) > 0L)

    // constant series: mean-centering zeroes x~, so power = 0 at all
    // probes (the DC-removal guarantee)
    val flat: Seq[(Long, Long)] = (0L until 48L).map(h => h -> 2L)
    var eid2 = 100000L
    val rows2 = flat.flatMap { case (h, c) =>
      (1L to c).map { i => eid2 += 1; (eid2, Day0 + h * 3600L + i, eid2 % 7, "view", 1.0) }
    }
    val out2 = run("t_goertzel_power",
      fixture("gz0", "events" -> eventsRows(rows2)))
      .map(r => r.getAs[Long]("period_hours") -> r.getAs[Long]("power")).toMap
    assert(out2 == Map(24L -> 0L, 12L -> 0L, 8L -> 0L))
  }

  // ===================================================================
  // 8. Resource-allocation link prediction — specialists beat generalists
  // ===================================================================

  test("g15_link_prediction: RA = sum(1/deg) hand graph — two shared " +
      "specialists outrank three shared generalists; existing edges " +
      "are excluded") {
    import spark.implicits._
    // every (cust, part) purchase its own order, EXCEPT custs 6 and 7
    // who buy parts 70+80 together (a planted existing co-occurrence)
    val buys: Seq[(Long, Seq[Long])] = Seq(
      1L -> Seq(10L, 20L), 2L -> Seq(10L, 20L),          // specialists, deg 2
      3L -> Seq(30L, 40L, 50L, 60L),                      // generalists, deg 4
      4L -> Seq(30L, 40L, 50L, 60L),
      5L -> Seq(30L, 40L, 50L, 60L))
    var ok = 0L
    val sep = buys.flatMap { case (c, parts) => parts.map { p => ok += 1; (ok, c, p) } }
    val together = Seq(6L, 7L).map { c => ok += 1; (ok, c) }
    val ords = (sep.map { case (o, c, _) => (o, c) } ++ together)
      .toDF("o_orderkey", "o_custkey")
    val li = (sep.map { case (o, _, p) => (o, p) } ++
      together.flatMap { case (o, _) => Seq((o, 70L), (o, 80L)) })
      .toDF("l_orderkey", "l_partkey")
    val out = run("g15_link_prediction",
      fixture("ra", "orders" -> ords, "lineitem" -> li))
      .map(r => (r.getAs[Long]("pa"), r.getAs[Long]("pb")) ->
        (r.getAs[Long]("n_common"), r.getAs[Long]("ra"))).toMap
    // (10,20): 2 specialists at deg 2 -> 2 * (1e12 div 2) = 1e12
    assert(out((10L, 20L)) == ((2L, 1000000000000L)))
    // each {30,40,50,60} pair: 3 generalists at deg 4 -> 7.5e11 < 1e12
    for (pa <- Seq(30L, 40L, 50L); pb <- Seq(40L, 50L, 60L) if pa < pb)
      assert(out((pa, pb)) == ((3L, 750000000000L)))
    // (70,80) co-occurs in an order -> anti-joined out despite RA 1e12
    assert(!out.contains((70L, 80L)))
    assert(out.size == 7)
  }

  // ===================================================================
  // 9. Newman modularity — two disjoint bicliques give Q = 1/2 exactly
  // ===================================================================

  test("g18_modularity: disjoint equal bicliques under min-label LPA " +
      "give the closed-form Q = 1/2") {
    import spark.implicits._
    // two K_{2,2} components: custs {1,2} x supps {1,2} and custs
    // {3,4} x supps {3,4}; min-label LPA with self-votes provably
    // converges to one label per component in <= 2 rounds (hand
    // trace: round 1 ties resolve to the component minimum through
    // min(label); round 2 the majority locks it). Q for two equal
    // communities covering all edges: sum m_c/m - (d_c/2m)^2 =
    // 1 - 2*(1/2)^2 = 1/2.
    val pairs = for {
      (cs, ss) <- Seq(Seq(1L, 2L) -> Seq(1L, 2L), Seq(3L, 4L) -> Seq(3L, 4L))
      c <- cs; s <- ss
    } yield (c, s)
    val ords = pairs.zipWithIndex.map { case ((c, _), i) => (i.toLong + 1, c) }
      .toDF("o_orderkey", "o_custkey")
    val li = pairs.zipWithIndex.map { case ((_, s), i) => (i.toLong + 1, s, 50.0) }
      .toDF("l_orderkey", "l_suppkey", "l_quantity")
    val r = run("g18_modularity",
      fixture("mod", "orders" -> ords, "lineitem" -> li)).head
    assert(r.getAs[Long]("m_edges") == 8L)
    assert(r.getAs[Long]("n_communities") == 2L)
    assert(r.getAs[Long]("w_total") == 16L)
    assert(r.getAs[Double]("modularity") == 0.5)
  }
}
