package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Published-value micro-goldens, part 19 — fourth gauge-steered
  * round: Markov attribution, the LSH S-curve, water-filling, the
  * bigram LM, canonical dedup, byte entropy, assortativity, and
  * split-conformal coverage. Anchors:
  *
  *  - Markov removal effect (Anderl et al. 2014): a hand funnel whose
  *    absorption probabilities are exact rationals on the integer
  *    lattice — base conversion 3/4, each channel's removal effect
  *    exactly 1/3, shares 1/2.
  *  - LSH S-curve 1 − (1 − s^r)^b: its exact ENDS — a planted
  *    identical pair (s = 1) must read expected recall 1.0 for every
  *    (b, r), and a disjoint background pair (s = 0) expected
  *    false positives 0.0.
  *  - Water-filling: hand level t with Σ min(nᵢ, t) = B exactly,
  *    including the +1-remainder hand-out ordered by name.
  *  - Bigram LM: ln(c2/c1) replayed per doc from hand counts,
  *    including a planted rare-bigram doc crossing the −3.45 gate.
  *  - Canonical dedup: hand raw-vs-canonical fingerprint counts,
  *    with a planted noisy variant colliding with another doc's
  *    noisy form only after canonicalization.
  *  - Shannon byte entropy: ln 2 for a two-symbol balanced blob,
  *    0 for a point mass, ln 4 for four distinct bytes.
  *  - Newman assortativity: a star (P3) reads r = −1 exactly — the
  *    published perfectly-disassortative end.
  *  - Split conformal (Vovk; Lei et al.): the ⌈(n+1)(1−α)⌉-th order
  *    statistic picked by hand from a crafted calibration set, and
  *    the measured test coverage from hand residuals.
  */
@graft.Golden
class InferenceGolden19Spec extends SparkSpec {

  private def fixture(name: String, tables: (String, DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"golden19_$name").toString
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
      graft.queries.DedupQueries.releaseSignatureCache()
      PlanWindows.releaseAll()
      spark.catalog.clearCache()
    }

  private def round6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private val Day0 = 1704067200L

  private def eventsRows(
      rows: Seq[(Long, Long, Long, String, Double)]): DataFrame = {
    import spark.implicits._
    rows.toDF("event_id", "sec", "user_id", "event_type", "value")
      .select(col("event_id"), timestamp_seconds(col("sec")).as("ts"),
        col("user_id"), col("event_type"), col("value"),
        lit("{}").as("props"))
  }

  private def docsOf(rows: Seq[(Long, String, String)]): DataFrame = {
    import spark.implicits._
    rows.map { case (id, src, text) =>
      (id, text, "en", src, text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  // ===================================================================
  // 1. Markov removal effect — exact rationals on the hand funnel
  // ===================================================================

  test("a51_markov_removal: hand funnel (2 click, 1 view, 1 direct, 1 " +
      "non-converter) gives base 3/4 and removal effect exactly 1/3 " +
      "per channel") {
    // journeys (prefix before first purchase):
    //  user 1: click -> CONV        user 2: view -> CONV
    //  user 3: click -> NULL        user 4: (direct) -> CONV
    // matrix: START->{click 2, view 1, CONV 1}/4; click->{CONV,NULL}/2;
    // view->CONV. v(click) = S/2, v(view) = S, v_base(START) =
    // (2*(S/2) + S + S)/4 = 3S/4; removing either channel:
    // (0 + S + S)/4 = S/2 -> diff S/4, effect (S/4)/(3S/4) = 1/3,
    // share 1/2 each — all exact on the integer lattice
    val rows = Seq(
      (1L, Day0 + 10L, 1L, "click", 1.0), (2L, Day0 + 20L, 1L, "purchase", 1.0),
      (3L, Day0 + 10L, 2L, "view", 1.0), (4L, Day0 + 20L, 2L, "purchase", 1.0),
      (5L, Day0 + 10L, 3L, "click", 1.0),
      (6L, Day0 + 10L, 4L, "purchase", 1.0))
    val out = run("a51_markov_removal",
      fixture("mr", "events" -> eventsRows(rows)))
      .map(r => r.getAs[String]("channel") ->
        (r.getAs[Double]("p_conv_base"), r.getAs[Double]("removal_effect"),
          r.getAs[Double]("share"))).toMap
    val expect = (0.75, round6(1.0 / 3.0), 0.5)
    assert(out == Map("click" -> expect, "view" -> expect))
  }

  // ===================================================================
  // 2. LSH S-curve — the exact ends of 1 − (1 − s^r)^b
  // ===================================================================

  test("tx53_lsh_param_sweep: an identical pair (s=1) reads expected " +
      "recall 1.0 for every banding; a disjoint background pair (s=0) " +
      "reads expected false positives 0.0") {
    // ids 1,2: identical docs (collide in every band, jac 1.0), NOT
    // in the 3% hash sample (residues 47, 87). ids 7, 66: IN the
    // sample ((id*2654435761) % P % 100 < 3 — replayed), disjoint
    // vocabularies -> background jaccard 0.0
    assert(Seq(1L, 2L).forall(id => (id * 2654435761L) % 1000000007L % 100L >= 3))
    assert(Seq(7L, 66L).forall(id => (id * 2654435761L) % 1000000007L % 100L < 3))
    val dir = fixture("scurve", "documents" -> docsOf(Seq(
      (1L, "s", "alpha beta gamma delta epsilon"),
      (2L, "s", "alpha beta gamma delta epsilon"),
      (7L, "s", "one two three four five"),
      (66L, "s", "six seven eight nine ten"))))
    val out = run("tx53_lsh_param_sweep", dir)
      .map(r => (r.getAs[Long]("b"), r.getAs[Long]("r")) ->
        (r.getAs[Long]("n_true"), r.getAs[Long]("n_bg"),
          r.getAs[Double]("exp_recall"), r.getAs[Double]("exp_fp_per_1e9")))
      .toMap
    assert(out.size == 4)
    out.foreach { case ((_, _), (nt, nb, rec, fp)) =>
      assert(nt == 1L && nb == 1L)
      assert(rec == 1.0) // 1 - (1 - 1^r)^b = 1 exactly
      assert(fp == 0.0)  // 1 - (1 - 0^r)^b = 0 exactly
    }
  }

  // ===================================================================
  // 3. Water-filling — the hand level, remainder handed out by name
  // ===================================================================

  test("tx36_waterfill_budget finds the hand level: sum(min(n,t)) = B " +
      "exactly, remainder +1 to the first capped source by name") {
    def doc(id: Long, src: String, n: Int) =
      (id, src, Seq.fill(n)("w").mkString(" "))
    // tokens a=5, b=50, c=52 -> total 107, B = 64; level candidates:
    // j=1 uncapped (a), t = (64-5) div 2 = 29, remainder 1 -> b gets
    // 30, c gets 29; 5+30+29 = 64 exactly
    val dir = fixture("wf", "documents" -> docsOf(Seq(
      doc(1L, "a", 5), doc(2L, "b", 50), doc(3L, "c", 52))))
    val out = run("tx36_waterfill_budget", dir)
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("alloc"), r.getAs[Long]("capped")))
    assert(out.toSeq == Seq(
      ("a", 5L, 5L, 0L), ("b", 50L, 30L, 1L), ("c", 52L, 29L, 1L)))
  }

  // ===================================================================
  // 4. Bigram LM — ln(c2/c1) replayed, the fluency gate crossed
  // ===================================================================

  test("tx12_bigram_lm_score replays ln(c2/c1) from hand counts; the " +
      "planted rare bigram crosses the -3.45 gate") {
    // source s: "a b" x2 and "a c" -> lp in {ln(2/3), ln(1/3)}
    // source z: one "z q" among 40 "z w" docs -> lp("z q") =
    // ln(1/41) = -3.713572 < -3.45 (flagged), lp("z w") = ln(40/41)
    val sDocs = Seq((1L, "s", "a b"), (2L, "s", "a b"), (3L, "s", "a c"))
    val zDocs = (1 to 40).map(i => (100L + i, "z", "z w")) :+ ((99L, "z", "z q"))
    val out = run("tx12_bigram_lm_score",
      fixture("blm", "documents" -> docsOf(sDocs ++ zDocs)))
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Double]("avg_logprob"),
          r.getAs[Long]("n_flagged"))).toMap
    val sAvg = round6((round6(math.log(2.0 / 3.0)) * 2 +
      round6(math.log(1.0 / 3.0))) / 3.0)
    val zAvg = round6((round6(math.log(40.0 / 41.0)) * 40 +
      round6(math.log(1.0 / 41.0))) / 41.0)
    assert(out("s")._1 == 3L && out("s")._3 == 0L)
    assert(math.abs(out("s")._2 - sAvg) <= 1.1e-6)
    assert(out("z")._1 == 41L && out("z")._3 == 1L)
    assert(math.abs(out("z")._2 - zAvg) <= 1.1e-6)
    assert(round6(math.log(1.0 / 41.0)) < -3.45) // the gate read
  }

  // ===================================================================
  // 5. Canonical dedup — hand fingerprint counts
  // ===================================================================

  test("tx7_canonical_dedup: raw variants differ, canonical forms " +
      "collapse to ONE (noisy forms of different docs even collide)") {
    // base: "x y", "x  y", "X Y" -> noisy adds "  X Y " (x2 -
    // doc 1's and doc 3's noisy forms are the SAME string) and
    // "  X  Y " -> uniq_raw = 5 of 6 rows; canonicalized, all six
    // become "x y" -> uniq_canonical = 1
    val dir = fixture("cd", "documents" -> docsOf(Seq(
      (1L, "s", "x y"), (2L, "s", "x  y"), (3L, "s", "X Y"))))
    val r = run("tx7_canonical_dedup", dir).head
    assert(r.getAs[Long]("n_rows") == 6L)
    assert(r.getAs[Long]("uniq_raw") == 5L)
    assert(r.getAs[Long]("uniq_canonical") == 1L)
  }

  // ===================================================================
  // 6. Byte entropy — Shannon's hand values
  // ===================================================================

  test("m11_byte_entropy: ln 2 for a balanced two-symbol blob, 0 for a " +
      "point mass, ln 4 for four distinct bytes") {
    val dir = fixture("be", "documents" -> docsOf(Seq(
      (1L, "s", "aabb"), (2L, "s", "aaaa"), (3L, "s", "abcd"))))
    val out = run("m11_byte_entropy", dir)
      .map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Long]("n_bytes"), r.getAs[Long]("n_distinct"),
          r.getAs[Double]("entropy_nats"))).toMap
    assert(out(1L) == ((4L, 2L, round6(math.log(2.0)))))
    assert(out(2L) == ((4L, 1L, 0.0)))
    assert(out(3L) == ((4L, 4L, round6(math.log(4.0)))))
  }

  // ===================================================================
  // 7. Assortativity — the star's exact r = −1
  // ===================================================================

  test("g20_assortativity reads exactly -1 on a star (every edge joins " +
      "the hub to a leaf — Newman's perfectly disassortative end)") {
    import spark.implicits._
    // co-purchase pairs need count >= 2: orders {1,2} x2 and {2,3} x2
    // -> edges (1,2),(2,3): P3 = a 2-leaf star centered on part 2
    val li = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L),
      (3L, 2L), (3L, 3L), (4L, 2L), (4L, 3L))
      .toDF("l_orderkey", "l_partkey")
    val r = run("g20_assortativity", fixture("as", "lineitem" -> li)).head
    assert(r.getAs[Long]("m") == 4L)   // symmetrized arcs
    assert(r.getAs[Long]("cov_num") == -4L) // 4*8 - 6*6
    assert(r.getAs[Double]("r") == -1.0)
  }

  // ===================================================================
  // 8. Split conformal — the hand order statistic and coverage
  // ===================================================================

  test("a55_conformal_interval picks the ceil((n+1)(1-a))-th calibration " +
      "residual by hand and measures the hand coverage") {
    // hr 5 only. train days 0..13: 10 events each -> p = 10000.
    // calibration days 14..21: seven 10s and one 12 -> residuals
    // [0 x7, 2000]; n = 8, index = min(ceil(0.9*9), 8) = 8 -> qhat =
    // 2000. test days 22, 23: counts 11 (|1000| <= 2000, covered)
    // and 15 (|5000| > 2000, missed) -> coverage 0.5
    var eid = 0L
    def hourEvents(day: Long, c: Long): Seq[(Long, Long, Long, String, Double)] =
      (1L to c).map { i =>
        eid += 1; (eid, Day0 + day * 86400L + 5L * 3600L + i, eid % 7, "view", 1.0)
      }
    val rows = (0L to 13L).flatMap(d => hourEvents(d, 10L)) ++
      (14L to 20L).flatMap(d => hourEvents(d, 10L)) ++ hourEvents(21L, 12L) ++
      hourEvents(22L, 11L) ++ hourEvents(23L, 15L)
    val r = run("a55_conformal_interval",
      fixture("conf", "events" -> eventsRows(rows))).head
    assert(r.getAs[Long]("n_cal") == 8L)
    assert(r.getAs[Long]("n_test") == 2L)
    assert(r.getAs[Long]("qhat") == 2000L)
    assert(r.getAs[Double]("coverage") == 0.5)
  }
}
