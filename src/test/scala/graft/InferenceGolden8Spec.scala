package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Published-value micro-goldens, part 8 — the drift monitors and the
  * Viterbi segmenter.
  *
  * Anchors:
  *  - PSI: zero iff the banded distributions coincide — identical
  *    before/after windows give every (p−q)·ln(p/q) term exactly 0.
  *  - Jensen-Shannon divergence (Lin 1991): zero on identical mixes,
  *    and the PUBLISHED ceiling ln 2 (in nats) on disjoint supports —
  *    each of two swapped types contributes exactly ln(2)/2; total
  *    variation simultaneously attains its ceiling 1.
  *  - Two-state Viterbi (Viterbi 1967 / Rabiner 1989): the decoded
  *    path on a clean two-level series equals an independently-coded
  *    imperative DP with the same emission and switch costs — and
  *    when the per-hour emission saving exceeds the amortized switch
  *    cost, the path follows the level change exactly.
  */
@graft.Golden
class InferenceGolden8Spec extends SparkSpec {

  private def fixture(name: String, tables: (String, DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"golden8_$name").toString
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

  private val Day0 = 1704067200L // 2024-01-01; the drift cut is Jan 16
  private val Cut = Day0 + 15 * 86400L

  private def eventsAt(rows: Seq[(Long, Long, Long, String, Double)]): DataFrame = {
    import spark.implicits._
    rows.toDF("event_id", "sec", "user_id", "event_type", "value")
      .select(col("event_id"), timestamp_seconds(col("sec")).as("ts"),
        col("user_id"), col("event_type"), col("value"),
        lit("{}").as("props"))
  }

  // ===================================================================
  // 1. PSI — zero iff the banded distributions coincide
  // ===================================================================

  test("t_psi_drift is exactly 0 when before and after share one value " +
      "distribution") {
    var eid = 0L
    def win(base: Long): Seq[(Long, Long, Long, String, Double)] =
      (1 to 50).map { i =>
        eid += 1
        (eid, base + i * 60L, eid % 7, "view", i.toDouble)
      }
    val r = run("t_psi_drift", fixture("psi0",
      "events" -> eventsAt(win(Day0) ++ win(Cut)))).head
    assert(r.getAs[Long]("n_before") == 50L)
    assert(r.getAs[Long]("n_after") == 50L)
    assert(r.getAs[Double]("psi") == 0.0)
  }

  // ===================================================================
  // 2. JSD/TV — Lin's ln 2 ceiling on disjoint supports, 0 on equality
  // ===================================================================

  test("t_drift_mix: identical mixes give 0; a full swap attains Lin's " +
      "JSD ceiling ln 2 and the TV ceiling 1") {
    var eid = 0L
    def ev(sec: Long, tp: String): (Long, Long, Long, String, Double) = {
      eid += 1; (eid, sec, eid % 7, tp, 1.0)
    }
    val same = (1 to 20).map(i => ev(Day0 + i * 60L, if (i % 2 == 0) "view" else "click")) ++
      (1 to 20).map(i => ev(Cut + i * 60L, if (i % 2 == 0) "view" else "click"))
    val r0 = run("t_drift_mix", fixture("mix0", "events" -> eventsAt(same)))
    r0.foreach { r =>
      assert(r.getAs[Double]("tv_term") == 0.0)
      assert(r.getAs[Double]("jsd_term") == 0.0)
    }

    // disjoint supports: before all view, after all click
    eid = 0L
    val swap = (1 to 20).map(i => ev(Day0 + i * 60L, "view")) ++
      (1 to 20).map(i => ev(Cut + i * 60L, "click"))
    val r1 = run("t_drift_mix", fixture("mix1", "events" -> eventsAt(swap)))
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Double]("tv_term"), r.getAs[Double]("jsd_term"))).toMap
    val half = round6(math.log(2.0) / 2.0) // 0.346574
    assert(r1("view") == ((0.5, half)))
    assert(r1("click") == ((0.5, half)))
    // totals: TV = 1, JSD = ln 2 ≈ 0.693147 — both published maxima
    // (the two 6-dp-rounded halves sum to 0.693148, one ulp6 above
    // round6(ln 2); assert against the unrounded ceiling instead)
    assert(r1.values.map(_._1).sum == 1.0)
    assert(math.abs(r1.values.map(_._2).sum - math.log(2.0)) < 1e-6)
  }

  // ===================================================================
  // 3. Viterbi — the decoded path equals an imperative DP and follows
  //    a clean level change
  // ===================================================================

  test("t_burst_viterbi decodes a clean two-level series into the exact " +
      "base/burst segmentation of an independently-coded DP") {
    // 6 hours of $0.80 sums then 6 of $1.60: base = mean = 120 cents,
    // burst level = 180, switch = 60 — staying base through the high
    // half costs 6·40 = 240 vs one switch + 6·20 = 180, so the
    // optimal path switches exactly at the level change
    var eid = 0L
    val rows = (0 until 12).map { h =>
      eid += 1
      (eid, Day0 + h * 3600L + 30L, eid % 5, "view",
        if (h < 6) 0.80 else 1.60)
    }
    val out = run("t_burst_viterbi", fixture("vit",
      "events" -> eventsAt(rows)))
      .map(r => (r.getAs[Long]("value_cents"), r.getAs[Long]("state")))
    assert(out.length == 12)
    assert(out.map(_._2).toSeq == Seq.fill(6)(0L) ++ Seq.fill(6)(1L))

    // independent imperative Viterbi with the engine's cost model
    val cs = out.map(_._1)
    val base = cs.sum / cs.length
    val burst = base + base / 2
    val sw = base / 2
    val n = cs.length
    val cost = Array.ofDim[Long](n, 2)
    val from = Array.ofDim[Int](n, 2)
    cost(0)(0) = math.abs(cs(0) - base)
    cost(0)(1) = math.abs(cs(0) - burst)
    for (t <- 1 until n; s <- 0 to 1) {
      val em = if (s == 0) math.abs(cs(t) - base) else math.abs(cs(t) - burst)
      val stay = cost(t - 1)(s)
      val switch = cost(t - 1)(1 - s) + sw
      // the engine's tie rule: switch only when STRICTLY cheaper
      if (switch < stay) { cost(t)(s) = em + switch; from(t)(s) = 1 - s }
      else { cost(t)(s) = em + stay; from(t)(s) = s }
    }
    var st = if (cost(n - 1)(0) <= cost(n - 1)(1)) 0 else 1
    val path = Array.ofDim[Int](n)
    path(n - 1) = st
    for (t <- n - 1 to 1 by -1) { st = from(t)(st); path(t - 1) = st }
    assert(out.map(_._2.toInt).toSeq == path.toSeq)
  }
}
