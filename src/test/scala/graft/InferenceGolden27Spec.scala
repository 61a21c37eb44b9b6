package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Published-value micro-goldens, part 27 — eleventh gauge-steered
  * round: Fellegi-Sunter and HyperLogLog. Anchors:
  *
  *  - j8d (Fellegi-Sunter 1969): a SEPARABLE hand fixture — every
  *    planted pair agrees on all three features (m-probabilities 1),
  *    every non-planted candidate disagrees on the first two
  *    (u1 = u2 = 0) — so the likelihood-ratio decision table has
  *    closed-form ends: num > 0, den = 0 -> 'match' for exactly the
  *    planted pairs; num = 0, den > 0 -> 'nonmatch' for all others;
  *    the trained probabilities read exactly 1.0 / 0.0 / 1.0 / 1.0.
  *  - a41 (Flajolet et al. 2007): the WHOLE HLL pipeline replayed
  *    independently in plain Scala — hash chain, 64 registers,
  *    rho = trailing zeros + 1 (capped 25), the scaled-integer
  *    denominator, the raw alpha*m^2 estimate AND the
  *    linear-counting small-range branch 64*ln(64/V) — on both a
  *    small corpus (the LC branch) and a 200-user one (the raw
  *    branch).
  */
@graft.Golden
class InferenceGolden27Spec extends SparkSpec {

  private def fixture(name: String, tables: (String, DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"golden27_$name").toString
    tables.foreach { case (t, df) =>
      df.coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  private def run(q: String, dir: String): Array[Row] =
    try SparkEntry.queries(q)(spark, dir).collect()
    finally {
      graft.queries.EventQueries.releaseCaches()
      graft.queries.ParityQueries.releaseCaches()
      graft.queries.TextQueries.releaseCaches()
      PlanWindows.releaseAll()
      spark.catalog.clearCache()
    }

  private val Day0 = 1704067200L

  private def eventsRows(
      rows: Seq[(Long, Long, Long, String, Double)]): DataFrame = {
    import spark.implicits._
    rows.toDF("event_id", "sec", "user_id", "event_type", "value")
      .select(col("event_id"), timestamp_seconds(col("sec")).as("ts"),
        col("user_id"), col("event_type"), col("value"),
        lit("{}").as("props"))
  }

  test("j8d_fellegi_sunter: the separable fixture lands every planted " +
      "pair in 'match' (den = 0) and every other candidate in " +
      "'nonmatch' (num = 0), with m/u probabilities at their exact ends") {
    import spark.implicits._
    // clone sources 10 and 20 (ck % 10 == 0); clone cents shifts:
    // ck 10 -> +3*100-300 = 0 (equal), ck 20 -> +6*100-300 = +300
    // (|diff| < 1000) -> planted pairs agree on f1/f2/f3. Different
    // segments between 10 and 20 make every CROSS pair disagree on
    // f1 (>= $10 gap) and f2.
    val cust = Seq(
      (10L, 1L, "SEG_A", 100.0), (20L, 1L, "SEG_B", 200.0))
      .toDF("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
    val out = run("j8d_fellegi_sunter", fixture("fs", "customer" -> cust))
      .map(r => r.getAs[String]("cls") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("n_planted"),
          r.getAs[Long]("planted_total"), r.getAs[Double]("m1_p"),
          r.getAs[Double]("u1_p"), r.getAs[Double]("m3_p"),
          r.getAs[Double]("u3_p"))).toMap
    // candidates: C(4,2) = 6 same-band pairs; 2 planted -> 4 nonmatch
    assert(out("match") == ((2L, 2L, 2L, 1.0, 0.0, 1.0, 1.0)))
    assert(out("nonmatch") == ((4L, 0L, 2L, 1.0, 0.0, 1.0, 1.0)))
    assert(!out.contains("possible"))
  }

  // ----- the independent HLL replay (Flajolet et al. 2007) -----

  private def hllHash(userId: Long): Long = {
    val P = 1000000007L
    val h0 = userId.toString.foldLeft(7L)((acc, ch) => (acc * 31 + ch.toInt) % P)
    (1103515245L * h0 + 12345L) % P
  }

  /** (n_true, v_zero, hll_raw, hll_est) replayed from the definition. */
  private def hllReplay(users: Seq[Long]): (Long, Long, Double, Double) = {
    val regs = scala.collection.mutable.Map.empty[Long, Long]
    users.foreach { u =>
      val h = hllHash(u)
      val idx = h % 64L
      val w = h / 64L
      val rho =
        if (w == 0L) 25L
        else math.min(java.lang.Long.numberOfTrailingZeros(w) + 1L, 24L)
      regs(idx) = math.max(regs.getOrElse(idx, 0L), rho)
    }
    val s2 = regs.values.map(mx => 1L << (25 - mx).toInt).sum
    val nz = regs.size.toLong
    val vZero = 64L - nz
    val raw = 0.709365815 * 4096.0 * 33554432.0 /
      (s2 + vZero * 33554432L).toDouble
    val est =
      if (vZero > 0 && raw <= 160.0) 64.0 * math.log(64.0 / vZero.toDouble)
      else raw
    def r4(v: Double) =
      BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    (users.distinct.size.toLong, vZero, r4(raw), r4(est))
  }

  test("a41_hll_distinct matches the independent Flajolet replay on both " +
      "the linear-counting branch (small n) and the raw branch (200 users)") {
    def corpus(users: Seq[Long]): DataFrame =
      eventsRows(users.zipWithIndex.map { case (u, i) =>
        ((i + 1).toLong, Day0 + i + 1L, u, "view", 1.0)
      })
    // small corpus: V > 0 and raw <= 160 -> the LC branch fires
    val small = (1L to 10L) ++ (1L to 5L) // repeats must not matter
    val (nt1, vz1, raw1, est1) = hllReplay(small.distinct)
    val r1 = run("a41_hll_distinct",
      fixture("hll1", "events" -> corpus(small))).head
    assert(r1.getAs[Long]("n_true") == nt1)
    assert(r1.getAs[Long]("v_zero") == vz1)
    assert(r1.getAs[Double]("hll_raw") == raw1)
    assert(r1.getAs[Double]("hll_est") == est1)
    assert(est1 == BigDecimal(64.0 * math.log(64.0 / vz1))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) // LC fired

    val big = (1L to 200L)
    val (nt2, vz2, raw2, est2) = hllReplay(big)
    val r2 = run("a41_hll_distinct",
      fixture("hll2", "events" -> corpus(big))).head
    assert(r2.getAs[Long]("n_true") == nt2)
    assert(r2.getAs[Long]("v_zero") == vz2)
    assert(r2.getAs[Double]("hll_raw") == raw2)
    assert(r2.getAs[Double]("hll_est") == est2)
  }
}
