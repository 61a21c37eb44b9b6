package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Published-value micro-goldens, part 29 — the record-linkage
  * blocking family (round-13 verdict ask 3 named it first: the F-S
  * decision table is anchored since part 27, but the CANDIDATE
  * GENERATION around it — banding, sorted-neighborhood windowing,
  * depth-2 deletion neighborhoods — is where a mirror-shared bug
  * would hide). Anchors:
  *
  *  - j8 (fixed-weight Fellegi-Sunter scorer): a hand fixture whose
  *    six blocked pairs land one per decision cell with closed-form
  *    scores (+3800 match / +1800 possible / −1200 nonmatch), plus
  *    the BLOCKING trade-off pinned positively: a close pair
  *    straddling a $1000 band edge produces NO candidate.
  *  - j8b (Hernández–Stolfo sorted neighborhood): the w=2 window
  *    pairs hand-enumerated per nation, and the band-straddling pair
  *    j8 cannot see IS seen here (the recall-completing contrast the
  *    two queries' scaladoc claims — now a theorem of the fixture).
  *  - j6b (FastSS depth 2): the three match classes (lev 0/1/2) by
  *    hand, the lev-2 pair reachable ONLY at depth 2 (reference:
  *    Bocek et al. 2007's deletion-neighborhood completeness
  *    argument), and a lev-3 near-miss that shares no depth-≤2
  *    variant and so never even becomes a candidate.
  */
@graft.Golden
class InferenceGolden29Spec extends SparkSpec {

  private def fixture(name: String, tables: (String, DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"golden29_$name").toString
    tables.foreach { case (t, df) =>
      df.coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  private def run(q: String, dir: String): Array[Row] =
    try SparkEntry.queries(q)(spark, dir).collect()
    finally {
      graft.queries.ParityQueries.releaseCaches()
      spark.catalog.clearCache()
    }

  /** ck, nk, seg, acctbal — the four columns the j8 family reads.
    * nk=1 carries the decision-table block; nk=2 a singleton; nk=3
    * the band-straddling close pair (cents 99990 vs 100010: gap 20,
    * bands 0 vs 1).
    */
  private def linkageCustomers = {
    import spark.implicits._
    Seq(
      (1L, 1L, "SEG_S", 10.00),   // A cents 1000  band 0
      (2L, 1L, "SEG_S", 10.50),   // B cents 1050  band 0
      (3L, 1L, "SEG_U", 950.00),  // C cents 95000 band 0
      (4L, 1L, "SEG_T", 10.20),   // D cents 1020  band 0
      (5L, 2L, "SEG_S", 10.00),   // E alone in nk=2
      (6L, 3L, "SEG_S", 999.90),  // F cents 99990  band 0
      (7L, 3L, "SEG_S", 1000.10)  // G cents 100010 band 1
    ).toDF("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
  }

  test("j8_record_linkage: hand decision table — AB +3800 match, " +
      "AD/BD +1800 possible, AC/BC/CD -1200 nonmatch; the nk=3 " +
      "band-straddling close pair generates NO candidate") {
    val out = run("j8_record_linkage", fixture("j8", "customer" -> linkageCustomers))
      .map(r => r.getAs[String]("cls") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("min_score"),
          r.getAs[Long]("max_score"))).toMap
    // nk=1 band-0 block: C(4,2) = 6 pairs, one per hand cell:
    //   AB: |1000-1050|<10000 → +2400; SEG_S=SEG_S → +1100; ++ → +300 = 3800
    //   AD, BD: +2400 (close) − 900 (seg differs) + 300 = 1800
    //   AC, BC, CD: −600 − 900 + 300 = −1200
    // nk=2: singleton, no pair. nk=3: F/G close (gap 20 cents) but
    // bands 0 vs 1 — blocking drops them (the documented miss).
    assert(out == Map(
      "match" -> ((1L, 3800L, 3800L)),
      "possible" -> ((2L, 1800L, 1800L)),
      "nonmatch" -> ((3L, -1200L, -1200L))))
  }

  test("j8b_sorted_neighborhood: hand w=2 windows per nation — and the " +
      "band-straddling pair j8's banding misses IS seen here") {
    val out = run("j8b_sorted_neighborhood",
        fixture("j8b", "customer" -> linkageCustomers))
      .map(r => r.getAs[Long]("nk") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("n_close"))).toMap
    // nk=1 sort by (cents, ck): A(1000), D(1020), B(1050), C(95000)
    //   lag1 gaps: 20, 30, 93950 ; lag2 gaps: 50, 93980
    //   → 5 pairs, 3 close (<10000)
    // nk=2: one customer → no lag rows at all
    // nk=3 sort: F(99990), G(100010) → lag1 gap 20 → 1 pair, 1 close:
    //   exactly the pair the band edge hid from j8 (the Hernández-
    //   Stolfo recall argument, pinned)
    assert(out == Map(1L -> ((5L, 3L)), 3L -> ((1L, 1L))))
  }

  test("j6b_fuzzy_join_d2: lev 0/1/2 classes by hand; the lev-2 source " +
      "is reachable only at depth 2; a lev-3 near-miss shares no " +
      "depth-<=2 variant and is never a candidate") {
    import spark.implicits._
    // probe source: ck=7 (7 % 7 == 0), name ABCDEFGHIJKL; probe_name
    // drops positions 4 and 10: ABC + EFGHI + KL = "ABCEFGHIKL"
    val cust = Seq(
      (7L, "ABCDEFGHIJKL"),  // lev(probe, this) = 2 — depth-2 only
      (1L, "ABCEFGHIKL"),    // identical to probe — lev 0
      (2L, "ABCEFGHIKLX"),   // one trailing insert — lev 1
      (3L, "ZZZZZZZZZZZZ"),  // unrelated
      (5L, "ABCEFGHIXYZ")    // lev 3 from probe: KL→XYZ; lengths 10 vs
                             // 11 admit a common variant only via 1+2
                             // deletions landing on equal strings, and
                             // K/L vs X/Y/Z suffixes never coincide
    ).toDF("c_custkey", "c_name")
    val out = run("j6b_fuzzy_join_d2", fixture("j6b", "customer" -> cust))
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("probe_id") == 800007L)
    assert(r.getAs[Long]("n_matches") == 3L) // ck 1 (lev0), 2 (lev1), 7 (lev2)
    assert(r.getAs[Long]("best_custkey") == 1L)
    assert(r.getAs[Long]("best_lev") == 0L)
  }

  test("j6b_fuzzy_join_d2: with ONLY the source present the lev-2 " +
      "match is found — the depth-2 completeness claim in isolation") {
    import spark.implicits._
    val cust = Seq((7L, "ABCDEFGHIJKL")).toDF("c_custkey", "c_name")
    val out = run("j6b_fuzzy_join_d2", fixture("j6b_solo", "customer" -> cust))
    assert(out.length == 1)
    val r = out.head
    assert((r.getAs[Long]("probe_id"), r.getAs[Long]("n_matches"),
      r.getAs[Long]("best_custkey"), r.getAs[Long]("best_lev"))
      == ((800007L, 1L, 7L, 2L)))
  }
}
