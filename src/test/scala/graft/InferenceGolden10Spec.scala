package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Published-value micro-goldens, part 10 — the privacy triad's
  * ceilings and the funnel's window boundaries.
  *
  * Anchors:
  *  - k-anonymity (Sweeney 2002): a table of IDENTICAL
  *    quasi-identifiers is one class of size n (k = n, the maximal
  *    protection); all-distinct rows give n classes of size 1 (k = 1,
  *    no protection) — the two ends of the definition.
  *  - l-diversity (Machanavajjhala et al. 2007): one shared sensitive
  *    value ⇒ l = 1 regardless of class size (the homogeneity attack
  *    k-anonymity misses); all-distinct sensitive values ⇒ l = class
  *    size.
  *  - t-closeness (Li, Li & Venkatasubramanian 2007): t = 0 exactly
  *    when a class's sensitive distribution equals the global one,
  *    and a one-segment class against an m-segment global attains
  *    the point-mass TV (1 − ns/nn) — recomputed over ALL sensitive
  *    values including the class's ABSENT ones (the same empty-cell
  *    discipline the round-12 χ² fix restored; this query already
  *    had it, and the golden pins that it stays).
  *  - Funnel windows: the 24 h stage window is inclusive at exactly
  *    +24 h and strict ordering means a click BEFORE the first view
  *    never counts — the boundary semantics off-by-one bugs live on.
  */
@graft.Golden
class InferenceGolden10Spec extends SparkSpec {

  private def fixture(name: String, tables: (String, DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"golden10_$name").toString
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

  /** customer rows: (c_custkey, c_nationkey, c_mktsegment, c_acctbal). */
  private def customers(rows: Seq[(Long, Long, String, Double)]): DataFrame = {
    import spark.implicits._
    rows.toDF("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
  }

  // ===================================================================
  // 1. k-anonymity — the definition's two ends
  // ===================================================================

  test("audit_k_anonymity: identical quasi-identifiers give one class of " +
      "size n; all-distinct give n classes of size 1 (Sweeney's ends)") {
    val same = customers((1L to 6L).map(ck => (ck, 0L, "AUTOMOBILE", 500.0)))
    val r = run("audit_k_anonymity", fixture("kanon_n", "customer" -> same))
      .map(r => (r.getAs[Long]("class_size"), r.getAs[Long]("n_classes"),
        r.getAs[Long]("n_rows")))
    assert(r.toSeq == Seq((6L, 1L, 6L)))

    val uniq = customers((1L to 6L).map(ck => (ck, ck, "AUTOMOBILE", 500.0)))
    val r2 = run("audit_k_anonymity", fixture("kanon_1", "customer" -> uniq))
      .map(r => (r.getAs[Long]("class_size"), r.getAs[Long]("n_classes"),
        r.getAs[Long]("n_rows")))
    assert(r2.toSeq == Seq((1L, 6L, 6L)))
  }

  // ===================================================================
  // 2. l-diversity — the homogeneity attack and its complement
  // ===================================================================

  test("audit_l_diversity: a large homogeneous class still has l = 1; " +
      "fully diverse sensitive values give l = class size") {
    // class (nation 0, bucket 0): 5 rows, one shared segment → l = 1
    // class (nation 1, bucket 0): 4 rows, four distinct segments → l = 4
    val cust = customers(
      (1L to 5L).map(ck => (ck, 0L, "AUTOMOBILE", 500.0)) ++
        Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD").zipWithIndex
          .map { case (seg, i) => (10L + i, 1L, seg, 500.0) })
    val out = run("audit_l_diversity", fixture("ldiv", "customer" -> cust))
      .map(r => r.getAs[Long]("l") ->
        (r.getAs[Long]("n_classes"), r.getAs[Long]("n_rows"))).toMap
    assert(out == Map(1L -> ((1L, 5L)), 4L -> ((1L, 4L))))
  }

  // ===================================================================
  // 3. t-closeness — zero at equality, point-mass TV at concentration
  // ===================================================================

  test("audit_t_closeness: a class mirroring the global mix has t = 0; a " +
      "one-segment class attains the point-mass TV 1 - ns/nn") {
    // global: 6 AUTOMOBILE + 3 BUILDING + 3 FURNITURE (nn = 12,
    // shares 1/2 : 1/4 : 1/4).
    // class (0,0): 4 rows at exactly the global mix 2:1:1 → t = 0.
    // class (1,0): 4 rows all AUTOMOBILE → point-mass TV = 1 − 6/12
    //   = 0.5.
    // class (2,0): 2 BUILDING + 2 FURNITURE → TV = ½(1/2 + 1/4 + 1/4)
    //   = 0.5, with the AUTOMOBILE term coming from the class's
    //   ABSENT segment.
    def mix(nation: Long, base: Long): Seq[(Long, Long, String, Double)] =
      Seq((base, nation, "AUTOMOBILE", 500.0), (base + 1, nation, "AUTOMOBILE", 500.0),
        (base + 2, nation, "BUILDING", 500.0), (base + 3, nation, "FURNITURE", 500.0))
    val cust = customers(
      mix(0L, 1L) ++
        (11L to 14L).map(ck => (ck, 1L, "AUTOMOBILE", 500.0)) ++
        Seq((21L, 2L, "BUILDING", 500.0), (22L, 2L, "FURNITURE", 500.0),
          (23L, 2L, "BUILDING", 500.0), (24L, 2L, "FURNITURE", 500.0)))
    val out = run("audit_t_closeness", fixture("tclose", "customer" -> cust))
      .map(r => r.getAs[Long]("nation") -> r.getAs[Double]("t")).toMap
    assert(out(0L) == 0.0) // mirrors the global mix exactly
    assert(out(1L) == 0.5) // point mass on a 50%-share segment
    // full-domain TV by hand for the third class, absent-segment term
    // included: ½(|0 − 1/2| + |1/2 − 1/4| + |1/2 − 1/4|) = 0.5
    assert(out(2L) == 0.5)
  }

  // ===================================================================
  // 4. Funnel windows — inclusive +24 h, strict ordering
  // ===================================================================

  test("a16_funnel_stages: the stage window is inclusive at exactly +24h, " +
      "pre-view clicks never count, and the funnel is monotone") {
    import spark.implicits._
    val h24 = 24 * 3600L
    val t0 = 1704067200L
    // user 1: view, click at exactly +24h (counts), purchase at exactly
    //   click+24h (counts) — the full funnel on the boundary
    // user 2: click BEFORE the first view — stage 2 must not count it
    // user 3: view, click at +24h+1s — one second past, excluded
    val rows = Seq(
      (1L, t0, 1L, "view"), (2L, t0 + h24, 1L, "click"),
      (3L, t0 + 2 * h24, 1L, "purchase"),
      (4L, t0, 2L, "click"), (5L, t0 + 3600L, 2L, "view"),
      (6L, t0, 3L, "view"), (7L, t0 + h24 + 1L, 3L, "click"))
    val ev = rows.toDF("event_id", "sec", "user_id", "event_type")
      .select(col("event_id"), timestamp_seconds(col("sec")).as("ts"),
        col("user_id"), col("event_type"), lit(1.0).as("value"),
        lit("{}").as("props"))
    val out = run("a16_funnel_stages", fixture("funnel", "events" -> ev))
      .map(r => r.getAs[String]("stage") ->
        (r.getAs[Long]("n_users"), r.getAs[Double]("pct_of_entry"))).toMap
    assert(out("1_view") == ((3L, 1.0)))
    assert(out("2_click_after_view") == ((1L, 0.333333)))
    assert(out("3_purchase_after_click") == ((1L, 0.333333)))
  }
}
