package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Published-value micro-goldens, part 9 — the business-analytics
  * closers: drawdown, association rules, and the Pareto/ABC cut.
  *
  * Anchors:
  *  - Max drawdown (the standard running-peak definition): a
  *    hand-walked price path has one unambiguous (peak, trough,
  *    depth) answer.
  *  - Association rules (Agrawal et al. 1993 / Brin et al. 1997):
  *    lift = 1 EXACTLY when the antecedent is in every basket
  *    (support-1 items are independent of everything by
  *    construction), lift = n/s and confidence = 1 both ways for a
  *    perfectly co-occurring pair — the two exact ends of the lift scale.
  *  - Pareto/ABC (the 80/95 integer boundary): quantities 80/15/5
  *    land each part exactly ON its class boundary, pinning the ≤
  *    comparisons (cum·100 ≤ total·80) that a float-share
  *    implementation would leave to rounding luck.
  */
@graft.Golden
class InferenceGolden9Spec extends SparkSpec {

  private def fixture(name: String, tables: (String, DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"golden9_$name").toString
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

  // ===================================================================
  // 1. Max drawdown — the hand-walked path
  // ===================================================================

  test("a43_max_drawdown walks 100,300,200,50,250 to the exact " +
      "(peak 300, trough 50, depth 250) answer") {
    import spark.implicits._
    val ords = Seq(100.0, 300.0, 200.0, 50.0, 250.0).zipWithIndex
      .map { case (rev, i) => (i.toLong + 1, f"2024-02-${i + 1}%02d", rev) }
      .toDF("o_orderkey", "ds", "o_totalprice")
      .select(col("o_orderkey"), to_date(col("ds")).as("o_orderdate"),
        col("o_totalprice"))
    val r = run("a43_max_drawdown", fixture("dd", "orders" -> ords)).head
    assert(r.getAs[java.sql.Date]("trough_day").toString == "2024-02-04")
    assert(r.getAs[Long]("peak_cents") == 30000L)
    assert(r.getAs[Long]("trough_cents") == 5000L)
    assert(r.getAs[Long]("max_dd_cents") == 25000L)
    assert(r.getAs[Long]("n_days") == 5L)
  }

  // ===================================================================
  // 2. Association rules — the lift scale's two exact ends
  // ===================================================================

  test("a19_assoc_rules: a full-support antecedent has lift exactly 1; a " +
      "perfectly co-occurring pair has confidence 1 both ways and lift n/s") {
    import spark.implicits._
    // brand BX in all 4 orders; BY and BZ together in orders 1-2
    val part = Seq((1L, "BX"), (2L, "BY"), (3L, "BZ"))
      .toDF("p_partkey", "p_brand")
    val li = (
      (1L to 4L).map(ok => (ok, 1L)) ++
        Seq((1L, 2L), (2L, 2L), (1L, 3L), (2L, 3L))
      ).toDF("l_orderkey", "l_partkey")
    val out = run("a19_assoc_rules", fixture("rules",
      "part" -> part, "lineitem" -> li))
      .map(r => (r.getAs[String]("u"), r.getAs[String]("v")) ->
        (r.getAs[Double]("conf_u_v"), r.getAs[Double]("conf_v_u"),
          r.getAs[Double]("lift"))).toMap
    assert(out(("BX", "BY")) == ((0.5, 1.0, 1.0))) // lift 1: X is everywhere
    assert(out(("BX", "BZ")) == ((0.5, 1.0, 1.0)))
    assert(out(("BY", "BZ")) == ((1.0, 1.0, 2.0))) // lift n/s = 4/2
  }

  // ===================================================================
  // 3. Pareto/ABC — the integer 80/95 boundary pin
  // ===================================================================

  test("a21_pareto_abc lands 80/15/5 quantities exactly on the A/B/C " +
      "boundaries (the integer cum*100 <= total*k comparisons)") {
    import spark.implicits._
    val li = Seq((1L, 80.0), (2L, 15.0), (3L, 5.0))
      .toDF("l_partkey", "l_quantity")
    val out = run("a21_pareto_abc", fixture("abc", "lineitem" -> li))
      .map(r => r.getAs[String]("cls") ->
        (r.getAs[Long]("n_parts"), r.getAs[Long]("sum_qty"),
          r.getAs[Double]("share"))).toMap
    assert(out("A") == ((1L, 80L, 0.8)))
    assert(out("B") == ((1L, 15L, 0.15)))
    assert(out("C") == ((1L, 5L, 0.05)))
  }
}
