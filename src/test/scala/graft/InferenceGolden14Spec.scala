package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Published-value micro-goldens, part 14 — the robust-center pair.
  *
  * Anchors:
  *  - MAD outliers (Iglewicz & Hoban 1993): the pinned 0.6745
  *    (Φ⁻¹(0.75), the consistency constant) and the paper's
  *    recommended |modified z| > 3.5 cutoff, hand-recomputed on a
  *    sample where one gross outlier coexists with a clean ladder —
  *    the 50%-breakdown property means the outlier CANNOT mask
  *    itself (it barely moves the median or the MAD, unlike the
  *    mean/σ z-score it replaces); plus the documented MAD = 0
  *    degenerate pin (zero rows, not NaN).
  *  - Trimmed mean (Tukey): the 10% rank trim removes a gross
  *    outlier entirely, leaving the exact mean of the interior; at
  *    n < 10 the floor makes the trim a no-op and the plain mean
  *    returns.
  */
@graft.Golden
class InferenceGolden14Spec extends SparkSpec {

  private def fixture(name: String, tables: (String, DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"golden14_$name").toString
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

  private def eventsOf(values: Seq[Double], tp: String = "view"): DataFrame = {
    import spark.implicits._
    values.zipWithIndex.map { case (v, i) =>
      (i.toLong + 1, i.toLong + 1, tp, v)
    }.toDF("event_id", "off", "event_type", "value")
      .select(col("event_id"), timestamp_seconds(lit(Day0) + col("off")).as("ts"),
        (col("event_id") % 7).as("user_id"), col("event_type"), col("value"),
        lit("{}").as("props"))
  }

  // ===================================================================
  // 1. MAD — the Iglewicz-Hoban cutoff catches exactly the outlier
  // ===================================================================

  test("w7_mad_outliers flags exactly the gross outlier at the published " +
      "0.6745/3.5 Iglewicz-Hoban cutoff; MAD = 0 degenerates to zero rows") {
    // {1..11, 1000}: median 6.5, MAD 3.0 — the clean ladder's worst
    // modified z is 0.6745·5.5/3 ≈ 1.24, far under 3.5; the
    // outlier's is 0.6745·993.5/3 ≈ 223
    val out = run("w7_mad_outliers", fixture("mad",
      "events" -> eventsOf((1 to 11).map(_.toDouble) :+ 1000.0)))
    assert(out.length == 1)
    assert(out.head.getAs[Double]("value") == 1000.0)
    assert(out.head.getAs[Double]("robust_z") ==
      round6(0.6745 * (1000.0 - 6.5) / 3.0))

    // >half the sample at one value → MAD = 0 → the guard yields an
    // empty frame instead of an engine-defined 0/0
    val degen = run("w7_mad_outliers", fixture("mad0",
      "events" -> eventsOf(Seq.fill(7)(5.0) ++ Seq(1.0, 2.0, 1000.0))))
    assert(degen.isEmpty)
  }

  // ===================================================================
  // 2. Trimmed mean — the trim removes the outlier exactly
  // ===================================================================

  test("w10_trimmed_mean drops the gross outlier with the 10% rank trim " +
      "(exact interior mean); below n = 10 the trim is a no-op") {
    // n = 10: trim rank 1 and rank 10 → keep 2..9, mean 5.5
    val r = run("w10_trimmed_mean", fixture("trim",
      "events" -> eventsOf((1 to 9).map(_.toDouble) :+ 1000.0))).head
    assert(r.getAs[Long]("n_kept") == 8L)
    assert(r.getAs[Double]("trimmed_mean") == 5.5)

    // n = 5: n div 10 = 0 → nothing trimmed, plain mean (incl. the
    // outlier) — the floor contract, not a hidden minimum trim
    val r2 = run("w10_trimmed_mean", fixture("trim5",
      "events" -> eventsOf(Seq(1.0, 2.0, 3.0, 4.0, 90.0)))).head
    assert(r2.getAs[Long]("n_kept") == 5L)
    assert(r2.getAs[Double]("trimmed_mean") == 20.0)
  }
}
