package graft

import org.apache.spark.sql.functions._

import graft.ops.Stats

class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("globalStats: avg/stddev(sample)/min/max in one pass") {
    val df = Seq(2.0, 4.0, 4.0, 4.0, 5.0, 5.0, 7.0, 9.0).toDF("x")
    val row = Stats.globalStats(df, "x" -> "x").head()
    assert(math.abs(row.getAs[Double]("avg_x") - 5.0) < 1e-12)
    // sample stddev of this classic set: sqrt(32/7)
    assert(math.abs(row.getAs[Double]("stddev_x") - math.sqrt(32.0 / 7.0)) < 1e-12)
    assert(row.getAs[Double]("min_x") == 2.0 && row.getAs[Double]("max_x") == 9.0)
  }

  test("zScoreOutliers flags exactly the |z|>3 rows") {
    // 29 values at 10 and one at 1000 → the 1000 is a >3-sigma outlier
    val df = (Seq.fill(29)(10.0) :+ 1000.0).toDF("v")
    val out = Stats.zScoreOutliers(df, "v").collect()
    assert(out.length == 1)
    assert(out.head.getAs[Double]("v") == 1000.0)
    assert(out.head.getAs[Double]("v_z_score") > 3.0)
  }

  test("stddev==0 guard yields no anomalies (F2)") {
    val df = Seq.fill(10)(42.0).toDF("v")
    assert(Stats.zScoreOutliers(df, "v").isEmpty)
  }

  test("empty input yields no anomalies") {
    val df = Seq.empty[Double].toDF("v")
    assert(Stats.zScoreOutliers(df, "v").isEmpty)
  }

  test("approx_percentile tracks exact percentile within tolerance") {
    // the t-digest sketch is the 100 TB quantile path (a12's exact
    // percentile needs the full sorted group); no oracle possible
    // (engine sketches differ) so the contract is pinned here
    val df = (1 to 10000).map(_.toDouble).toDF("v")
    val row = df.agg(
      expr("percentile(v, 0.5)"),
      expr("approx_percentile(v, 0.5, 1000)")).head()
    val (exact, approx) = (row.getDouble(0), row.getDouble(1))
    assert(math.abs(approx - exact) / exact < 0.02, s"approx $approx vs exact $exact")
  }

  test("single row (stddev undefined) yields no anomalies") {
    val df = Seq(5.0).toDF("v")
    assert(Stats.zScoreOutliers(df, "v").isEmpty)
  }
}
