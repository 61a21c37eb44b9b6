package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Statistics operators: A1 global multi-aggregate and the W1/P6/F1-F3
  * two-pass z-score anomaly detector (reference spark_streaming.py:78-120).
  *
  * The z-score detector keeps the reference's two-pass shape — collect
  * two scalars, broadcast them back as literals — deliberately: at
  * 100 TB an empty-frame window (`Window.partitionBy()`) would funnel
  * every row through ONE partition, while two passes cost one extra scan
  * and parallelize perfectly (SURVEY §4, §7.4 risk 7).
  */
object Stats {

  /** A1 — global no-group multi-aggregate (spark_streaming.py:78-87):
    * mean/stddev/min/max over the given columns in a single `agg`.
    * Spark `stddev` == sample stddev (`stddev_samp`), matching the
    * PySpark reference and pinned as `stddev_samp` in oracle SQL.
    */
  def globalStats(df: DataFrame, cols: (String, String)*): DataFrame = {
    val aggs: Seq[Column] = cols.flatMap { case (c, alias) =>
      Seq(
        avg(col(c)).as(s"avg_$alias"),
        stddev(col(c)).as(s"stddev_$alias"),
        min(col(c)).cast("double").as(s"min_$alias"),
        max(col(c)).cast("double").as(s"max_$alias"),
      )
    }
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Scalar (avg, stddev_samp) of one column, collected driver-side —
    * first pass of W1 (spark_streaming.py:87). ≤1 row crosses to the
    * driver, safe at any scale.
    */
  def meanStddev(df: DataFrame, c: String): (Double, Double) = {
    val row = Grids.boundedHead(
      df.agg(avg(col(c)), stddev(col(c))), "stats_mean_stddev")
    val m = if (row.isNullAt(0)) Double.NaN else row.getDouble(0)
    val s = if (row.isNullAt(1)) Double.NaN else row.getDouble(1)
    (m, s)
  }

  /** W1+P6+F1-F3 — z-score outlier detection over column `c`
    * (spark_streaming.py:106-115): second pass broadcasts the two batch
    * scalars as literals, derives `abs((c - avg) / stddev)` and filters
    * `z > threshold`. Returns the input rows plus a `<c>_z_score`
    * column; empty result when the F2 guard (`stddev > 0`) fails.
    */
  def zScoreOutliers(df: DataFrame, c: String, threshold: Double = 3.0): DataFrame = {
    val (m, s) = meanStddev(df, c)
    val zCol = s"${c}_z_score"
    if (s.isNaN || s <= 0.0) {
      // F2 guard (spark_streaming.py:106): degenerate batch → no anomalies.
      df.withColumn(zCol, lit(null).cast("double")).limit(0)
    } else {
      df.withColumn(zCol, abs((col(c) - lit(m)) / lit(s)))
        .filter(col(zCol) > threshold)
    }
  }
}
