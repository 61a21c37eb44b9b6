package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range join (point-in-interval) — the second time-series join Spark
  * lacks a native operator for (alongside [[AsofJoin]]).
  *
  * A naive `l.key = r.key AND l.ts >= r.start AND l.ts < r.end` join
  * degenerates to a per-key cross product (quadratic in the hot key).
  * The scale shape: quantize time into fixed buckets, explode each
  * interval into the buckets it covers, and equi-join points on
  * (key, bucket) — every point has exactly ONE bucket, so the join is
  * a plain hash shuffle with no duplicate matches, and the exact
  * containment predicate filters within the bucket. Bucket width
  * trades explode fan-out (long intervals → many rows) against
  * candidate precision; size it near the typical interval length.
  */
object RangeJoin {

  /** Join `points` to the interval (from `intervals`) that contains
    * them: start-inclusive, end-exclusive. Inner semantics — points in
    * no interval are dropped. Output: all point columns + all interval
    * columns (start/end included).
    *
    * Malformed intervals (`end <= start`) produce no buckets and are
    * dropped — unguarded, Spark's `sequence` would count DOWN for an
    * inverted range and emit spurious rows (and a corrupt `end << start`
    * could allocate a huge descending array). Fan-out bound: `sequence`
    * hard-fails past its array-size cap, and long before that a large
    * per-interval bucket count multiplies the shuffle — size
    * `bucketSeconds` near the typical interval length so covered
    * buckets per interval stay small (1-2 for well-sized buckets).
    *
    * @param bucketSeconds time-bucket width for the equi-join key
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame, keys: Seq[String],
      tsCol: String, startCol: String, endCol: String,
      bucketSeconds: Long): DataFrame = {
    val stepMicros = bucketSeconds * 1000000L
    val p = points.withColumn("__bucket",
      floor(unix_micros(col(tsCol)) / stepMicros))
    // end is exclusive → last covered bucket is floor((end-1µs)/step);
    // empty/inverted intervals explode an empty array (row dropped)
    val iv = intervals.withColumn("__bucket",
      explode(when(col(endCol) > col(startCol),
        sequence(
          floor(unix_micros(col(startCol)) / stepMicros),
          floor((unix_micros(col(endCol)) - 1) / stepMicros)))
        .otherwise(array().cast("array<long>"))))
    p.join(iv, keys :+ "__bucket")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__bucket")
  }
}
