package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — "attach the most recent `right` row at or before each
  * `left` row's timestamp, per key" — the time-series join Spark has
  * no built-in operator for (brief §custom-operators; kdb/Flink
  * staple).
  *
  * Composition instead of a custom physical operator (preference (a)
  * of the escalation ladder): tag both sides, UNION, and take
  * `last(marker, ignoreNulls)` over a per-key window ordered by
  * (ts, side) with an unbounded-preceding frame, then keep the left
  * rows. The marker is a non-null STRUCT wrapping the payload columns,
  * not the payload itself — so the latest matched right row wins even
  * when its payload value is NULL (DuckDB ASOF JOIN returns the matched
  * row's NULL; filling the raw payload would skip it and carry an older
  * row's value forward). Cost is ONE hash shuffle on the key plus a
  * per-partition sort — linear and scale-safe — versus a naive range
  * join whose per-key cross product is quadratic.
  *
  * Hot-key caveat: AQE splits skewed JOIN partitions, not skewed
  * WINDOW partitions — a pathologically hot key still funnels its
  * whole history through one task's sort. Mitigation at that extreme:
  * pre-split the key range (e.g. bucket by time epoch and as-of join
  * within each bucket, seeding each bucket with the previous bucket's
  * last right row) or pre-bucket both sides on (key, coarse-time).
  *
  * Right rows sort before left rows at equal timestamps, so the match
  * is backward-INCLUSIVE (r.ts <= l.ts), the same contract as DuckDB's
  * `ASOF JOIN ... ON l.ts >= r.ts`, which the oracle uses. The right
  * side should be unique per (key, ts) — equal-ts duplicates make any
  * as-of semantics ambiguous.
  */
object AsofJoin {

  /** Backward-inclusive as-of join. Returns all `left` columns plus
    * `prefix+p` for every payload column `p` of `right` (null when no
    * right row precedes). Filter `prefix+p IS NOT NULL` for inner-asof
    * semantics.
    */
  def asofBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    import org.apache.spark.sql.types.{StructField, StructType}
    val leftCols = left.columns.toSeq
    require(!payload.exists(p => leftCols.contains(prefix + p)),
      s"asof payload prefix '$prefix' collides with a left column; pass a different prefix")
    require(!leftCols.exists(Set("__ts", "__side", "__m")),
      "left columns may not use the reserved names __ts/__side/__m")
    // non-null marker struct: presence = "a right row exists at-or-before",
    // independent of whether its payload values are NULL
    val markerType = StructType(
      payload.map(p => StructField(p, right.schema(p).dataType, nullable = true)))

    val taggedRight = right.select(
      keys.map(col) ++
        Seq(col(rightTs).as("__ts"), lit(0).as("__side")) ++
        leftCols.filterNot(keys.contains).map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(payload.map(col): _*).as("__m"): _*)
    val taggedLeft = left.select(
      keys.map(col) ++
        Seq(col(leftTs).as("__ts"), lit(1).as("__side")) ++
        leftCols.filterNot(keys.contains).map(col) :+
        lit(null).cast(markerType).as("__m"): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    taggedRight.unionByName(taggedLeft)
      .withColumn("__m", last(col("__m"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        payload.map(p => col("__m").getField(p).as(prefix + p)): _*)
  }
}
