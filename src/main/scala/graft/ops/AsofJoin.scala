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
  * `last(payload, ignoreNulls)` over a per-key window ordered by
  * (ts, side) with an unbounded-preceding frame, then keep the left
  * rows. Cost is ONE hash shuffle on the key plus a per-partition
  * sort — linear, scale-safe, and skew-tolerant under AQE — versus a
  * naive range join whose per-key cross product is quadratic.
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
    val leftCols = left.columns.toSeq
    val outPayload = payload.map(prefix + _)

    val taggedRight = right.select(
      keys.map(col) ++
        Seq(col(rightTs).as("__ts"), lit(0).as("__side")) ++
        leftCols.filterNot(keys.contains).map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payload.map(p => col(p).as(prefix + p)): _*)
    val taggedLeft = left.select(
      keys.map(col) ++
        Seq(col(leftTs).as("__ts"), lit(1).as("__side")) ++
        leftCols.filterNot(keys.contains).map(col) ++
        payload.map(p => lit(null).cast(right.schema(p).dataType).as(prefix + p)): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = outPayload.foldLeft(taggedRight.unionByName(taggedLeft)) {
      (df, p) => df.withColumn(p, last(col(p), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1).drop("__ts", "__side")
  }
}
