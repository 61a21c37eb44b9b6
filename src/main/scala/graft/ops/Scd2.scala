package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD Type-2 dimension history as a reusable operator (Kimball):
  * collapse a change LOG into effective-dated version rows, and merge
  * append-only change batches into a standing history. One definition
  * serves `scd2_history` (build), `scd2_merge` (incremental), and the
  * property spec that proves merge ≡ rebuild on arbitrary generated
  * logs (Scd2PropertySpec).
  *
  * Shape: every window partitions by the dimension key ⇒ the whole
  * build is ONE uniform-key shuffle + partition sort (the lag
  * collapse and the lead/version stamp reuse the same partitioning —
  * Spark plans a single Exchange). Output is bounded by the
  * value-transition count, ≪ log size on low-churn dimensions.
  *
  * Merge contract (append-only): every batch row must be dated at or
  * after the history cut. A LATE mid-history row can resurrect a
  * previously-collapsed log row as a new change point — information
  * the change-point set no longer carries — so late data takes the
  * full-rebuild path instead. The property spec exercises exactly
  * this contract: random logs, random cut, merge(history ≤ cut,
  * batch > cut) must equal rebuild(full log) row-for-row, version
  * numbers included.
  */
object Scd2 {

  /** Change points of a log: the rows where the tracked value
    * differs from the key's previous row in (ts, seq) order — what a
    * production merge reads back from the stored dimension.
    */
  def changePoints(log: DataFrame, key: String, value: String,
      ts: String, seq: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ts, seq)
    log.withColumn("__prev", lag(value, 1).over(w))
      .filter(col("__prev").isNull || col("__prev") =!= col(value))
      .select(col(key), col(value), col(ts), col(seq))
  }

  /** Full build: change points stamped with [valid_from, valid_to)
    * via lead(), version numbers, and the open-current flag.
    */
  def build(log: DataFrame, key: String, value: String,
      ts: String, seq: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ts, seq)
    changePoints(log, key, value, ts, seq)
      .withColumn("valid_to", lead(ts, 1).over(w))
      .withColumn("version", row_number().over(w).cast("long"))
      .select(col(key), col(value), col(ts).as("valid_from"),
        col("valid_to"), col("valid_to").isNull.as("is_current"),
        col("version"))
  }

  /** Incremental merge: standing change points ∪ an append-only raw
    * batch, re-collapsed. Within old history nothing re-collapses
    * (change points already alternate); at the boundary a batch row
    * matching the open version collapses away and open intervals
    * close. Equals [[build]] over the full log under the append-only
    * contract (see class doc).
    */
  def merge(histChangePoints: DataFrame, batch: DataFrame, key: String,
      value: String, ts: String, seq: String): DataFrame =
    build(histChangePoints.unionAll(batch.select(
      col(key), col(value), col(ts), col(seq))), key, value, ts, seq)

  /** Point-in-time stamp — the consumer side (`j7_pit_join`'s
    * union-window as-of): stamp each fact row with the dimension
    * value valid at fact time via ONE uniform key shuffle. History
    * rows sort before fact rows on ties (a version taking effect at
    * ts is visible to facts at ts). Facts dated before the key's
    * first version keep NULL — the "not yet known" bucket a naive
    * latest-value join would silently leak into.
    *
    * `hist` carries (key, value, ts, seq); `facts` any columns plus
    * (key, ts, seq). Returns the fact rows plus `asOfCol`.
    */
  def pitStamp(hist: DataFrame, facts: DataFrame, key: String,
      value: String, ts: String, seq: String, asOfCol: String): DataFrame = {
    val factCols = facts.columns
    val histSide = hist.select(
      Seq(col(key), col(ts), lit(0).as("__tag"), col(seq),
        col(value).as("__v")) ++
        factCols.filterNot(Set(key, ts, seq))
          .map(c => lit(null).cast(facts.schema(c).dataType).as(c)): _*)
    val factSide = facts.select(
      Seq(col(key), col(ts), lit(1).as("__tag"), col(seq),
        lit(null).cast(hist.schema(value).dataType).as("__v")) ++
        factCols.filterNot(Set(key, ts, seq)).map(col): _*)
    val w = Window.partitionBy(key).orderBy(col(ts), col("__tag"), col(seq))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    histSide.unionAll(factSide)
      .withColumn(asOfCol, last(col("__v"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(factCols.map(col) :+ col(asOfCol): _*)
  }
}
