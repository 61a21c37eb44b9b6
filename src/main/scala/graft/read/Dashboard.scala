package graft.read

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Read-side analytics operators — the reference dashboard's six
  * pandas/Mongo callbacks re-expressed as first-class Spark queries
  * (SURVEY §3.3): snapshot re-aggregation A8, top-k A11/O3, argmax
  * per group W3/J1, percent-of-group W2, latest snapshot W4/O1,
  * time-range filter F4, membership filter F5.
  */
object Dashboard {

  /** A8 — re-aggregation over snapshots: sum of per-batch counts by key
    * (dashboard.py:274,310,346). Associative with the per-batch counts
    * by design; second-stage agg is partial-combined map-side by Spark.
    */
  def reaggregate(snapshots: DataFrame, keys: Seq[String], countCol: String = "count"): DataFrame =
    snapshots.groupBy(keys.map(col): _*).agg(sum(col(countCol)).as("total"))

  /** A11/O3 — top-k groups by measure (dashboard.py:313,412), tie-broken
    * on the key columns for determinism (`nlargest` keeps first-seen;
    * we pin an explicit total-order instead). Compiles to
    * TakeOrderedAndProject — no global sort, no single-partition shuffle.
    */
  def topK(df: DataFrame, keys: Seq[String], measure: Column, k: Int): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(measure.as("total"))
      .orderBy(col("total").desc +: keys.map(col(_).asc): _*)
      .limit(k)

  /** W3 — latest row per group via ranking window (dashboard.py:408-409
    * expressed idiomatically); `tieBreak` pins a total order inside ties
    * of `tsCol`.
    */
  def latestPerGroup(df: DataFrame, group: Seq[String], tsCol: String, tieBreak: String): DataFrame = {
    val w = Window.partitionBy(group.map(col): _*)
      .orderBy(col(tsCol).desc, col(tieBreak).desc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** J1 — the reference's join-back argmax shape (dashboard.py:408-409):
    * inner equi-join of the full table against per-group max(ts). Keeps
    * ALL rows tied at the max, exactly like pd.merge. No broadcast hint:
    * the right side has one row per group, and group cardinality is
    * unbounded at scale — AQE picks broadcast-vs-shuffle from the
    * measured size at runtime, which is the only safe choice at 100 TB.
    */
  def argmaxJoinBack(df: DataFrame, group: String, tsCol: String): DataFrame = {
    val latest = df.groupBy(col(group)).agg(max(col(tsCol)).as(tsCol))
    df.join(latest, Seq(group, tsCol), "inner")
  }

  /** W2/P10 — percent of group total (dashboard.py:349-350):
    * count / sum(count) over (partition by group) * 100.
    */
  def percentOfGroup(df: DataFrame, group: String, countCol: String = "count"): Column =
    col(countCol) / sum(col(countCol)).over(Window.partitionBy(col(group))) * 100

  /** W4/O1 — latest snapshot: global top-1 by timestamp
    * (dashboard.py:150-152) → TakeOrderedAndProject, not a full sort.
    */
  def latest(df: DataFrame, tsCol: String, tieBreak: String): DataFrame =
    df.orderBy(col(tsCol).desc, col(tieBreak).desc).limit(1)

  /** F4 — time-range predicate (dashboard.py:473-480): rows within the
    * trailing `minutes` of `asOf`; None = 'all' (no filter). Pushed
    * down to the parquet scan as a row filter. NOTE: on the
    * date-partitioned snapshot sink, partition PRUNING needs the
    * batch_date bound too — use `ParquetSnapshotSink.readSince` as the
    * source (SinkPruningSpec shows the difference).
    */
  def timeRange(df: DataFrame, tsCol: String, asOf: Column, minutes: Option[Int]): DataFrame =
    minutes match {
      case Some(m) => df.filter(col(tsCol) >= asOf - expr(s"INTERVAL $m MINUTES"))
      case None    => df
    }

  /** F7 — column-existence guard (dashboard.py:207,218,229,450): the
    * reference tolerates schema drift in its schemaless sink. Our sink
    * schema is fixed, but the guard is kept for parity and used by
    * [[withIncomePct]].
    */
  def hasColumns(df: DataFrame, names: String*): Boolean =
    names.forall(df.columns.contains)

  /** A9 — income-percentage derivation over the wide summary shape
    * (dashboard.py:167-170): pct = high / (high + low) * 100, guarded
    * on column existence (F7) — absent columns → input unchanged,
    * matching the reference's silent skip.
    */
  def withIncomePct(df: DataFrame,
      highCol: String = "count_high_income",
      lowCol: String = "count_low_income"): DataFrame =
    if (hasColumns(df, highCol, lowCol))
      df.withColumn("pct_high_income",
        round(col(highCol) / (col(highCol) + col(lowCol)) * 100, 6))
    else df

  /** F5 — membership filter against a computed top-k key set
    * (dashboard.py:313-314), as a broadcast left-semi join so the
    * key set never collects to the driver.
    */
  def filterToTopK(df: DataFrame, key: String, byMeasure: Column, k: Int): DataFrame = {
    val top = topK(df, Seq(key), byMeasure, k).select(key)
    df.join(broadcast(top), Seq(key), "left_semi")
  }
}
