package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM-training-data pipelines.
  *
  * Exact dedup is a single hash-shuffle on the fingerprint key: keys are
  * md5 (uniform, high-cardinality), so there is no skew and the shuffle
  * partitions evenly at any scale — the same plan holds at 100 TB with
  * more shuffle partitions. Nothing here collects to the driver.
  *
  * Near-dup (MinHash/SimHash) lives in [[NearDup]]; both consume the
  * same tokenization ([[TextAnalysis.tokens]]).
  */
object Dedup {

  /** Keep-first exact dedup: one row per `key`, the row with the
    * smallest `order` values (deterministic, unlike `dropDuplicates`
    * which keeps an arbitrary row). `row_number` over a hash-partitioned
    * window — one shuffle, streaming-friendly rank, no full sort.
    */
  def exactKeepFirst(df: DataFrame, key: Seq[Column], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(key: _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Duplication summary over a fingerprint column: total rows, distinct
    * fingerprints, duplicate rows (total − distinct). Two-stage
    * aggregation (groupBy fingerprint, then global) — exact counts with
    * map-side partial aggregation, never a driver-side distinct. For a
    * cheap estimate at extreme scale use [[approxDistinct]] instead.
    */
  def exactSummary(df: DataFrame, fingerprint: Column): DataFrame =
    df.groupBy(fingerprint.as("__fp"))
      .agg(count(lit(1)).as("__c"))
      .agg(sum(col("__c")).as("n_rows"),
           count(lit(1)).as("n_unique"),
           (sum(col("__c")) - count(lit(1))).as("n_dup_rows"))

  /** HLL++ distinct-fingerprint estimate (`approx_count_distinct`) —
    * the constant-memory scale path for "how much dup is in this 100 TB
    * crawl" triage before paying for the exact shuffle.
    */
  def approxDistinct(df: DataFrame, fingerprint: Column, rsd: Double = 0.05): DataFrame =
    df.agg(approx_count_distinct(fingerprint, rsd).as("approx_unique"),
           count(lit(1)).as("n_rows"))

  /** Streaming exact dedup: keep the first arrival per fingerprint on
    * an unbounded stream. `dropDuplicatesWithinWatermark` bounds the
    * dedup state to the watermark horizon — the only way stateful
    * dedup survives an unbounded 100 TB/day stream (unbounded-state
    * `dropDuplicates` would OOM; beyond-horizon re-arrivals are
    * accepted as the documented tradeoff).
    */
  def streamingExactDedup(stream: DataFrame, fingerprint: Column,
      tsCol: String, watermarkDelay: String): DataFrame =
    stream.withColumn("__fp", fingerprint)
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")
}
