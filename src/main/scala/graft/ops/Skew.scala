package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot grouping keys (100 TB design note).
  *
  * A `groupBy(key)` over data where one key holds a large fraction of
  * all rows funnels that key's entire volume through one reducer.
  * Spark's map-side partial aggregation already absorbs most of this
  * for algebraic aggregates; salting is the explicit fix for the cases
  * partial agg can't save (high-cardinality accumulators per key, e.g.
  * collect-style or distinct-heavy aggregates): aggregate on
  * (key, salt) first — spreading the hot key over `buckets` reducers —
  * then combine the partials by key.
  *
  * Join-side skew is deliberately NOT hand-salted here: AQE's
  * skew-join splitting (enabled in [[graft.Sessions]]) replans
  * oversized partitions at runtime from measured sizes, which beats
  * static salting for joins. AqeSkewJoinSpec demonstrates the split
  * firing (`skew=true` in the final adaptive plan) on a skewed join.
  */
object Skew {

  /** Uniform salt column in [0, buckets). Deterministic per row when
    * `deterministicFrom` is given (hash-based — reproducible tests,
    * stable retries); random otherwise.
    */
  def salt(buckets: Int, deterministicFrom: Option[Column] = None): Column =
    deterministicFrom match {
      case Some(c) => pmod(hash(c), lit(buckets))
      case None    => (rand(42) * buckets).cast("int")
    }

  /** Salted count: two-stage `groupBy(keys :+ salt).count` →
    * `groupBy(keys).sum` — associative, so results are identical to the
    * direct count while the hot key fans out over `buckets` reducers.
    */
  def saltedCount(df: DataFrame, keys: Seq[String], buckets: Int = 16,
      saltFrom: Option[Column] = None): DataFrame = {
    val keyCols = keys.map(col)
    df.withColumn("__salt", salt(buckets, saltFrom))
      .groupBy(keyCols :+ col("__salt"): _*)
      .agg(count(lit(1)).as("__c"))
      .groupBy(keyCols: _*)
      .agg(sum(col("__c")).as("count"))
  }

  /** Salted sum over `valueCol`, same two-stage shape. */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
      buckets: Int = 16, saltFrom: Option[Column] = None): DataFrame = {
    val keyCols = keys.map(col)
    df.withColumn("__salt", salt(buckets, saltFrom))
      .groupBy(keyCols :+ col("__salt"): _*)
      .agg(sum(col(valueCol)).as("__s"))
      .groupBy(keyCols: _*)
      .agg(sum(col("__s")).as(s"sum_$valueCol"))
  }

  /** Salted exact count-distinct: stage 1 dedups (keys, value) pairs
    * salted BY THE VALUE — the hot key's distinct values spread across
    * reducers and duplicates of one value still collide (same salt) —
    * stage 2 counts per key. The partial-agg-proof case where salting
    * actually matters.
    */
  def saltedCountDistinct(df: DataFrame, keys: Seq[String], valueCol: String,
      buckets: Int = 16): DataFrame = {
    val keyCols = keys.map(col)
    // NULL values are kept through stage 1 (they collapse to one group
    // per key — hash(NULL) is a constant salt) and excluded only by the
    // stage-2 `count(valueCol)`: SQL count(DISTINCT x) ignores NULLs but
    // still RETURNS the key with 0 when every value is NULL — filtering
    // NULL rows up front would drop those keys from the output entirely
    df.withColumn("__salt", salt(buckets, Some(col(valueCol))))
      .groupBy(keyCols ++ Seq(col("__salt"), col(valueCol)): _*)
      .agg(lit(1).as("__one"))
      .groupBy(keyCols: _*)
      .agg(count(col(valueCol)).as(s"distinct_$valueCol"))
  }
}
