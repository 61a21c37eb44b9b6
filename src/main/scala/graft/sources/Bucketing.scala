package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed-table helpers — the co-located-join scale tool.
  *
  * Writing both sides of a recurring fact-fact join bucketed (and
  * sorted) by the join key makes every subsequent join shuffle-free:
  * Spark matches bucket layouts and plans a sort-merge join with NO
  * Exchange on either side. On a 100 TB fact table joined every run,
  * paying the shuffle once at write time instead of per query is the
  * single biggest join optimization available — BucketingSpec asserts
  * the exchange-free plan.
  *
  * (The test corpus itself is plain parquet, which cannot carry bucket
  * metadata — bucketing requires `saveAsTable` into the session
  * catalog, so these helpers are exercised via catalog tables.)
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted catalog table (overwrites). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
}
