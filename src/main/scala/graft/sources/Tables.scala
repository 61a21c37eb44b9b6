package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Loaders for the test corpus (TESTDATA.md).
  *
  * `events.ts` normalizes to Spark's session-zone TimestampType
  * whatever the fixture generation stored physically — the engine
  * surface (window buckets, unix_micros arithmetic, as-of bucketing)
  * is written against TIMESTAMP and must not care which driver
  * generation produced the files:
  *  - parquet TIMESTAMP(NANOS) (rounds ≤ 6): Spark's vectorized
  *    reader rejects it outright ([PARQUET_TYPE_ILLEGAL]); Sessions
  *    sets `spark.sql.legacy.parquet.nanosAsLong=true` at build time
  *    (never mutated here — a loader flipping session conf is a
  *    cross-query surprise), the nanos arrive as raw longs and
  *    convert in-plan (codegen'd integer division, precision loss
  *    only below 1 µs);
  *  - parquet timestamp[us] without UTC adjustment (round-7
  *    regeneration): arrives as TIMESTAMP_NTZ; cast to TimestampType
  *    reinterprets the wall clock in the session zone (pinned UTC) —
  *    identical micros, and the five ts-arithmetic queries that
  *    require TIMESTAMP (f4/w5/p9/j3/j2b) keep working unchanged.
  */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")
  }

  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }

  /** All corpus table names (TESTDATA.md). */
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every corpus table as a temp view, making the whole
    * surface reachable through `spark.sql` — the engine's SQL entry
    * point (same lineage as the DataFrame loaders, so events gets the
    * identical nanos conversion).
    */
  def registerViews(spark: SparkSession, dir: String): Unit =
    names.foreach(n => table(spark, dir, n).createOrReplaceTempView(n))
}
