package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the test corpus (TESTDATA.md).
  *
  * `events.parquet` stores `ts` as parquet TIMESTAMP(NANOS), which
  * Spark's vectorized reader rejects outright ([PARQUET_TYPE_ILLEGAL]).
  * Sessions built via [[graft.Sessions]] set
  * `spark.sql.legacy.parquet.nanosAsLong=true` at build time (never
  * mutated here — a loader flipping session conf is a cross-query
  * surprise); the nanos arrive as raw longs and convert to Spark's
  * microsecond TimestampType in-plan — a codegen'd integer division,
  * no UDF, precision loss only below 1 µs.
  */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")
  }

  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = spark.read.parquet(s"$dir/events.parquet")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
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
