package graft.schema

import org.apache.spark.sql.types._

/** The reference's explicit 14-column census input schema.
  *
  * Mirrors the `StructType` declared at reference
  * spark_streaming.py:24-40: all fields nullable, read from headerless
  * CSV with positional binding (spark_streaming.py:45).
  */
object CensusSchema {
  val schema: StructType = StructType(Seq(
    StructField("age", IntegerType, nullable = true),
    StructField("workclass", StringType, nullable = true),
    StructField("education", StringType, nullable = true),
    StructField("marital_status", StringType, nullable = true),
    StructField("occupation", StringType, nullable = true),
    StructField("relationship", StringType, nullable = true),
    StructField("race", StringType, nullable = true),
    StructField("gender", StringType, nullable = true),
    StructField("capital_gain", IntegerType, nullable = true),
    StructField("capital_loss", IntegerType, nullable = true),
    StructField("hours_per_week", IntegerType, nullable = true),
    StructField("native_country", StringType, nullable = true),
    StructField("income", IntegerType, nullable = true),
    StructField("capital_income", IntegerType, nullable = true),
  ))

  /** Typed facade for the same rows (Dataset[CensusRecord] surface). */
  val columns: Seq[String] = schema.fieldNames.toSeq
}

/** Case-class mirror of [[CensusSchema.schema]] for the typed API. */
final case class CensusRecord(
    age: Option[Int],
    workclass: Option[String],
    education: Option[String],
    marital_status: Option[String],
    occupation: Option[String],
    relationship: Option[String],
    race: Option[String],
    gender: Option[String],
    capital_gain: Option[Int],
    capital_loss: Option[Int],
    hours_per_week: Option[Int],
    native_country: Option[String],
    income: Option[Int],
    capital_income: Option[Int],
)
