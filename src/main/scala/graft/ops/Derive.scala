package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Derived-column operators P1-P5 (reference spark_streaming.py:49-69).
  *
  * Each bucketing rule is exposed as a pure `Column => Column` so it can
  * be applied both to the census parity surface and, parameterized, to
  * any numeric column of the test corpus (FIXTURES.md §4 mapping). All
  * when-chains preserve the reference's exact boundary semantics —
  * including the deliberately mixed `<` / `<=` boundaries of
  * work_hours_category (spark_streaming.py:60-63).
  */
object Derive {

  /** P2 — 5-way age bucketing (spark_streaming.py:51-56). */
  def ageGroup(age: Column): Column =
    when(age < 18, "Under 18")
      .when(age < 30, "18-29")
      .when(age < 45, "30-44")
      .when(age < 65, "45-64")
      .otherwise("65+")

  /** P3 — binary income bucketing (spark_streaming.py:57-59). */
  def incomeCategory(income: Column): Column =
    when(income === 1, "High Income (>50K)")
      .otherwise("Low Income (<=50K)")

  /** P3 generalized: binary high/low split on a threshold. */
  def highLow(v: Column, threshold: Double): Column =
    when(v > threshold, "High Income (>50K)")
      .otherwise("Low Income (<=50K)")

  /** P4 — 3-way work-hours bucketing; note `<20` then `<=40`
    * (spark_streaming.py:60-63).
    */
  def workHoursCategory(hours: Column): Column =
    when(hours < 20, "Part-time (<20)")
      .when(hours <= 40, "Full-time (20-40)")
      .otherwise("Overtime (>40)")

  /** P5 — 5-way capital-income bucketing; `<0` tested before `==0`
    * (spark_streaming.py:64-69).
    */
  def capitalIncomeCategory(capital: Column): Column =
    when(capital < 0, "Loss")
      .when(capital === 0, "Break-even")
      .when(capital < 5000, "Low Gain")
      .when(capital < 20000, "Medium Gain")
      .otherwise("High Gain")

  /** Display rank for the age_group labels (O4 — the dashboard's
    * pd.Categorical ordering, dashboard.py:277-279).
    */
  val ageGroupOrder: Seq[String] =
    Seq("Under 18", "18-29", "30-44", "45-64", "65+")

  def ageGroupRank(ageGroup: Column): Column =
    ageGroupOrder.zipWithIndex.foldLeft(lit(ageGroupOrder.length)) {
      case (acc, (label, i)) => when(ageGroup === label, i).otherwise(acc)
    }

  /** P1-P5 — full census enrichment (reference processed_df,
    * spark_streaming.py:49-69). `clock` injects a fixed timestamp for
    * deterministic golden tests (SURVEY §7.4 risk 1); None = wall clock,
    * matching the reference's `current_timestamp()`.
    */
  def enrich(df: DataFrame, clock: Option[Timestamp] = None): DataFrame = {
    val ts = clock.map(t => lit(t).cast("timestamp")).getOrElse(current_timestamp())
    df.withColumn("timestamp", ts)
      .withColumn("age_group", ageGroup(col("age")))
      .withColumn("income_category", incomeCategory(col("income")))
      .withColumn("work_hours_category", workHoursCategory(col("hours_per_week")))
      .withColumn("capital_income_category", capitalIncomeCategory(col("capital_income")))
  }
}
