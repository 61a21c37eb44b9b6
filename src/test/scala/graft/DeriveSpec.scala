package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.Derive
import graft.schema.CensusRecord
import graft.stream.Simulator

/** Bucket-boundary semantics (SURVEY §5.2): the exact `<` / `<=` / `==`
  * edges of the reference's when-chains (spark_streaming.py:51-69).
  */
class DeriveSpec extends SparkSpec {
  import spark.implicits._

  private def bucket(values: Seq[Int], f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Map[Int, String] =
    values.toDF("v").withColumn("b", f(col("v")))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap

  test("age_group boundaries (17/18/29/30/44/45/64/65)") {
    val b = bucket(Seq(17, 18, 29, 30, 44, 45, 64, 65), Derive.ageGroup)
    assert(b(17) == "Under 18" && b(18) == "18-29" && b(29) == "18-29")
    assert(b(30) == "30-44" && b(44) == "30-44")
    assert(b(45) == "45-64" && b(64) == "45-64" && b(65) == "65+")
  }

  test("work_hours boundaries — mixed <20 then <=40 (19/20/40/41)") {
    val b = bucket(Seq(19, 20, 40, 41), Derive.workHoursCategory)
    assert(b(19) == "Part-time (<20)")
    assert(b(20) == "Full-time (20-40)" && b(40) == "Full-time (20-40)")
    assert(b(41) == "Overtime (>40)")
  }

  test("capital_income boundaries — <0 before ==0 (-1/0/1/4999/5000/19999/20000)") {
    val b = bucket(Seq(-1, 0, 1, 4999, 5000, 19999, 20000), Derive.capitalIncomeCategory)
    assert(b(-1) == "Loss" && b(0) == "Break-even")
    assert(b(1) == "Low Gain" && b(4999) == "Low Gain")
    assert(b(5000) == "Medium Gain" && b(19999) == "Medium Gain")
    assert(b(20000) == "High Gain")
  }

  test("income_category binary mapping") {
    val b = bucket(Seq(0, 1), Derive.incomeCategory)
    assert(b(1) == "High Income (>50K)" && b(0) == "Low Income (<=50K)")
  }

  test("enrich adds the 5 derived columns with an injectable clock") {
    val rows: Seq[CensusRecord] = Simulator.generateSeed(20)
    val fixed = Timestamp.valueOf("2024-01-01 00:00:00")
    val out = Derive.enrich(rows.toDF(), clock = Some(fixed))
    assert(Seq("timestamp", "age_group", "income_category",
      "work_hours_category", "capital_income_category")
      .forall(out.columns.contains))
    assert(out.select("timestamp").distinct().collect()
      .map(_.getTimestamp(0)).toSeq == Seq(fixed))
  }

  test("age_group categorical rank follows display order") {
    val df = Derive.ageGroupOrder.toDF("g")
      .withColumn("rk", Derive.ageGroupRank(col("g")))
    val got = df.orderBy("rk").collect().map(_.getString(0)).toSeq
    assert(got == Derive.ageGroupOrder)
  }
}
