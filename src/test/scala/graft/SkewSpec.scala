package graft

import org.apache.spark.sql.functions._

import graft.ops.Skew

/** Salted aggregation must be value-identical to the direct
  * aggregation on skewed data (one key holding most rows) — the salt
  * only changes the shuffle fan-out, never the result.
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  // heavy skew: "hot" holds 5000 rows, 50 cold keys hold 10 each
  private lazy val skewed = (
    (1 to 5000).map(i => ("hot", i % 7, s"v${i % 40}")) ++
      (1 to 500).map(i => (s"cold${i % 50}", i % 3, s"v$i"))
    ).toDF("k", "v", "s")

  test("saltedCount == direct count") {
    val direct = skewed.groupBy("k").agg(count(lit(1)).as("count"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(skewed, Seq("k"), buckets = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == direct)
  }

  test("saltedSum == direct sum (deterministic salt)") {
    val direct = skewed.groupBy("k").agg(sum("v").as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedSum(skewed, Seq("k"), "v", buckets = 8,
        saltFrom = Some(col("s")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == direct)
  }

  test("saltedCountDistinct == direct countDistinct (including NULL values)") {
    // count(DISTINCT x) ignores NULLs — the salted version must too
    val withNulls = skewed.unionAll(
      Seq(("hot", 0, null.asInstanceOf[String]),
          ("coldX", 0, null.asInstanceOf[String])).toDF("k", "v", "s"))
    val direct = withNulls.groupBy("k").agg(countDistinct("s").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCountDistinct(withNulls, Seq("k"), "s", buckets = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // strict equality: keys whose only value is NULL must appear with 0,
    // exactly as count(DISTINCT) reports them
    assert(direct("coldX") == 0L)
    assert(salted == direct)
  }

  test("salting actually fans the hot key across buckets") {
    val stage1 = skewed.withColumn("__salt", Skew.salt(8, Some(col("s"))))
      .filter(col("k") === "hot")
      .select("__salt").distinct().count()
    assert(stage1 > 4, s"hot key landed in only $stage1 salt buckets")
  }
}
