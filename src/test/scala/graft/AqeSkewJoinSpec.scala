package graft

import org.apache.spark.sql.functions._

/** Proves the delegation claim in [[graft.ops.Skew]]'s scaladoc: join
  * skew is left to AQE's skew-join splitting (not hand-salted), so a
  * spec must show the splitting actually fires. Thresholds are lowered
  * to make a local-scale skewed partition qualify (production defaults
  * are 256 MB — sized for real clusters); the mechanism under test is
  * identical.
  */
class AqeSkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits a skewed sort-merge-join partition (skew=true in final plan)") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.shuffle.partitions").map(k => k -> conf.getOption(k))
    try {
      // force SMJ (no broadcast), and scale AQE's skew thresholds down
      // to fixture size: a partition is "skewed" past 16 KB and splits
      // into ~8 KB target chunks
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16384")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8192")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      conf.set("spark.sql.shuffle.partitions", "8")

      // hot key holds ~99% of the left side; right side is uniform
      val left = spark.range(100000)
        .select(when(col("id") % 100 =!= 0, "hot").otherwise(concat(lit("k"), col("id"))).as("k"),
          col("id").as("payload"))
      val right = (0 until 50).map(i => (s"k${i * 100}", i)).toDF("k", "rv")
        .unionAll(Seq(("hot", -1)).toDF("k", "rv"))

      val joined = left.join(right, "k")
      // execute joined's OWN query execution (count() would build a new
      // one and leave joined's plan un-finalized) → AQE replans at runtime;
      // 99000 hot matches + 50 matched cold keys (k0..k4900), 1 row each
      assert(joined.collect().length == 99050)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE skew-join split did not fire; final plan:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
