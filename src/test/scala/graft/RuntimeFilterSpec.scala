package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning (Spark's row-level runtime
  * filter): when a shuffle join's build side is small and selective,
  * Spark injects a `BloomFilterMightContain` predicate on the probe
  * side's scan, dropping non-matching fact rows BEFORE the shuffle —
  * at 100 TB this is the difference between shuffling the whole fact
  * table and shuffling only the ~matching fraction. The feature keys
  * off size thresholds meant for clusters (creation side ≤ 10 MB,
  * probe scan ≥ 10 GB), so the spec lowers them to prove the
  * machinery fires and that the filtered result is unchanged.
  */
class RuntimeFilterSpec extends SparkSpec {
  import spark.implicits._

  test("selective dim join injects a bloom might_contain on the fact scan") {
    val dirPath = java.nio.file.Files.createTempDirectory("graft_rtf")
    val dir = dirPath.toString
    (0L until 20000L).map(i => (i, i % 400, s"v$i"))
      .toDF("fact_id", "key", "payload")
      .write.mode("overwrite").parquet(s"$dir/fact")
    (0L until 400L).map(i => (i, if (i % 40 == 0) "hot" else "cold"))
      .toDF("key", "tag")
      .write.mode("overwrite").parquet(s"$dir/dim")

    val conf = spark.conf
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> conf.getOption(k))
    try {
      conf.set(keys(0), "true")
      conf.set(keys(1), "10MB")
      conf.set(keys(2), "0")        // any probe scan qualifies
      conf.set(keys(3), "-1")       // force the shuffle join the filter targets
      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim").filter(col("tag") === "hot")
      val joined = fact.join(dim, "key")
      val n = joined.count()
      // 10 hot keys × 50 fact rows per key
      assert(n == 500L, s"rows $n")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        s"no runtime bloom filter in plan:\n${plan.take(4000)}")
    } finally {
      saved.foreach {
        case (k, Some(v)) => conf.set(k, v)
        case (k, None)    => conf.unset(k)
      }
      // don't leak the parquet fixtures on every run
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dirPath).iterator().asScala.toSeq
        .sortBy(-_.getNameCount)
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }
}
