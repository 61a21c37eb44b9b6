package graft

/** Dev tool: repeated-sample timing of one stress query (default
  * `dedup_components`) with per-sample GC attribution — built to pin
  * down the round-5 verdict finding that same-commit CC stress
  * timings swung 4.5 s vs 10.5 s at n=1. Prints, per sample:
  * elapsed, the JVM-wide GC time that elapsed DURING the sample, and
  * used heap after — a slow sample dominated by GC is allocator/heap
  * pressure, a slow sample with flat GC is real work or scheduling.
  *
  * Usage: `sbt 'runMain graft.DevCcBench [nSamples] [query] [copies]'`
  * The COPIES× corpus is built in a temp dir per run (same recipe as
  * Bench.stressBench).
  */
object DevCcBench {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val n = args.headOption.map(_.toInt).getOrElse(5)
    val query = if (args.length > 1) args(1) else "dedup_components"
    val copies = if (args.length > 2) args(2).toInt else 8
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"), "graft-ccbench")
    val base = java.nio.file.Files.createTempDirectory("graft_ccbench")
    val dir = base.toString
    graft.sources.Tables.table(spark, sfDir, "documents")
      .crossJoin(spark.range(copies).select(col("id").as("__c")))
      .withColumn("doc_id", col("doc_id") + col("__c") * 1000000L)
      .drop("__c")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    graft.sources.Tables.table(spark, sfDir, "embeddings")
      .crossJoin(spark.range(copies).select(col("id").as("__c")))
      .withColumn("vec_id", col("vec_id") + col("__c") * 10000000L)
      .drop("__c")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    import scala.jdk.CollectionConverters._
    def gcMillis: Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    val rt = Runtime.getRuntime
    (1 to n).foreach { i =>
      spark.catalog.clearCache()
      val gc0 = gcMillis
      val t0 = System.nanoTime()
      SparkEntry.queries(query)(spark, dir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[ccbench] sample=$i elapsed=$sec%.2f s gc_during=${(gcMillis - gc0) / 1000.0}%.2f s " +
        f"heap_used_mb=${(rt.totalMemory - rt.freeMemory) / (1 << 20)}")
    }
    graft.queries.DedupQueries.releaseSignatureCache()
    graft.queries.SimilarityQueries.releaseCaches()
    spark.stop()
  }
}
