package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic, size-bounded shard writer — the materialization of
  * the `tx19_shard_manifest` receipt (TextQueries): shard files whose
  * concatenated read-back order per source is EXACTLY the manifest
  * order (content-hash `h`, then `doc_id`), so the md5 a training job
  * logs from the manifest can be re-derived from the files on disk.
  *
  * ==Scale shape (100 TB)==
  * `repartitionByRange` over the full sort key assigns contiguous
  * (source, h, doc_id) ranges to ascending partition ids — so a single
  * giant source parallelizes across many write tasks (no
  * one-task-per-source funnel), while the global order is still
  * recoverable from file names alone: Spark names files
  * `part-<task>%05d-<jobUUID>-c<n>%03d`, task ids ascend with the
  * range, and the `c` counter ascends with `maxRecordsPerFile` splits
  * inside a task. Lexicographic file order == manifest order; no
  * manifest-side bookkeeping of file boundaries is needed, which is
  * what makes the receipt robust to re-sharding with a different
  * `maxRecordsPerFile`.
  *
  * The range exchange is the single shuffle; the sort is
  * partition-local on already-range-partitioned data. `h` is written
  * alongside the payload as the shuffle receipt (a reader can re-check
  * the order without re-tokenizing).
  */
object Shards {

  /** Must match tx19_shard_manifest's bucket count — the manifest and
    * the writer hash with the same modulus or the orders diverge.
    */
  val HashBuckets = 1000000

  /** Write `docs` (source, doc_id, text) as hive-partitioned parquet
    * shards under `outDir/source=<s>/`, each file capped at
    * `maxRecordsPerFile` rows, globally ordered by (source, h, doc_id).
    */
  def writeShards(docs: DataFrame, outDir: String, maxRecordsPerFile: Int,
      nTasks: Int = 8): Unit = {
    docs
      .select(col("source"), col("doc_id"), col("text"),
        TextAnalysis.hashBucket(col("text"), HashBuckets).as("h"))
      .repartitionByRange(nTasks, col("source"), col("h"), col("doc_id"))
      .sortWithinPartitions(col("source"), col("h"), col("doc_id"))
      .write
      .option("maxRecordsPerFile", maxRecordsPerFile.toLong)
      .partitionBy("source")
      .mode("overwrite")
      .parquet(outDir)
  }
}
