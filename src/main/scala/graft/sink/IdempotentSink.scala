package graft.sink

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Exactly-once `foreachBatch` sink: staged write + batch-id commit
  * marker.
  *
  * Structured Streaming's foreachBatch contract is AT-LEAST-ONCE — on
  * any failure between the sink write and the checkpoint commit, the
  * whole micro-batch replays with the SAME batchId, and a naive
  * append sink double-counts it (the reference's per-batch
  * `insert_one` loops have exactly this failure mode;
  * /root/reference/spark_streaming.py:102-163 inserts snapshot docs
  * with no replay guard). The standard upgrade is idempotence keyed on
  * batchId, which Spark guarantees is stable across replays:
  *
  *  1. write the batch to a STAGING dir (`.staging-<id>`) — partial
  *     output from a crash is invisible to readers and deleted on
  *     retry;
  *  2. rename staging → `batch=<id>` (directory rename, atomic on
  *     HDFS-like stores);
  *  3. create the `_commits/<id>` marker with overwrite=false — THE
  *     commit point. Readers only trust batch dirs that have a
  *     marker, so a crash between 2 and 3 leaves an orphan data dir
  *     that the retry overwrites and re-commits.
  *
  * A replay of a committed batch short-circuits at the marker check —
  * no read, no write, no double count. Single writer per batchId is
  * Spark's own guarantee (one foreachBatch invocation at a time per
  * query); a concurrent duplicate would fail loudly on the
  * overwrite=false create rather than corrupt. At 100 TB this is the
  * difference between a restartable pipeline and one whose sink needs
  * a full dedup pass after every incident; on S3-class stores the
  * rename step is swapped for a manifest-object create with
  * if-none-match — same commit-point structure.
  */
object IdempotentSink {

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  def commitsDir(dir: String) = new Path(dir, "_commits")

  /** Write one micro-batch exactly once. Returns true if this call
    * committed the batch, false if it was already committed (replay).
    */
  def writeBatch(df: DataFrame, dir: String, batchId: Long): Boolean = {
    val spark = df.sparkSession
    val base = new Path(dir)
    val hfs = fs(spark, base)
    val marker = new Path(commitsDir(dir), batchId.toString)
    if (hfs.exists(marker)) return false
    val staging = new Path(base, s".staging-$batchId")
    if (hfs.exists(staging)) hfs.delete(staging, true)
    df.write.mode("overwrite").parquet(staging.toString)
    val dest = new Path(base, s"batch=$batchId")
    if (hfs.exists(dest)) hfs.delete(dest, true)
    require(hfs.rename(staging, dest),
      s"rename $staging -> $dest failed")
    hfs.mkdirs(commitsDir(dir))
    hfs.create(marker, false).close()
    true
  }

  /** foreachBatch adapter: `.foreachBatch(IdempotentSink.into(dir))`. */
  def into(dir: String): (DataFrame, Long) => Unit =
    (df, id) => { writeBatch(df, dir, id); () }

  /** Read back ONLY committed batches (orphan data dirs from crashes
    * between rename and marker are excluded). None when no batch has
    * committed yet.
    */
  def readCommitted(spark: SparkSession, dir: String): Option[DataFrame] = {
    val cd = commitsDir(dir)
    val hfs = fs(spark, cd)
    if (!hfs.exists(cd)) return None
    val ids = hfs.listStatus(cd).map(_.getPath.getName)
    // a commit marker whose batch=<id> data dir is gone (manual
    // cleanup, partial restore) means the sink is corrupted — name the
    // missing batches instead of letting spark.read.parquet fail on
    // the whole union with a path-not-found that identifies nothing
    // (r9 ADVICE). Divergence is an error, not a silent skip: a sink
    // reader that quietly drops committed batches would under-report.
    val missing = ids.filterNot(id => hfs.exists(new Path(dir, s"batch=$id")))
    require(missing.isEmpty,
      s"IdempotentSink at $dir has commit markers with no data dir " +
        s"(marker/data divergence) for batch ids: ${missing.sorted.mkString(",")}")
    if (ids.isEmpty) None
    else Some(spark.read.parquet(
      ids.map(id => new Path(dir, s"batch=$id").toString).toSeq: _*))
  }
}
