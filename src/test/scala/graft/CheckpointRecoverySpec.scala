package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.ext.Dedup

/** Fault tolerance of the stateful ingest path: the dedup state store
  * must survive a full query shutdown and restart from the checkpoint
  * — the property that makes exactly-once ingest real on a cluster
  * where executors and drivers die. Two separate query INCARNATIONS
  * share one checkpoint dir; a duplicate that arrives only in the
  * second incarnation can be dropped only if the first incarnation's
  * state was durably restored.
  */
class CheckpointRecoverySpec extends SparkSpec {

  test("streaming dedup state survives a stop/restart from checkpoint") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_ckpt_recovery")
    val (input, ckpt, out) = (s"$base/in", s"$base/ckpt", s"$base/out")
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

    def writeBatch(name: String, rows: Seq[(String, java.sql.Timestamp)]): Unit =
      rows.toDF("text", "ts").coalesce(1).write.parquet(s"$input/$name")
    def runIncarnation(): Unit = {
      val stream = spark.readStream
        .schema("text STRING, ts TIMESTAMP")
        .option("maxFilesPerTrigger", 1)
        .parquet(s"$input/*")
      val q = Dedup.streamingExactDedup(stream, md5(col("text")), "ts", "10 minutes")
        .writeStream
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    // incarnation 1: two distinct docs
    writeBatch("a", Seq(("alpha", t(0)), ("beta", t(1))))
    runIncarnation()
    // incarnation 2, same checkpoint: one dup of incarnation 1 (inside
    // the watermark horizon) + one genuinely new doc
    writeBatch("b", Seq(("beta", t(2)), ("gamma", t(3))))
    runIncarnation()

    val texts = spark.read.parquet(out).select("text")
      .collect().map(_.getString(0)).sorted.toSeq
    // "beta" exactly once: the restart restored the fingerprint state —
    // a fresh state store would have re-admitted it
    assert(texts == Seq("alpha", "beta", "gamma"), texts.toString)
  }
}
