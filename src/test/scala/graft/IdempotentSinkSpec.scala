package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.sink.IdempotentSink

/** The exactly-once contract of the staged-write + commit-marker sink:
  * replays of a committed batchId are no-ops, crashes at every point
  * before the marker are repaired by the retry, and a stream whose
  * sink is invoked TWICE per batch (simulated at-least-once delivery)
  * still lands every input row exactly once.
  */
class IdempotentSinkSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("idem_sink").toString

  test("duplicate delivery of a batchId is a committed no-op") {
    val dir = tmp()
    val df = Seq(1, 2, 3).toDF("v")
    assert(IdempotentSink.writeBatch(df, dir, 0L))
    assert(!IdempotentSink.writeBatch(df, dir, 0L))
    assert(!IdempotentSink.writeBatch(Seq(9, 9, 9).toDF("v"), dir, 0L))
    val got = IdempotentSink.readCommitted(spark, dir).get
    assert(got.count() == 3)
    assert(got.agg(sum("v")).head().getLong(0) == 6L)
  }

  test("crash between rename and marker: orphan dir is invisible, retry repairs") {
    val dir = tmp()
    // simulate the crash window: data dir exists (with WRONG junk
    // rows, as a partial write would leave), marker absent
    Seq(100, 200).toDF("v").write.parquet(s"$dir/batch=5")
    assert(IdempotentSink.readCommitted(spark, dir).isEmpty,
      "orphan batch dir must not be readable before its marker exists")
    assert(IdempotentSink.writeBatch(Seq(7, 8).toDF("v"), dir, 5L))
    val got = IdempotentSink.readCommitted(spark, dir).get
    assert(got.as[Int].collect().sorted.toSeq == Seq(7, 8),
      "retry must overwrite the orphan, not append to it")
  }

  test("crash mid-staging: leftover staging dir is discarded on retry") {
    val dir = tmp()
    Seq(1).toDF("v").write.parquet(s"$dir/.staging-3")
    assert(IdempotentSink.writeBatch(Seq(42).toDF("v"), dir, 3L))
    assert(IdempotentSink.readCommitted(spark, dir).get
      .as[Int].collect().toSeq == Seq(42))
  }

  test("commit marker with missing data dir names the diverged batch") {
    val dir = tmp()
    assert(IdempotentSink.writeBatch(Seq(1, 2).toDF("v"), dir, 0L))
    assert(IdempotentSink.writeBatch(Seq(3).toDF("v"), dir, 1L))
    // simulate manual cleanup / partial restore: data gone, marker kept
    def rmr(p: java.nio.file.Path): Unit = {
      val w = java.nio.file.Files.walk(p)
      try w.sorted(java.util.Comparator.reverseOrder())
        .forEach(x => { java.nio.file.Files.deleteIfExists(x); () })
      finally w.close()
    }
    rmr(java.nio.file.Paths.get(dir, "batch=1"))
    val e = intercept[IllegalArgumentException] {
      IdempotentSink.readCommitted(spark, dir)
    }
    assert(e.getMessage.contains("batch ids: 1"),
      s"divergence error must name the batch: ${e.getMessage}")
  }

  test("stream with double-invoked sink lands every row exactly once") {
    val dir = tmp()
    val input = MemoryStream[Int](spark)
    val q = input.toDF().writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        // at-least-once delivery, simulated at its worst: the sink
        // body runs twice for every batch
        IdempotentSink.writeBatch(df, dir, id)
        IdempotentSink.writeBatch(df, dir, id)
        ()
      }
      .option("checkpointLocation", tmp())
      .start()
    try {
      input.addData(1 to 10: _*)
      q.processAllAvailable()
      input.addData(11 to 15: _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = IdempotentSink.readCommitted(spark, dir).get
    assert(got.count() == 15)
    assert(got.agg(sum("value")).head().getLong(0) == (1 to 15).sum.toLong)
  }
}
