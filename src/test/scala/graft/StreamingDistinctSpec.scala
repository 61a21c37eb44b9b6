package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.stream.StreamingDistinct

/** The streaming bitmap distinct must equal batch count(DISTINCT)
  * after every micro-batch (exactness across duplicates, batch
  * boundaries, and bucket splits), while its state stays a fixed-size
  * bitmap per (group, bucket).
  */
class StreamingDistinctSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed counts equal batch count(DISTINCT) across batches") {
    val input = MemoryStream[(String, Long)](spark)
    val out = StreamingDistinct.bucketCounts(input.toDS())
    val q = out.writeStream
      .format("memory").queryName("sd_out").outputMode("update")
      .option("checkpointLocation",
        Files.createTempDirectory("sd_ck").toString)
      .start()
    val seen = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    def check(batch: Seq[(String, Long)]): Unit = {
      input.addData(batch: _*)
      q.processAllAvailable()
      seen ++= batch
      // latest count per (group, bucket) — memory sink in update mode
      // appends every emission, so take the max (counts only grow)
      val got = spark.table("sd_out")
        .groupBy("group", "bucket").agg(max("distinct").as("d"))
        .groupBy("group").agg(sum("d").as("d"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val expect = seen.groupBy(_._1).map { case (g, xs) =>
        g -> xs.map(_._2).distinct.size.toLong
      }
      assert(got == expect, s"got $got expect $expect")
    }
    // batch 1: duplicates within the batch
    check(Seq("a" -> 1L, "a" -> 1L, "a" -> 2L, "b" -> 7L))
    // batch 2: replays of batch-1 ids must not recount; ids far apart
    // land in different buckets of the same group
    check(Seq("a" -> 1L, "a" -> 40000L, "b" -> 7L, "b" -> 8L))
    // batch 3: new group plus more cross-bucket ids
    check(Seq("c" -> 99999L, "a" -> 40001L, "a" -> 2L))
    q.stop()
  }

  test("negative id fails fast with an actionable message") {
    // before the guard, a negative id crashed inside the state
    // function with an opaque executor ArrayIndexOutOfBoundsException
    // (bits((id % 32768) >> 3) with a negative index); the require in
    // the map stage names the id and group instead
    val e = intercept[Throwable] {
      StreamingDistinct.bucketCounts(Seq("g" -> -5L).toDS()).collect()
    }
    val msgs = Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString(" | ")
    assert(msgs.contains("non-negative ids"), s"got: $msgs")
    assert(msgs.contains("-5"), s"got: $msgs")
  }

  test("ids sharing a bucket set distinct bits (no collision undercount)") {
    val input = MemoryStream[(String, Long)](spark)
    val q = StreamingDistinct.bucketCounts(input.toDS())
      .writeStream.format("memory").queryName("sd_bits")
      .outputMode("update")
      .option("checkpointLocation",
        Files.createTempDirectory("sd_ck2").toString)
      .start()
    // 0..99 all in bucket 0 — a byte/bit indexing bug would undercount
    input.addData((0L until 100L).map("g" -> _): _*)
    q.processAllAvailable()
    val last = spark.table("sd_bits")
      .groupBy("group", "bucket").agg(max("distinct").as("d"))
      .collect()
    q.stop()
    assert(last.length == 1 && last.head.getLong(2) == 100L,
      last.mkString(","))
  }
}
