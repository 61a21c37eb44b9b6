package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.stream.PrioritySample
import graft.stream.PrioritySample.{DocArrival, SampleUpdate}

/** Streaming priority sampler ≡ the oracle-gated batch queries
  * (round-12 verdict ask 6): est_weighted_sample's 32 rows and
  * est_priority_ht's estimate must come out of the bounded-state
  * streaming reservoir EXACTLY — equality, not tolerance — because
  * the priority key is a pure per-row function (Weyl mix + one IEEE
  * division) and the sample of a prefix is just its k smallest keys.
  * The batch queries are hash-gated against DuckDB tri-SF, so this
  * equivalence transitively oracle-gates the streaming twin.
  */
class PrioritySampleSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private val K = 32
  private val Shards = 4

  private def ts0 = Timestamp.valueOf("2024-01-01 10:00:00")

  /** The corpus as arrivals, with w computed by the SAME Spark
    * expression as the batch query (split on single space, counting
    * empties — whatever its semantics, both sides share them).
    */
  private def arrivals(): Seq[DocArrival] =
    graft.sources.Tables.table(spark, sf, "documents")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("w"))
      .collect()
      .map(r => DocArrival(r.getLong(0), ts0, r.getLong(1))).toSeq

  private def runStream(batches: Seq[Seq[DocArrival]],
      name: String): Seq[SampleUpdate] = {
    val input = MemoryStream[DocArrival](spark)
    val query = PrioritySample.sample(input.toDS(), K, Shards)
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    batches.foreach { b => input.addData(b); query.processAllAvailable() }
    query.stop()
    val all = spark.table(name).as[SampleUpdate].collect().toSeq
    // bounded state: every emission is a reservoir of ≤ k+1 rows
    all.groupBy(u => (u.shard, u.shard_processed)).foreach { case (_, xs) =>
      assert(xs.length <= K + 1,
        s"shard reservoir exceeded k+1: ${xs.length}")
    }
    PrioritySample.latestPerShard(all)
  }

  test("streamed corpus reproduces the batch est_weighted_sample rows exactly") {
    val docs = arrivals()
    // three uneven batches, interleaved by a hash unrelated to the
    // shard key or the priority key — arrival order must not matter
    val batches = Seq(
      docs.filter(_.doc_id % 7 < 3),
      docs.filter(d => d.doc_id % 7 >= 3 && d.doc_id % 7 < 5),
      docs.filter(_.doc_id % 7 >= 5))
    assert(batches.map(_.size).forall(_ > 0))
    val fin = runStream(batches, "prio_sample_a")
    val streamed = PrioritySample.mergeSample(fin, K)
      .map(e => (e.doc_id, e.w, e.key))

    val batch = SparkEntry.queries("est_weighted_sample")(spark, sf)
      .collect().map(r =>
        (r.getAs[Long]("doc_id"), r.getAs[Long]("w"), r.getAs[Double]("key")))
      .toSeq
    assert(streamed == batch) // bit-exact: same key, same tie-break

    // resumability/order-independence: a different batching (single
    // batch, reversed order) lands on the identical sample
    val fin2 = runStream(Seq(docs.reverse), "prio_sample_b")
    assert(PrioritySample.mergeSample(fin2, K)
      .map(e => (e.doc_id, e.w, e.key)) == batch)
  }

  test("streamed reservoirs reproduce the batch est_priority_ht estimate exactly") {
    val docs = arrivals()
    val fin = runStream(Seq(
      docs.take(docs.length / 2), docs.drop(docs.length / 2)), "prio_ht")
    val (nSample, trueTokens, est2) = PrioritySample.htTotal(fin, K)

    val b = SparkEntry.queries("est_priority_ht")(spark, sf).collect().head
    assert(nSample == b.getAs[Long]("n_sample"))
    assert(trueTokens == b.getAs[Long]("true_tokens"))
    assert(est2 == b.getAs[Long]("est2"))
  }

  test("n <= k corpus: tau collapses to 0 and the estimate is the exact total (batch guard parity)") {
    val tiny = (1 to 5).map(i => DocArrival(i.toLong, ts0, 10L * i))
    val fin = runStream(Seq(tiny), "prio_tiny")
    val (nSample, trueTokens, est2) = PrioritySample.htTotal(fin, K)
    assert(nSample == 5L)
    assert(trueTokens == 150L)
    assert(est2 == 15000L) // Σ max(w, 0)·100 = exact Σw·100
    // w ≤ 0 rows are ignored, like the batch w > 0 filter
    val withJunk = tiny :+ DocArrival(99L, ts0, 0L)
    val fin2 = runStream(Seq(withJunk), "prio_tiny_junk")
    assert(PrioritySample.htTotal(fin2, K) == ((5L, 150L, 15000L)))
  }
}
