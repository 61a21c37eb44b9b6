package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ext.{IvfIndex, IvfModel, IvfPq, IvfPqModel, Lloyd, PqModel, Similarity}
import graft.stream.StreamingAnn

/** Streaming ANN serving contract: the stream-static scorer must be
  * (a) stateless — no StateStore operator in the running query — and
  * (b) EXACTLY the batch IVF path on the same rows: ranking the
  * collected candidate stream reproduces sim5's
  * `IvfIndex.topK` output bit-for-bit (same routing, same candidate
  * set, same 6-dp cosines, same tie-breaks).
  */
class StreamingAnnSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("stream-static IVF serving is stateless and equals the batch path") {
    val spark0 = spark
    import spark0.implicits._
    val emb = graft.sources.Tables.table(spark, sf, "embeddings")
    val assigned = StreamingAnn
      .assignCorpus(emb, IvfModel.centroids).persist()
    val probeRows = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
      .as[(Long, Array[Float])].collect().toSeq

    val stream = MemoryStream[(Long, Array[Float])](spark)
    val flow = StreamingAnn.scoreIvf(
      stream.toDF().toDF("probe_id", "probe_vec"), assigned,
      IvfModel.centroids, nprobe = 4)
    val q = flow.writeStream
      .format("memory").queryName("ann_serving")
      .outputMode("append").start()
    try {
      // two micro-batches — the second proves batch N behaves like
      // batch 1 with no state carried between them
      stream.addData(probeRows.take(2))
      q.processAllAvailable()
      stream.addData(probeRows.drop(2))
      q.processAllAvailable()

      assert(q.lastProgress.stateOperators.isEmpty,
        "streaming ANN serving grew a StateStore operator — " +
          "the stream-static shape is supposed to be stateless")

      val streamed = Similarity.rankTopK(spark.table("ann_serving"), k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getLong(3))).toSet
      val batch = IvfIndex.topK(emb,
          emb.filter(col("vec_id") < 5)
            .select(col("vec_id").as("probe_id"),
              col("embedding").as("probe_vec")),
          IvfModel.centroids, k = 5, nprobe = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getLong(3))).toSet
      assert(streamed == batch,
        s"streamed top-k diverged from batch sim5 path: " +
          s"only-stream=${(streamed -- batch).take(3)} " +
          s"only-batch=${(batch -- streamed).take(3)}")
    } finally {
      q.stop()
      assigned.unpersist(blocking = false)
    }
  }

  test("stream-static IVFADC serving is stateless and equals batch IvfPq.topK") {
    val spark0 = spark
    import spark0.implicits._
    val qdf = Lloyd.quantized(
      graft.sources.Tables.table(spark, sf, "embeddings"))
    val encoded = StreamingAnn.encodePqCorpus(qdf, IvfPqModel.coarse,
      PqModel.codebooks, PqModel.subDim).persist()
    val fc = StreamingAnn.flatCodebook(spark, PqModel.codebooks).persist()
    val probeRows = qdf.filter(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("qv").as("probe_qv"))
      .as[(Long, Array[Long])].collect().toSeq

    val stream = MemoryStream[(Long, Array[Long])](spark)
    val flow = StreamingAnn.scoreIvfPq(
      stream.toDF().toDF("probe_id", "probe_qv"), encoded, fc,
      IvfPqModel.coarse, PqModel.numSubspaces, PqModel.codebookSize,
      PqModel.subDim, nprobe = 3)
    val q = flow.writeStream
      .format("memory").queryName("ivfpq_serving")
      .outputMode("append").start()
    try {
      stream.addData(probeRows.take(2))
      q.processAllAvailable()
      stream.addData(probeRows.drop(2))
      q.processAllAvailable()

      assert(q.lastProgress.stateOperators.isEmpty,
        "IVFADC serving grew a StateStore operator")

      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("probe_id")
        .orderBy(col("adc_dist"), col("vec_id"))
      val streamed = spark.table("ivfpq_serving")
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      val batch = IvfPq.topK(qdf,
          qdf.filter(col("vec_id") < 5)
            .select(col("vec_id").as("probe_id"), col("qv").as("probe_qv")),
          IvfPqModel.coarse, PqModel.codebooks, PqModel.subDim,
          k = 5, nprobe = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      assert(streamed == batch,
        s"streamed IVFADC diverged from batch: " +
          s"only-stream=${(streamed -- batch).take(3)} " +
          s"only-batch=${(batch -- streamed).take(3)}")
    } finally {
      q.stop()
      encoded.unpersist(blocking = false)
      fc.unpersist(blocking = false)
    }
  }
}
