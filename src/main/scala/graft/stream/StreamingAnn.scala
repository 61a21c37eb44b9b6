package graft.stream

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{IvfIndex, IvfPq, Lloyd, Pq, Similarity}

/** Streaming ANN serving — the ONLINE half of the vector story
  * (round-7 verdict ask 5): score an unbounded stream of probe
  * embeddings against the pinned IVF index with ZERO streaming state.
  *
  * Shape (the E95 stream-static pattern applied to vectors):
  *
  *  - the static corpus carries its cell assignment (computed once by
  *    [[assignCorpus]] and persisted by the caller — the
  *    executor-resident index of a real deployment; at billion-vector
  *    scale this is the partitioned/bucketed side);
  *  - each probe row routes MAP-SIDE to its `nprobe` nearest cells
  *    via the centroid plan literals (pure Column arithmetic, no
  *    shuffle of the stream side beyond the join);
  *  - candidates come from a stream-static equi join on the cell id —
  *    supported, stateless, no watermark needed (no StateStore node
  *    in the plan, which StreamingAnnSpec asserts via
  *    `stateOperators.isEmpty`);
  *  - exact cosine re-ranks ride per-row (native codegen'd dots).
  *
  * The operator emits SCORED CANDIDATES (probe_id, vec_id, cos) —
  * per-probe bounded by nprobe-cell occupancy — rather than the final
  * top-k row set: window functions and arbitrary aggregations are
  * unsupported-or-stateful on streams, so the k-cut belongs to the
  * consumer (a `foreachBatch` ranker, or the downstream store's own
  * top-k read). [[graft.ext.Similarity.rankTopK]] over any collected
  * micro-batch reproduces the batch sim5 output EXACTLY — identical
  * routing, identical candidate set, identical 6-dp cosine — which is
  * the spec's equality gate.
  */
object StreamingAnn {

  /** One-time static-side preparation: cell assignment for every
    * corpus vector. Persist the result before serving — stream-static
    * joins re-evaluate the static side every micro-batch otherwise.
    */
  def assignCorpus(corpus: DataFrame, centroids: Seq[Array[Double]],
      vecCol: String = "embedding"): DataFrame =
    corpus.withColumn("cell", IvfIndex.assign(col(vecCol), centroids))

  /** Stateless streaming scorer over a pre-assigned corpus (must
    * carry the `cell` column from [[assignCorpus]]).
    */
  def scoreIvf(probes: DataFrame, assignedCorpus: DataFrame,
      centroids: Seq[Array[Double]], nprobe: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      probeIdCol: String = "probe_id",
      probeVecCol: String = "probe_vec"): DataFrame = {
    val probed = probes.withColumn("cell",
      explode(IvfIndex.probeCells(col(probeVecCol), centroids, nprobe)))
    probed.join(assignedCorpus, Seq("cell"))
      .filter(col(probeIdCol) =!= col(idCol))
      .select(col(probeIdCol), col(idCol),
        round(Similarity.cosine(col(probeVecCol), col(vecCol)), 6).as("cos"))
  }

  /** Static-side preparation for IVFADC serving: each corpus vector's
    * coarse cell plus its M PQ codes pivoted into ONE array column —
    * the 32×-compressed executor-resident index (codes replace
    * floats), built once in batch and persisted by the caller.
    */
  def encodePqCorpus(qdf: DataFrame, coarse: Seq[Seq[Long]],
      codebooks: Seq[Seq[Seq[Long]]], subDim: Int): DataFrame = {
    val cells = qdf.select(col("vec_id"),
      Lloyd.assignCell(col("qv"), coarse).as("cell"))
    val codes = Pq.encode(qdf, codebooks, subDim)
      .groupBy("vec_id")
      .agg(transform(array_sort(collect_list(struct(col("m"), col("code")))),
        s => s.getField("code")).as("codes"))
    cells.join(codes, Seq("vec_id"))
  }

  /** The PQ codebook flattened to ONE static row — an
    * `array<long>` of M·K·subDim values in (m, j, dim) order. Kept as
    * DATA, not plan literals: 8×256×8 = 16 384 literals in every
    * micro-batch plan is the measured 100k-literal planning trap's
    * little sibling (Pq.scala scaladoc), and a 256-entry literal
    * collection already tripped the JVM's 64 KB <clinit> limit once
    * (PqModel scaladoc). A 1-row static frame joins in constant time
    * and keeps the plan size flat.
    */
  def flatCodebook(spark: SparkSession,
      codebooks: Seq[Seq[Seq[Long]]]): DataFrame = {
    import spark.implicits._
    Seq(codebooks.flatten.flatten.toArray).toDF("__fc")
      .withColumn("__one", lit(1))
  }

  /** Stateless streaming IVFADC scorer — the FAISS IndexIVFPQ serving
    * architecture as a stream: each probe row builds its M·K ADC
    * lookup table PER ROW (a `transform` over the flat codebook — the
    * once-per-probe work ADC exists for), routes to its nprobe coarse
    * cells map-side, meets the code index on the cell key
    * (stream-static, stateless), and scores each candidate with a
    * per-row `aggregate` over its M codes — NO aggregation node, so
    * the whole ADC sum lives inside the stream plan without state.
    * Emits (probe_id, vec_id, adc_dist); ranking any collected batch
    * with (adc_dist, vec_id) ascending reproduces the batch
    * IvfPq.topK output exactly (same integers end to end).
    */
  def scoreIvfPq(probes: DataFrame, encodedCorpus: DataFrame,
      fc: DataFrame, coarse: Seq[Seq[Long]], numSubspaces: Int,
      codebookSize: Int, subDim: Int, nprobe: Int): DataFrame = {
    val m = numSubspaces; val k = codebookSize
    val lut = transform(sequence(lit(0), lit(m * k - 1)), i =>
      call_function("vec_l2sq_ll",
        slice(col("probe_qv"),
          call_function("div", i, lit(k)) * subDim + 1, lit(subDim)),
        slice(col("__fc"), i * subDim + 1, lit(subDim))))
    val probed = probes.withColumn("__one", lit(1))
      .join(fc, Seq("__one"))
      .withColumn("__lut", lut)
      .withColumn("cell",
        explode(IvfPq.probeCells(col("probe_qv"), coarse, nprobe)))
      .select("probe_id", "cell", "__lut")
    probed.join(encodedCorpus, Seq("cell"))
      .filter(col("probe_id") =!= col("vec_id"))
      .select(col("probe_id"), col("vec_id"),
        aggregate(sequence(lit(0), lit(m - 1)), lit(0L), (acc, mi) =>
          acc + element_at(col("__lut"),
            (mi * k + element_at(col("codes"), mi + 1) + 1).cast("int")))
          .as("adc_dist"))
  }
}
