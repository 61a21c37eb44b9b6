package graft.stream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ext.{IvfIndex, Similarity}

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
}
