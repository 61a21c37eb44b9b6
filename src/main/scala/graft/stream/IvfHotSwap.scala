package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.{IvfModel, Lloyd}

/** Online IVF index maintenance — the composition the round-10 verdict
  * asked for (ask 6): sim26 GAUGES per-cell occupancy drift and sim27
  * PRICES the warm-start refit, but serving
  * ([[StreamingAnn.scoreIvf]]) held the immutable pinned model — no
  * path consumed a refit while a stream was live. [[IvfServer]] closes
  * the loop: serving goes through `foreachBatch`, which re-plans every
  * micro-batch against whatever index version the server currently
  * holds, so a [[IvfServer.swap]] between batches takes effect at
  * exactly the next batch boundary — no mixed-version batch is
  * possible (each batch reads the server state ONCE), which the
  * version stamp on every emitted row makes checkable.
  *
  * Swap semantics (the FAISS "rebuild the coarse quantizer, rewrite
  * only moved postings" deployment shape): the new centroids re-assign
  * the (possibly extended) corpus; the returned [[SwapReport]] carries
  * the reassignment delta — vectors whose cell CHANGED — because at
  * scale that delta is the index-rewrite cost: postings files for
  * unmoved vectors are byte-identical and need no IO. The old index
  * stays persisted until the new one is materialized (swap is
  * atomic-by-reference: a concurrent batch serves entirely old or
  * entirely new), then unpersists.
  *
  * 100 TB shape: `assigned` here is a persisted DataFrame; on a
  * cluster it is the bucketed postings table, `swap` is a partition
  * overwrite of exactly the moved cells, and the version stamp is the
  * manifest pointer flip. The batch-boundary atomicity argument is
  * identical.
  */
object IvfHotSwap {

  /** The reassignment delta a swap produces: `nShared` corpus vectors
    * existed under both versions; `nMoved` of them changed cell
    * (postings that must be rewritten); `movedOutByCell` splits the
    * moves by their OLD cell — the per-postings-file rewrite bill.
    */
  final case class SwapReport(version: Int, nShared: Long, nMoved: Long,
      movedOutByCell: Map[Long, Long])

  private[stream] final case class State(version: Int,
      centroids: Seq[Array[Double]], assigned: DataFrame)

  /** The sim26/sim27 drifted-arrival recipe as ONE definition for the
    * serving-side callers (IvfHotSwapSpec, the bench hot-swap pass):
    * rotate-by-one summed copies of every third vector, ids shifted
    * clear of the corpus range. sim26/sim27 keep their INLINE copies
    * deliberately — each is locked line-for-line to its DuckDB mirror
    * text, and routing them through a shared helper would let the
    * helper drift from the mirrors unnoticed; this helper cites them
    * as the oracle-gated originals instead.
    */
  def driftedArrivals(corpus: DataFrame, dim: Int,
      vecCol: String = "embedding"): DataFrame = {
    val rot = concat(slice(col(vecCol), 2, dim - 1), slice(col(vecCol), 1, 1))
    corpus.filter(col("vec_id") % 3 === 0)
      .select((col("vec_id") + 5000000L).as("vec_id"),
        zip_with(col(vecCol), rot,
          (x, y) => (x.cast("double") + lit(1.0) * y.cast("double"))
            .cast("float")).as(vecCol))
  }

  /** The sim27 warm-start refit as a serving-side helper: quantize the
    * (base ∪ arrivals) corpus, run `rounds` exact integer Lloyd
    * updates from the QUANTIZED pinned centroids, return the refit
    * centroids in the serving geometry (doubles, /Scale). Warm start
    * keeps cell identities comparable across the swap — that is what
    * makes the moved-postings delta meaningful.
    */
  def refitCentroids(corpus: DataFrame, rounds: Int = 2,
      vecCol: String = "embedding"): Seq[Array[Double]] = {
    val qdf = Lloyd.quantized(corpus.select(col("vec_id"), col(vecCol)
      .as("embedding"))).persist()
    try {
      val c0: Seq[Seq[Long]] = IvfModel.centroidStrings
        .map(_.map(cs => math.floor(cs.toDouble * Lloyd.Scale).toLong))
      val refit = (1 to rounds).foldLeft(c0)((c, _) => Lloyd.update(qdf, c))
      refit.map(_.map(_.toDouble / Lloyd.Scale).toArray)
    } finally { qdf.unpersist(blocking = false); () }
  }
}

/** Mutable serving-side index holder — see [[IvfHotSwap]]. Construct
  * with the initial corpus + centroids, hand [[scoreBatch]] to a
  * `foreachBatch` sink, call [[swap]] from the maintenance path.
  *
  * @param preAssigned an ALREADY persisted+materialized
  *        [[StreamingAnn.assignCorpus]] frame over `corpus` under
  *        `initialCentroids`, when the caller has one (the bench's
  *        main serving pass does) — skips a redundant corpus-wide
  *        assign job and a second cache-resident copy of the index.
  *        Lifecycle transfers to the server: [[swap]]/[[close]]
  *        unpersist it like any owned index version.
  */
final class IvfServer(corpus: DataFrame,
    initialCentroids: Seq[Array[Double]], nprobe: Int,
    preAssigned: Option[DataFrame] = None) {
  import IvfHotSwap._

  @volatile private var state: State = preAssigned match {
    case Some(a) => State(0, initialCentroids, a)
    case None =>
      val assigned = StreamingAnn.assignCorpus(corpus, initialCentroids).persist()
      assigned.count() // materialize before the first batch's clock
      State(0, initialCentroids, assigned)
  }

  /** The ORIGINAL corpus reference behind the current index version —
    * what a centroids-only [[swap]] re-assigns. Deriving the new index
    * from `old.assigned.drop("cell")` instead would chain its lineage
    * through the version being unpersisted: any evicted partition of
    * the new index then recomputes through the PRIOR version's plan,
    * and repeated swaps grow that chain unboundedly (the foreachBatch
    * analogue of the un-checkpointed iterative-lineage trap g17
    * measured). Updated whenever a swap ships a new corpus, so the
    * chain is always exactly one hop: source frame → current index.
    */
  private var baseCorpus: DataFrame = corpus

  def version: Int = state.version

  /** Score one micro-batch of probes against the CURRENT index. Reads
    * the server state exactly once, so a batch is all-old or all-new
    * around a concurrent swap; every row carries the index version it
    * was served from.
    */
  def scoreBatch(probes: DataFrame): DataFrame = {
    val s = state
    StreamingAnn.scoreIvf(probes, s.assigned, s.centroids, nprobe)
      .withColumn("index_version", lit(s.version))
  }

  /** Install refit centroids (and optionally an extended corpus — the
    * arrival batch that triggered the refit joins the index in the
    * same swap) at the next batch boundary. Returns the reassignment
    * delta over vectors present under both versions.
    */
  def swap(newCentroids: Seq[Array[Double]],
      newCorpus: Option[DataFrame] = None): SwapReport = {
    val old = state
    val base = newCorpus.getOrElse(baseCorpus)
    val assigned = StreamingAnn.assignCorpus(base, newCentroids).persist()
    val delta = old.assigned.select(col("vec_id"), col("cell").as("__co"))
      .join(assigned.select(col("vec_id"), col("cell").as("__cn")),
        Seq("vec_id"))
    // nlist-row grids (the sim27 spine): bounded driver materialization
    val shared = graft.ops.Grids.boundedRows(
      delta.groupBy(col("__co").cast("long").as("cell"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("__co") =!= col("__cn"), 1L).otherwise(0L))
            .as("moved")),
      IvfModel.nlist, "ivf_swap_delta")
    val nShared = shared.map(_.getLong(1)).sum
    val moved = shared.map(r => r.getLong(0) -> r.getLong(2))
      .filter(_._2 > 0).toMap
    // The delta aggregation above already materialized every partition
    // of `assigned`, and its lineage roots at baseCorpus/newCorpus (a
    // source frame), not at old.assigned — so unpersisting the old
    // version cannot strand an evicted new-index partition on a
    // recompute through retired state.
    newCorpus.foreach(c => baseCorpus = c)
    state = State(old.version + 1, newCentroids, assigned)
    old.assigned.unpersist(blocking = false)
    SwapReport(old.version + 1, nShared, moved.values.sum, moved)
  }

  /** Release the persisted index (end of serving). */
  def close(): Unit = { state.assigned.unpersist(blocking = false); () }
}
