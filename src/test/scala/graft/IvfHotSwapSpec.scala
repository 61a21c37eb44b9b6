package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ext.{IvfIndex, IvfModel, Similarity}
import graft.stream.{IvfHotSwap, IvfServer, StreamingAnn}

/** The streaming IVF maintenance loop END-TO-END (round-11 verdict
  * ask 6): sim26 gauges drift, sim27 prices the refit, and this spec
  * proves a live serving stream can CONSUME the refit at a batch
  * boundary:
  *
  *  - batch 0 serves the pinned index and equals the batch IVF path
  *    on (base corpus, pinned centroids) exactly;
  *  - the swap installs sim27-recipe warm-start refit centroids AND
  *    the drifted arrival batch in one atomic reference flip;
  *  - batch 1 serves the new index and equals the batch IVF path on
  *    (extended corpus, refit centroids) exactly — and recall vs the
  *    exact brute force holds on BOTH sides of the swap;
  *  - every emitted row carries its index version, and no batch mixes
  *    versions (the foreachBatch shape reads the server state once
  *    per batch);
  *  - the SwapReport's moved set is exactly the vectors whose cell
  *    changed — postings move ONLY for reassigned cells, which is the
  *    index-rewrite bill at scale.
  */
class IvfHotSwapSpec extends SparkSpec {

  // sf0.01: the corpus the pinned IvfModel was FIT on, and where the
  // bench recall gate (floor 0.9) is defined — at sf0.001 the model
  // serves a corpus 10× smaller than its geometry and brute-force
  // recall is hostage to that mismatch (measured 0.6/0.8 at
  // nprobe 4/8), which is a model-fit property, not the swap
  // machinery this spec gates
  private val sf = "/root/testdata/sf0.01"
  private val K = 5
  private val NProbe = 8

  private def bruteTopK(corpus: DataFrame, probes: DataFrame): Set[(Long, Long)] =
    Similarity.rankTopK(
      probes.crossJoin(corpus.select(col("vec_id"), col("embedding")))
        .filter(col("probe_id") =!= col("vec_id"))
        .select(col("probe_id"), col("vec_id"),
          round(Similarity.cosine(col("probe_vec"), col("embedding")), 6)
            .as("cos")),
      k = K)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("serving hot-swaps to the refit index at a batch boundary") {
    val spark0 = spark
    import spark0.implicits._
    val base = graft.sources.Tables.table(spark, sf, "embeddings")
      .select("vec_id", "embedding").persist()
    // the sim26 drifted-arrival recipe (shared serving-side definition)
    val dim = IvfModel.centroids.head.length
    val fresh = IvfHotSwap.driftedArrivals(base, dim)
    val extended = base.unionAll(fresh).persist()
    val refit = IvfHotSwap.refitCentroids(extended)

    val probes = base.filter(col("vec_id") < 12)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
      .as[(Long, Array[Float])].collect().toSeq
    val server = new IvfServer(base, IvfModel.centroids, NProbe)
    val buf = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Double, Int)]
    val stream = MemoryStream[(Long, Array[Float])](spark)
    val q = stream.toDF().toDF("probe_id", "probe_vec").writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val rows = server.scoreBatch(batch).collect()
        buf.synchronized {
          rows.foreach(r => buf += ((id, r.getLong(0), r.getLong(1),
            r.getDouble(2), r.getInt(3))))
        }
      }
      .start()
    val report = try {
      stream.addData(probes.take(6))
      q.processAllAvailable()
      val rep = server.swap(refit, Some(extended))
      stream.addData(probes.drop(6))
      q.processAllAvailable()
      rep
    } finally { q.stop(); server.close() }

    // --- version stamps: batch 0 all-old, batch 1 all-new, no mixing
    val byBatch = buf.groupBy(_._1).view.mapValues(_.map(_._5).toSet).toMap
    assert(byBatch(0L) == Set(0), s"batch 0 versions: ${byBatch(0L)}")
    assert(byBatch(1L) == Set(1), s"batch 1 versions: ${byBatch(1L)}")

    // --- each half equals ITS batch IVF path exactly (routing,
    // candidates, 6-dp cosines, tie-breaks)
    def served(batchId: Long): Set[(Long, Long, Double, Long)] = {
      val df = buf.filter(_._1 == batchId)
        .map(t => (t._2, t._3, t._4)).toSeq.toDF("probe_id", "vec_id", "cos")
      Similarity.rankTopK(df, k = K).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        .toSet
    }
    def batchIvf(corpus: DataFrame, cents: Seq[Array[Double]], ids: Seq[Long])
        : Set[(Long, Long, Double, Long)] =
      IvfIndex.topK(corpus,
          corpus.filter(col("vec_id").isin(ids: _*))
            .select(col("vec_id").as("probe_id"),
              col("embedding").as("probe_vec")),
          cents, k = K, nprobe = NProbe)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        .toSet
    val preIds = probes.take(6).map(_._1)
    val postIds = probes.drop(6).map(_._1)
    assert(served(0L) == batchIvf(base, IvfModel.centroids, preIds),
      "pre-swap serving diverged from the batch IVF path on the old index")
    assert(served(1L) == batchIvf(extended, refit, postIds),
      "post-swap serving diverged from the batch IVF path on the refit index")

    // --- recall vs the exact brute force holds on both sides
    def recall(ivf: Set[(Long, Long, Double, Long)],
        brute: Set[(Long, Long)]): Double =
      if (brute.isEmpty) 1.0
      else ivf.map(t => (t._1, t._2)).count(brute).toDouble / brute.size
    def probeFrame(ids: Seq[Long], corpus: DataFrame) =
      corpus.filter(col("vec_id").isin(ids: _*))
        .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
    // floor 0.75, measured headroom 0.90/1.00 (pre/post at nprobe
    // 8/16): the bench recall gate's 0.9 floor runs on the
    // clone-stress corpus where identity clones anchor the top-k;
    // this natural-corpus sample at nprobe 4 sits at 0.67 (the pinned
    // model's honest tight operating point — recall is bought with
    // nprobe, the IVF contract), so the spec serves at nprobe 8. The
    // SWAP property is the relative clause — the refit index must
    // serve no worse than the one it replaced (here it serves BETTER:
    // the drifted arrivals pull the warm-started centroids toward
    // themselves, post-swap recall 1.0)
    val rPre = recall(served(0L), bruteTopK(base, probeFrame(preIds, base)))
    val rPost = recall(served(1L), bruteTopK(extended, probeFrame(postIds, extended)))
    info(f"recall pre=$rPre%.3f post=$rPost%.3f")
    assert(rPre >= 0.75, s"pre-swap recall $rPre below 0.75")
    assert(rPost >= 0.75, s"post-swap recall $rPost below 0.75 — the refit " +
      "made serving WORSE on the drifted corpus")
    assert(rPost >= rPre - 0.1,
      s"recall fell across the swap: $rPre -> $rPost")

    // --- postings move exactly for the reassigned vectors
    val oldAssign = StreamingAnn.assignCorpus(base, IvfModel.centroids)
      .select(col("vec_id"), col("cell").cast("long").as("co"))
    val newAssign = StreamingAnn.assignCorpus(base, refit)
      .select(col("vec_id"), col("cell").cast("long").as("cn"))
    val delta = oldAssign.join(newAssign, Seq("vec_id"))
    val expectedMoved = delta.filter(col("co") =!= col("cn")).count()
    val expectedShared = delta.count()
    assert(report.nShared == expectedShared,
      s"swap report shared=${report.nShared}, expected $expectedShared")
    assert(report.nMoved == expectedMoved,
      s"swap report moved=${report.nMoved}, expected $expectedMoved")
    val expectedByCell = delta.filter(col("co") =!= col("cn"))
      .groupBy("co").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(report.movedOutByCell == expectedByCell,
      s"per-cell moved-out mismatch: ${report.movedOutByCell} vs $expectedByCell")
    // a drifted arrival batch must actually MOVE something, or the
    // test is vacuous (the sim26 gate fires on this same recipe)
    assert(report.nMoved > 0, "drift recipe moved nothing — vacuous swap")
    base.unpersist(blocking = false)
    extended.unpersist(blocking = false)
  }
}
