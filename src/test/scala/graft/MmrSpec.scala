package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.Similarity

/** sim28's MMR greedy must actually DIVERSIFY — the property that
  * separates it from a plain top-k: the picked set trades relevance
  * for coverage, so its mean pairwise similarity must come out
  * strictly below the plain top-8-by-relevance set's, while rank 1
  * (no selected set yet, score = λ·rel alone) must still be the
  * globally most relevant candidate.
  */
class MmrSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def meanPairwiseCos(ids: Seq[Long]): Double = {
    val e = graft.sources.Tables.table(spark, sf, "embeddings")
      .filter(col("vec_id").isin(ids: _*))
      .select(col("vec_id"), col("embedding"))
    val pairs = e.as("a")
      .crossJoin(broadcast(e.select(col("vec_id").as("jid"),
        col("embedding").as("jemb"))))
      .filter(col("vec_id") < col("jid"))
      .agg(avg(Similarity.cosine(col("embedding"), col("jemb"))))
    pairs.collect()(0).getDouble(0)
  }

  private lazy val mmr: Array[(Long, Long, Long, Long)] =
    SparkEntry.queries("sim28_mmr_rerank")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

  test("rank 1 is the globally most relevant candidate") {
    val rel1 = mmr.find(_._1 == 1L).get._3
    assert(mmr.forall(_._3 <= rel1),
      s"rank-1 rel6 $rel1 must dominate all picks: ${mmr.toSeq}")
  }

  test("picked set is strictly more diverse than plain top-8 by relevance") {
    val e = graft.sources.Tables.table(spark, sf, "embeddings")
    val probe = e.filter(col("vec_id") === 0L)
      .select(col("embedding").as("pv"))
    val plain = e.filter(col("vec_id") =!= 0L)
      .crossJoin(broadcast(probe))
      .select(col("vec_id"),
        round(Similarity.cosine(col("embedding"), col("pv")) * 1000000.0)
          .cast("long").as("rel6"))
      .orderBy(col("rel6").desc, col("vec_id")).limit(8)
      .collect().map(_.getLong(0)).toSeq
    val picked = mmr.map(_._2).toSeq
    assert(picked.toSet !== plain.toSet,
      "MMR degenerated to the plain top-8 — λ trade-off had no effect")
    val mMmr = meanPairwiseCos(picked)
    val mPlain = meanPairwiseCos(plain)
    assert(mMmr < mPlain,
      s"MMR mean pairwise cos $mMmr must be below plain top-8's $mPlain")
  }
}
