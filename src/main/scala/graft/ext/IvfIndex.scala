package graft.ext

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) ANN index — the clustering-based alternative to
  * [[Similarity]]'s hyperplane LSH.
  *
  * Shape: learn `nlist` centroids (seeded k-means over the corpus —
  * the model is nlist×dim doubles, trivially driver/plan-resident at
  * any corpus scale), assign every vector to its nearest centroid
  * (one map-side pass; the assignment column is what a real deployment
  * would persist/partition by), then answer probes by scanning only
  * the `nprobe` nearest cells — compare-within-cell, the same
  * sub-quadratic discipline as LSH bucketing, but with data-adaptive
  * cells (k-means follows the corpus distribution where random
  * hyperplanes cannot).
  *
  * Assignment/probing are pure Column arithmetic over centroid plan
  * literals (argmin via struct-ordered `array_min`); only `fit` runs
  * an iterative job.
  */
object IvfIndex {

  /** Learn `nlist` centroids with seeded k-means (MLlib). */
  def fit(corpus: DataFrame, vecCol: String, nlist: Int, seed: Long = 42L,
      maxIter: Int = 10): Seq[Array[Double]] = {
    val km = new KMeans()
      .setK(nlist).setSeed(seed).setMaxIter(maxIter)
      .setFeaturesCol("__features")
    val model = km.fit(corpus.select(array_to_vector(col(vecCol)).as("__features")))
    model.clusterCenters.map(_.toArray).toSeq
  }

  /** (dist², cell) entries for every centroid; dist² = |v|² − 2·v·c + |c|²
    * (|v|² is rank-invariant but kept so distances are true squared L2).
    */
  private def cellEntries(vec: Column, centroids: Seq[Array[Double]]): Seq[Column] = {
    // both dots native codegen'd: vec_dot_f for |v|², vec_dot_fd for
    // the centroid-literal projections (round-2 verdict item 5 — the
    // HOF fallback ran nlist interpreted 64-element dots per row here)
    val vNorm2 = Similarity.dot(vec, vec)
    centroids.zipWithIndex.map { case (c, i) =>
      val dist2 = vNorm2 - lit(2.0) * Similarity.dotLit(vec, c) + lit(c.map(x => x * x).sum)
      struct(dist2.as("dist"), lit(i).as("cell"))
    }
  }

  /** Nearest-centroid cell id (struct ordering makes `array_min` an
    * argmin with a deterministic cell-id tie-break).
    */
  def assign(vec: Column, centroids: Seq[Array[Double]]): Column =
    array_min(array(cellEntries(vec, centroids): _*)).getField("cell")

  /** The `nprobe` nearest cell ids for a probe vector. */
  def probeCells(vec: Column, centroids: Seq[Array[Double]], nprobe: Int): Column =
    slice(
      transform(array_sort(array(cellEntries(vec, centroids): _*)),
        e => e.getField("cell")),
      1, nprobe)

  /** IVF top-k: probes fan out to their `nprobe` cells, candidates are
    * the corpus vectors in those cells (shuffle/join on the cell id),
    * exact cosine re-ranks. Identical output contract to
    * [[Similarity.bruteForceTopK]] modulo ANN recall.
    */
  def topK(corpus: DataFrame, probes: DataFrame, centroids: Seq[Array[Double]],
      k: Int, nprobe: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      probeIdCol: String = "probe_id", probeVecCol: String = "probe_vec"): DataFrame = {
    val assigned = corpus.withColumn("cell", assign(col(vecCol), centroids))
    val probed = probes
      .withColumn("cell", explode(probeCells(col(probeVecCol), centroids, nprobe)))
    val scored = probed.join(assigned, Seq("cell"))
      .filter(col(probeIdCol) =!= col(idCol))
      .withColumn("cos", round(Similarity.cosine(col(probeVecCol), col(vecCol)), 6))
    Similarity.rankTopK(scored, k, probeIdCol, idCol)
  }

  /** DuckDB mirror over the PINNED model ([[IvfModel]]) — the
    * [[Similarity.Sql]] plane trick applied to a fitted artifact, which
    * is what promotes `sim5_ivf_topk` from rows-only to hash-verified:
    * both engines parse the same shortest-round-trip centroid strings,
    * and the distance expression repeats [[cellEntries]]' exact op
    * order (`|v|² − 2.0·(v·c) + |c|²`, left-to-right dots), so every
    * assignment and probe decision matches bit-for-bit.
    */
  object Sql {
    /** `[d_0, …, d_{nlist−1}]`: squared distance of `vecExpr` (a
      * DOUBLE[] SQL expression) to every pinned centroid.
      */
    def distListSql(vecExpr: String): String =
      IvfModel.centroidStrings.map { cs =>
        val arr = cs.mkString("[", ",", "]")
        // same fold as cellEntries' lit(c.map(x => x*x).sum)
        val sumsq = cs.map(_.toDouble).map(x => x * x).sum
        s"(list_dot_product($vecExpr, $vecExpr) - " +
          s"2.0*list_dot_product($vecExpr, $arr::DOUBLE[]) + $sumsq)"
      }.mkString("[", ", ", "]")
  }
}
