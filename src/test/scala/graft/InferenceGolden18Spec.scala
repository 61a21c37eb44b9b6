package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Published-value micro-goldens, part 18 — the sim* retrieval family
  * (the gauge's largest remaining cluster). Anchors:
  *
  *  - Brute-force top-k: hand cosines (orthogonal pairs at 0, the
  *    45-degree 1/sqrt(2), colinear at 1) with the id tie-break on
  *    exact-zero ties.
  *  - Centroids: hand element-wise means through BOTH paths — sim7's
  *    posexplode and sim13's native vec_sum_ll aggregate must land on
  *    the identical hand numbers (two independent physical plans, one
  *    arithmetic).
  *  - MIPS: hand integer dots where the HIGH-NORM candidate beats the
  *    BETTER-ANGLE candidate — the exact property separating inner-
  *    product retrieval from cosine retrieval.
  *  - RRF (Cormack/Clarke/Buettcher 2009, k = 60): hand lexical and
  *    dense ranks -> rrf = 1/(60+r_lex) + 1/(60+r_dense) replayed
  *    from the published formula.
  *  - PCA power iteration: variance concentrated on ONE dimension ->
  *    the leading eigenvector is that axis exactly (loading 10^6,
  *    zeros elsewhere), including the floor-division renorm.
  *  - DBSCAN (Ester et al. 1996): a hand angle ladder — four cores
  *    within the eps-cone, one border density-reachable but not core,
  *    one noise point — the textbook core/border/noise trichotomy
  *    derived by hand from cos thresholds.
  */
@graft.Golden
class InferenceGolden18Spec extends SparkSpec {

  private def fixture(name: String, tables: (String, DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"golden18_$name").toString
    tables.foreach { case (t, df) =>
      df.coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  private def run(q: String, dir: String): Array[Row] =
    try SparkEntry.queries(q)(spark, dir).collect()
    finally {
      graft.queries.SimilarityQueries.releaseCaches()
      graft.queries.TextQueries.releaseCaches()
      graft.queries.ParityQueries.releaseCaches()
      graft.queries.DedupQueries.releaseSignatureCache()
      PlanWindows.releaseAll()
      spark.catalog.clearCache()
    }

  private def round6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def embDf(rows: Seq[(Long, Seq[Float], Int)]): DataFrame = {
    import spark.implicits._
    rows.map { case (id, v, l) => (id, v.toArray, l) }
      .toDF("vec_id", "embedding", "label")
  }

  // ===================================================================
  // 1. Brute-force cosine top-k — hand geometry
  // ===================================================================

  test("sim1_topk_bruteforce ranks hand cosines (1, 1/sqrt2, 0) with the " +
      "id tie-break on exact ties") {
    val dir = fixture("bf", "embeddings" -> embDf(Seq(
      (1L, Seq(1f, 0f), 0), (2L, Seq(0f, 1f), 0),
      (10L, Seq(2f, 0f), 0), (11L, Seq(1f, 1f), 0), (12L, Seq(0f, 3f), 0))))
    val out = run("sim1_topk_bruteforce", dir)
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("rk")) ->
        (r.getAs[Long]("vec_id"), r.getAs[Double]("cos"))).toMap
    val c45 = round6(1.0 / math.sqrt(2.0))
    // probe 1 = (1,0): 10 colinear, 11 at 45 deg, then the two
    // orthogonals tie at 0 -> id order 2 before 12
    assert(out((1L, 1L)) == ((10L, 1.0)))
    assert(out((1L, 2L)) == ((11L, c45)))
    assert(out((1L, 3L)) == ((2L, 0.0)))
    assert(out((1L, 4L)) == ((12L, 0.0)))
    // probe 2 = (0,1): mirror image
    assert(out((2L, 1L)) == ((12L, 1.0)))
    assert(out((2L, 2L)) == ((11L, c45)))
    assert(out((2L, 3L)) == ((1L, 0.0)))
    assert(out((2L, 4L)) == ((10L, 0.0)))
  }

  // ===================================================================
  // 2. Centroids — hand means via BOTH physical paths
  // ===================================================================

  test("sim7 and sim13 land on the identical hand centroid: mean((1,3)," +
      "(3,5)) = (2,4), norm sqrt(20)") {
    val rows = Seq((1L, Seq(1f, 3f), 1), (2L, Seq(3f, 5f), 1),
      (3L, Seq(5f, 12f), 2))
    val expect1 = (2L, round6(math.sqrt(20.0)), 2.0, 4.0)
    val expect2 = (2L, 13.0, 5.0, 12.0)
    val o7 = run("sim7_label_centroids", fixture("c7", "embeddings" -> embDf(rows)))
      .map(r => r.getAs[Int]("label") ->
        (r.getAs[Long]("dims"), r.getAs[Double]("centroid_norm"),
          r.getAs[Double]("c1"), r.getAs[Double]("c2"))).toMap
    assert(o7(1) == expect1 && o7(2) == expect2)
    val o13 = run("sim13_native_centroids", fixture("c13", "embeddings" -> embDf(rows)))
      .map(r => r.getAs[Int]("label") ->
        (r.getAs[Long]("dims"), r.getAs[Double]("centroid_norm"),
          r.getAs[Double]("c1"), r.getAs[Double]("c2"))).toMap
    assert(o13(1) == expect1 && o13(2) == expect2)
  }

  // ===================================================================
  // 3. MIPS — the high-norm candidate beats the better angle
  // ===================================================================

  test("sim14_mips_topk ranks by the exact integer dot: the high-norm " +
      "45-degree candidate outranks the near-colinear small one") {
    val dir = fixture("mips", "embeddings" -> embDf(Seq(
      (1L, Seq(1f, 0f), 0),          // the probe
      (20L, Seq(5f, 5f), 0),         // dot 5e6, cos only 0.707
      (21L, Seq(0.9f, 0f), 0),       // dot 900000, cos 1.0
      (22L, Seq(0.95f, -0.1f), 0)))) // dot 950000, cos ~0.994
    val out = run("sim14_mips_topk", dir)
      .map(r => (r.getAs[Long]("rk"),
        r.getAs[Long]("vec_id"), r.getAs[Long]("dot")))
    assert(out.toSeq == Seq(
      (1L, 20L, 5000000L), (2L, 22L, 950000L), (3L, 21L, 900000L)))
  }

  // ===================================================================
  // 4. RRF — the published 1/(60+rank) fusion replayed by hand
  // ===================================================================

  test("sim12_hybrid_rrf fuses hand lexical and dense ranks with the " +
      "published k=60 reciprocal-rank formula") {
    import spark.implicits._
    // lexical: docs 1,2 carry 'spark' (doc 2 tf 2 -> rank 1, doc 1
    // rank 2 — part 16's hand BM25 corpus); dense: probe vec 7 =
    // (1,0), cosines rank 2 (colinear), 1 (0.6), 3 (0), 4 (-1)
    val docs = Seq(
      (1L, "spark a b c"), (2L, "spark spark b c"),
      (3L, "d e f g"), (4L, "h i j k"))
      .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val emb = embDf(Seq(
      (7L, Seq(1f, 0f), 0), (2L, Seq(2f, 0f), 0), (1L, Seq(0.6f, 0.8f), 0),
      (3L, Seq(0f, 1f), 0), (4L, Seq(-1f, 0f), 0)))
    def rrf(rl: Option[Int], rd: Option[Int]) = round6(
      rl.map(r => 1.0 / (60 + r)).getOrElse(0.0) +
        rd.map(r => 1.0 / (60 + r)).getOrElse(0.0))
    val out = run("sim12_hybrid_rrf",
      fixture("rrf", "documents" -> docs, "embeddings" -> emb))
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("rrf")))
    assert(out.toSeq == Seq(
      (2L, rrf(Some(1), Some(1))), (1L, rrf(Some(2), Some(2))),
      (3L, rrf(None, Some(3))), (4L, rrf(None, Some(4)))))
    assert(rrf(Some(1), Some(1)) == 0.032787) // 2/61, the hand value
  }

  // ===================================================================
  // 5. PCA power iteration — one-axis variance recovers that axis
  // ===================================================================

  test("sim21_pca_power: variance concentrated on dim 0 yields loading " +
      "10^6 on dim 0 and exact zeros elsewhere") {
    // all variance on dim 0 (quantized x10000: 10000, -10000, 5000);
    // every other dim is constant 0 -> covariance has ONE nonzero
    // cell c(0,0) = floor((3*225e6 - 25e6)/9) = 72222222, and the
    // power iteration from all-ones collapses to the axis exactly
    // (the renorm divides w0 = c00*1e6 by m = c00 -> 1e6, no
    // floor loss)
    def v(x: Float) = x +: Seq.fill(63)(0f)
    val dir = fixture("pca", "embeddings" -> embDf(Seq(
      (1L, v(1f), 0), (2L, v(-1f), 0), (3L, v(0.5f), 0))))
    val out = run("sim21_pca_power", dir)
      .map(r => (r.getAs[Long]("dim"), r.getAs[Long]("loading")))
    assert(out.head == ((0L, 1000000L)))
    assert(out.tail.forall(_._2 == 0L))
    assert(out.length == 8)
  }

  // ===================================================================
  // 6. DBSCAN — the textbook core/border/noise trichotomy by hand
  // ===================================================================

  test("sim22_dbscan: an angle ladder gives 4 cores, 1 border, 1 noise " +
      "(Ester et al. eps-degree >= 3, border attached, sparse point out)") {
    // unit vectors at angles 0,5,10,15 deg: all pairwise cos >=
    // cos 15 ~ 0.966 > 0.9 -> degree >= 3, all CORE, one component
    // (min node 1). 35 deg: cos to 15 = cos 20 ~ 0.940 and to 10 =
    // cos 25 ~ 0.906 (both > 0.9) but to 5 = cos 30 ~ 0.866 < 0.9 ->
    // degree 2 -> BORDER of cluster 1. 90 deg: max cos = cos 55 ~
    // 0.574 -> NOISE. ids avoid the %10/%20 clone planting.
    def at(deg: Double) = {
      val r = math.toRadians(deg)
      Seq(math.cos(r).toFloat, math.sin(r).toFloat) ++ Seq.fill(62)(0f)
    }
    val dir = fixture("dbs", "embeddings" -> embDf(Seq(
      (1L, at(0), 0), (2L, at(5), 0), (3L, at(10), 0), (7L, at(15), 0),
      (9L, at(35), 0), (11L, at(90), 0))))
    val out = run("sim22_dbscan", dir)
      .map(r => (r.getAs[Long]("cluster"), r.getAs[Long]("n_core"),
        r.getAs[Long]("n_border"), r.getAs[Long]("n_noise")))
    assert(out.toSeq == Seq((1L, 4L, 1L, 1L)))
  }
}
