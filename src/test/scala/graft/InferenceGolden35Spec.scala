package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Published-value micro-goldens, part 35 — the remaining inference /
  * diff / cell-restricted similarity tail. Anchors:
  *
  *  - a60 (Fisher randomization / permutation test): the whole chain
  *    replayed independently in plain Scala (pinned hash
  *    reassignments, per-perm mean gaps, p = (1+#{T_k ≥ T_obs})/20),
  *    plus the identical-distribution end where EVERY permutation
  *    ties and p = 1 exactly.
  *  - a12b (t-digest quantile path): hand linear-interpolation
  *    quantiles on 1..5 (2/3/4) and 1..4 (1.75/2.5/3.25); the sketch
  *    bound must hold trivially where the sketch is exact.
  *  - diff_merkle_buckets (Merkle locality): change/remove/add land
  *    in EXACTLY their id's bucket; untouched buckets are silent.
  *  - dedup_semantic_cells: per-cell pair/drop accounting folded by
  *    hand over exact 1.0/0.0 cosines (identical vs orthogonal
  *    groups), cells taken from the same pinned assignment the
  *    hash-verified sim5 geometry pins.
  *  - sim8 (hard-negative band): Pythagorean-triple cosines pin the
  *    band edges — 0.28 in, 0.96 out (too close), 0.0 out (too far),
  *    and the 0.6 upper edge excluded by STRICT inequality.
  *  - sim18_mutual_nn: mutuality by hand — the tight pair is
  *    emitted once (a < b), the third vector whose top-1 is not
  *    reciprocated is excluded.
  *  - sim19 (Lowe ratio): the duplicated-content twin makes the hub
  *    AMBIGUOUS ((1-c1) > 0.8(1-c2) at c1 = c2 = 0.96) while the
  *    three unambiguous vectors pass — hand cosine ladder from
  *    scaled 3-4-5 / 7-24-25 triples.
  *  - tx18 (curriculum ntile): the all-tie source pins the
  *    equal-fill remainder rule (5 docs -> bins 2/1/1/1 by doc_id).
  */
@graft.Golden
class InferenceGolden35Spec extends SparkSpec {

  private def fixture(name: String, tables: (String, DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"golden35_$name").toString
    tables.foreach { case (t, df) =>
      df.coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  private def docsDf(docs: Seq[(Long, String, String)]): DataFrame = {
    import spark.implicits._
    docs.toDF("doc_id", "text", "source")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        col("source"), length(col("text")).cast("long").as("n_chars"))
  }

  private def run(q: String, dir: String): Array[Row] =
    try SparkEntry.queries(q)(spark, dir).collect()
    finally {
      graft.queries.ParityQueries.releaseCaches()
      graft.queries.TextQueries.releaseCaches()
      graft.queries.SimilarityQueries.releaseCaches()
      spark.catalog.clearCache()
    }

  private def r6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  // ===================================================================
  // a60: independent randomization-test replay
  // ===================================================================

  /** (t_obs/100 rounded, n_ge, p_emp) replayed from (ok, grp, cents). */
  private def permReplay(rows: Seq[(Long, Long, Long)]): (Double, Long, Double) = {
    def gap(grpOf: Long => Long): Double = {
      val a = rows.filter(t => grpOf(t._1) == 1L)
      val b = rows.filter(t => grpOf(t._1) == 0L)
      require(a.nonEmpty && b.nonEmpty, "degenerate permutation in fixture")
      math.abs(a.map(_._3).sum.toDouble / a.size.toDouble
        - b.map(_._3).sum.toDouble / b.size.toDouble)
    }
    val byOk = rows.map(t => t._1 -> t._2).toMap
    val tObs = gap(ok => byOk(ok))
    val na = rows.count(_._2 == 1L).toLong
    val nb = rows.count(_._2 == 0L).toLong
    val nGe = (1L to 19L).count { k =>
      gap(ok => if ((ok * 2654435761L + k * 40503L) % 1000000007L
        % (na + nb) < na) 1L else 0L) >= tObs
    }.toLong
    (r6(tObs / 100.0), nGe, r6((1.0 + nGe) / 20.0))
  }

  private def permFixture(rows: Seq[(Long, Long, Long)]): String = {
    import spark.implicits._
    val cust = Seq((1L, "BUILDING"), (2L, "MACHINERY"))
      .toDF("c_custkey", "c_mktsegment")
    val ords = rows.map { case (ok, grp, v) =>
      (ok, if (grp == 1L) 1L else 2L, v.toDouble / 100.0)
    }.toDF("o_orderkey", "o_custkey", "o_totalprice")
    fixture(s"perm${rows.hashCode.abs}", "customer" -> cust, "orders" -> ords)
  }

  test("a60_permutation_test == the independent plain-Scala replay on a " +
      "separated fixture") {
    val rows: Seq[(Long, Long, Long)] =
      (1L to 8L).map(ok => (ok, 1L, 90000L)) ++
        (9L to 16L).map(ok => (ok, 0L, 10000L))
    val out = run("a60_permutation_test", permFixture(rows))
    assert(out.length == 1)
    val r = out.head
    val (tObs, nGe, pEmp) = permReplay(rows)
    assert(r.getAs[Double]("t_obs") == tObs)
    assert(r.getAs[Long]("n_ge") == nGe)
    assert(r.getAs[Double]("p_emp") == pEmp)
  }

  test("a60_permutation_test identical distributions: every permutation " +
      "ties T_obs = 0, so p = 1 exactly") {
    val rows: Seq[(Long, Long, Long)] =
      (1L to 8L).map(ok => (ok, 1L, 50000L)) ++
        (9L to 16L).map(ok => (ok, 0L, 50000L))
    val r = run("a60_permutation_test", permFixture(rows)).head
    assert(r.getAs[Double]("t_obs") == 0.0)
    assert(r.getAs[Long]("n_ge") == 19L)
    assert(r.getAs[Double]("p_emp") == 1.0)
  }

  // ===================================================================
  // a12b: hand interpolated quantiles
  // ===================================================================

  test("a12b_tdigest_quantiles: hand type-7 quantiles (1..5 -> 2/3/4; " +
      "1..9 -> 3/5/7) with the sketch bound holding where the exact " +
      "quantile IS a data point (t-digest answers are data values)") {
    import spark.implicits._
    // counts chosen so 0.25/0.5/0.75 land ON data points: the sketch
    // returns data values at tiny n, so a non-data-point exact
    // quantile (e.g. 1.75 on 1..4) legitimately sits outside the
    // +-0.01 rank band — that would test the fixture, not the sketch
    val li = ((1 to 5).map(q => ("A", q.toDouble)) ++
      (1 to 9).map(q => ("R", q.toDouble)))
      .toDF("l_returnflag", "l_quantity")
    val out = run("a12b_tdigest_quantiles", fixture("tdg", "lineitem" -> li))
      .map(r => r.getAs[String]("l_returnflag") ->
        (r.getAs[Double]("p25"), r.getAs[Double]("p50"),
          r.getAs[Double]("p75"), r.getAs[Boolean]("within_bound"))).toMap
    assert(out == Map(
      "A" -> ((2.0, 3.0, 4.0, true)),
      "R" -> ((3.0, 5.0, 7.0, true))))
  }

  // ===================================================================
  // diff_merkle_buckets: Merkle locality by hand
  // ===================================================================

  test("diff_merkle_buckets: a change, a removal, and an addition land " +
      "in exactly their buckets; untouched buckets are silent") {
    // ids 1,2,3 untouched; 97 changed (%97); 89 removed (%89);
    // 93 re-ingested as 900093 (%93) — buckets id % 64:
    //   89 -> 25 (old only), 97 -> 33 (both, hash differs),
    //   900093 -> 61 (new only); 93's own bucket 29 stays silent
    val docs = Seq(1L, 2L, 3L, 89L, 93L, 97L)
      .map(id => (id, s"document body $id", "web"))
    val out = run("diff_merkle_buckets",
        fixture("merkle", "documents" -> docsDf(docs)))
      .map(r => r.getAs[Long]("bucket") ->
        (r.getAs[Long]("n_old"), r.getAs[Long]("n_new"))).toMap
    assert(out == Map(25L -> ((1L, 0L)), 33L -> ((1L, 1L)), 61L -> ((0L, 1L))))
  }

  // ===================================================================
  // the cell-restricted similarity family (shared fixture machinery)
  // ===================================================================

  /** 64-dim vector with the first two coordinates set (exact floats). */
  private def v2(x: Float, y: Float): Array[Float] = {
    val a = Array.fill(64)(0.0f)
    a(0) = x; a(1) = y
    a
  }

  private def embFixture(name: String, vecs: Seq[(Long, Array[Float])]): String = {
    import spark.implicits._
    fixture(name, "embeddings" ->
      vecs.map { case (id, a) => (id, a, (id % 4).toInt) }
        .toDF("vec_id", "embedding", "label"))
  }

  /** Cell of each vector under the pinned model — computed with the
    * SAME assignment primitive the hash-verified sim5 geometry pins
    * (the anchor here is the analytic layer above the assignment).
    */
  private def cellsOf(vecs: Seq[(Long, Array[Float])]): Map[Long, Int] = {
    import spark.implicits._
    vecs.map { case (id, a) => (id, a) }.toDF("vec_id", "embedding")
      .select(col("vec_id"),
        graft.ext.IvfIndex.assign(col("embedding"),
          graft.ext.IvfModel.centroids).as("cell"))
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cell")).toMap
  }

  test("dedup_semantic_cells: hand pair/drop accounting over exact " +
      "1.0/0.0 cosines (identical quadruple + orthogonal pair)") {
    // group A: ids 0-3 identical (cos 1.0 pairwise); group B: ids
    // 10-11 identical, orthogonal to A (cos 0.0 < 0.45 across groups)
    val vecs = (0L to 3L).map(id => id -> v2(1000f, 0f)) ++
      Seq(10L, 11L).map(id => id -> v2(0f, 1000f))
    val cells = cellsOf(vecs)
    val out = run("dedup_semantic_cells", embFixture("cells", vecs))
      .map(r => r.getAs[Int]("cell") ->
        (r.getAs[Long]("n_vecs"), r.getAs[Long]("n_dup_pairs"),
          r.getAs[Long]("n_dropped"))).toMap
    // expected per-cell fold: within-group pairs all >= 0.45 (cos 1),
    // cross-group pairs 0.0 never count even when co-celled
    val expected = vecs.groupBy { case (id, _) => cells(id) }
      .map { case (cell, members) =>
        val ids = members.map(_._1)
        val groupOf = (id: Long) => if (id < 4L) "A" else "B"
        val pairs = for {
          a <- ids; b <- ids if a < b && groupOf(a) == groupOf(b)
        } yield (a, b)
        cell -> ((ids.size.toLong, pairs.size.toLong,
          pairs.map(_._2).distinct.size.toLong))
      }
    assert(out == expected)
    assert(out.values.map(_._2).sum == 7L) // C(4,2) + C(2,2) regardless of cells
  }

  test("sim8_hard_negatives: Pythagorean band edges - 0.28 in, 0.96 " +
      "out (too close), 0.0 out (too far), 0.6 upper edge STRICTLY out") {
    val vecs = Seq(
      0L -> v2(1000f, 0f),    // the probe (vec_id < 5)
      10L -> v2(280f, 960f),  // cos 0.28  -> the hard negative
      11L -> v2(600f, 800f),  // cos 0.60  -> excluded (< 0.6 strict)
      12L -> v2(960f, 280f),  // cos 0.96  -> excluded (too close)
      13L -> v2(0f, 1000f))   // cos 0.00  -> excluded (too far)
    val out = run("sim8_hard_negatives", embFixture("hardneg", vecs))
    assert(out.length == 1)
    val r = out.head
    assert((r.getAs[Long]("probe_id"), r.getAs[Long]("vec_id"),
      r.getAs[Double]("cos"), r.getAs[Long]("rk")) == ((0L, 10L, 0.28, 1L)))
  }

  test("sim18_mutual_nn: only the reciprocated pair is emitted, once, " +
      "as (a < b); the third vector's unreciprocated top-1 is dropped") {
    val vecs = Seq(
      1L -> v2(1000f, 0f),
      2L -> v2(1000f, 1f),    // 1's and 2's mutual nearest
      3L -> v2(1000f, 100f))  // nearest to 2, but 2's top-1 is 1
    assume(cellsOf(vecs).values.toSet.size == 1,
      "fixture must co-cell under the pinned model")
    val out = run("sim18_mutual_nn", embFixture("mnn", vecs))
    assert(out.length == 1)
    assert((out.head.getAs[Long]("a"), out.head.getAs[Long]("b")) == ((1L, 2L)))
    assert(out.head.getAs[Double]("cos") > 0.999)
  }

  test("sim19_ratio_test: the duplicated-content twins make the hub " +
      "ambiguous (c1 = c2); unambiguous neighbors pass — verified " +
      "against the imperative per-cell replay") {
    // hub (1000,0) with symmetric near-twins (1000,±50): the hub's
    // top-2 cosines are EQUAL, so (1-c1) <= 0.8(1-c2) fails for it
    // and holds for the twins; (1000,100) is a plain confident member
    val vecs = Seq(
      0L -> v2(1000f, 0f),
      1L -> v2(1000f, 50f),
      5L -> v2(1000f, -50f),
      2L -> v2(1000f, 100f))
    val cells = cellsOf(vecs)
    val out = run("sim19_ratio_test", embFixture("ratio", vecs))
      .map(r => r.getAs[Int]("cell") ->
        (r.getAs[Long]("n_vectors"), r.getAs[Long]("n_confident"))).toMap
    // imperative replay: per cell, per vector with >= 2 co-celled
    // neighbors, c1/c2 by (rounded cos desc, b_id), Lowe's rule
    val byId = vecs.toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      r6(dot / (na * nb))
    }
    val expected = vecs.map(_._1).groupBy(cells)
      .map { case (cell, ids) =>
        val tops = ids.flatMap { a =>
          val ranked = ids.filter(_ != a)
            .map(b => (cos(byId(a), byId(b)), b))
            .sortBy { case (c, b) => (-c, b) }
          if (ranked.size < 2) None
          else {
            val (c1, _) = ranked(0)
            val (c2, _) = ranked(1)
            Some((1.0 - c1) <= 0.8 * (1.0 - c2))
          }
        }
        cell -> ((tops.size.toLong, tops.count(identity).toLong))
      }
      .filter { case (_, (n, _)) => n > 0 }
    assert(out == expected)
    // the anchor has teeth only if the twin ambiguity is visible:
    // somewhere a vector was held back (n_confident < n_vectors)
    assert(expected.values.exists { case (n, c) => c < n },
      s"fixture lost the ambiguity (cells $cells) - tighten the twins")
  }

  // ===================================================================
  // tx18: ntile equal-fill on an all-tie source
  // ===================================================================

  test("tx18_quality_curriculum: the all-tie source pins ntile's " +
      "equal-fill remainder rule - 5 docs split 2/1/1/1 by doc_id") {
    val docs = (1L to 5L).map(i => (i, "same text here", "big")) :+
      ((9L, "other words", "tiny"))
    val out = run("tx18_quality_curriculum",
        fixture("ntile", "documents" -> docsDf(docs)))
      .map(r => (r.getAs[String]("source"), r.getAs[Int]("bin")) ->
        r.getAs[Long]("n_docs")).toMap
    assert(out(("big", 1)) == 2L)
    assert(out(("big", 2)) == 1L && out(("big", 3)) == 1L && out(("big", 4)) == 1L)
    assert(out(("tiny", 1)) == 1L) // a singleton source fills bin 1 only
    // all-tie => per-bin min_q == max_q and identical across bins is
    // implied by the tie; the fill pattern is the anchor here
  }
}
