package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Published-value micro-goldens, part 36 — closing the gauge. The
  * five remaining never_goldened queries, each pinned by a theorem of
  * its own structure:
  *
  *  - sim22b ≡ sim22 (the exact/LSH DBSCAN pair): on an
  *    identical-vector cluster fixture the LSH candidate generation
  *    is provably complete (identical vectors have identical
  *    signatures, so every true ε-pair collides in every band), so
  *    the two queries must emit the SAME clusters — and both must
  *    match the hand-folded DBSCAN (4-cliques are all-core, the
  *    orthogonal singleton is noise).
  *  - sim3 (hyperplane LSH determinism): signatures are pure
  *    functions of the vector, so identical vectors share a bucket
  *    in EVERY table — each table's histogram partitions {4,3} or
  *    {7}, never splits a group.
  *  - dedup_embedding_lsh: the planted identical groups must pair at
  *    cos 1.0 exactly (LSH recall 1 on identical pairs is a theorem,
  *    not a measurement), the %10 clone pairs at the replayed
  *    rotation cosine, and nothing else.
  *  - pipeline_curation (dedup-compose idempotence): re-ingesting
  *    every document under fresh doc_ids must leave the pipeline
  *    output IDENTICAL — the keep-first dedup makes copy
  *    multiplicity invisible to every downstream stage (a
  *    double-counting bug in any stage fails this).
  *  - sim18_centroid_drift: per-dim quantized means and drift
  *    metrics by hand, including the floor-division-vs-truncation
  *    pin on a negative odd sum.
  */
@graft.Golden
class InferenceGolden36Spec extends SparkSpec {

  private def fixture(name: String, tables: (String, DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"golden36_$name").toString
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
      graft.queries.DedupQueries.releaseSignatureCache()
      spark.catalog.clearCache()
    }

  private def r6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def v2(vals: (Int, Float)*): Array[Float] = {
    val a = Array.fill(64)(0.0f)
    vals.foreach { case (i, x) => a(i) = x }
    a
  }

  private def embFixture(name: String, vecs: Seq[(Long, Array[Float])]): String = {
    import spark.implicits._
    fixture(name, "embeddings" ->
      vecs.map { case (id, a) => (id, a, (id % 4).toInt) }
        .toDF("vec_id", "embedding", "label"))
  }

  /** Two identical 4-clusters + an orthogonal singleton; ids chosen
    * so neither sim22 clone rule (%10, %20) fires — aug == corpus.
    */
  private val dbscanVecs: Seq[(Long, Array[Float])] =
    Seq(1L, 2L, 3L, 7L).map(_ -> v2(0 -> 1000f)) ++
      Seq(11L, 13L, 17L).map(_ -> v2(1 -> 1000f)) ++ // 3 members: all core (dg 2? no: dg=2 < 3)
      Seq(23L -> v2(2 -> 1000f))

  test("sim22_dbscan == sim22b_dbscan_lsh == the hand DBSCAN fold on " +
      "identical clusters (LSH candidates provably complete there)") {
    // group A (ids 1,2,3,7): each member has 3 identical neighbors
    // -> dg 3 -> all core, one cluster rooted at 1. Group B (ids
    // 11,13,17): dg 2 < 3 -> NOT core, and with no core neighbor they
    // are noise (the minPts boundary pinned). Singleton 23: noise.
    val dir = embFixture("dbscan", dbscanVecs)
    def rows(q: String) = run(q, dir).map(r =>
      (r.getAs[Long]("cluster"), r.getAs[Long]("n_core"),
        r.getAs[Long]("n_border"), r.getAs[Long]("n_noise"))).toSeq.sorted
    val exact = rows("sim22_dbscan")
    val lsh = rows("sim22b_dbscan_lsh")
    assert(exact == Seq((1L, 4L, 0L, 4L))) // noise = {11,13,17,23}
    assert(lsh == exact)
  }

  test("sim3_lsh_bucket_profile: identical vectors share a bucket in " +
      "every table - histograms partition {4,3}, never split a group") {
    val out = run("sim3_lsh_bucket_profile",
      embFixture("lshprof", dbscanVecs.filterNot(_._1 == 23L)))
    val byTable = out.groupBy(_.getAs[Int]("table_id"))
      .map { case (t, rs) => t -> rs.map(_.getAs[Long]("cnt")).sorted.toSeq }
    assert(byTable.nonEmpty)
    byTable.foreach { case (t, cnts) =>
      assert(cnts.sum == 7L, s"table $t lost rows: $cnts")
      assert(cnts == Seq(7L) || cnts == Seq(3L, 4L),
        s"table $t split an identical group: $cnts")
    }
  }

  test("dedup_embedding_lsh: planted identical groups pair at cos 1.0 " +
      "exactly, the %10 clone at the replayed rotation cosine, and " +
      "nothing else") {
    // group A {1,2,3,10} (id 10 also spawns the 0.125-rotation clone
    // 1000010), group B {11,13,17} orthogonal
    val vecs = Seq(1L, 2L, 3L, 10L).map(_ -> v2(0 -> 1000f)) ++
      Seq(11L, 13L, 17L).map(_ -> v2(1 -> 1000f))
    val out = run("dedup_embedding_lsh", embFixture("elsh", vecs))
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")) ->
        r.getAs[Double]("cos")).toMap
    // clone of vA = vA + 0.125*rot(vA): dim0 = 1000, dim63 = 125 —
    // replay the engine's cosine (float dot in double, norms, /, r6)
    val cloneCos = {
      val dot = 1000.0 * 1000.0
      val na = math.sqrt(1000.0 * 1000.0)
      val nb = math.sqrt(1000.0 * 1000.0 + 125.0 * 125.0)
      r6(dot / (na * nb))
    }
    val aIds = Seq(1L, 2L, 3L, 10L)
    val expected =
      (for (a <- aIds; b <- aIds if a < b) yield (a, b) -> 1.0).toMap ++
        (for (b <- Seq(11L, 13L, 17L); c <- Seq(11L, 13L, 17L) if b < c)
          yield (b, c) -> 1.0).toMap ++
        aIds.map(a => (a, 1000010L) -> cloneCos).toMap
    assert(out == expected)
  }

  test("pipeline_curation is idempotent under re-ingestion: copies " +
      "under fresh doc_ids leave every output column unchanged") {
    import spark.implicits._
    // the real sf0.001 corpus as the base; B re-ingests every doc
    // under a shifted id (and the pipeline itself doubles internally,
    // so B runs on 4 copies of every text vs A's 2)
    val base = graft.sources.Tables.table(spark, "/root/testdata/sf0.001", "documents")
    val dirA = java.nio.file.Files.createTempDirectory("golden36_pipeA").toString
    base.coalesce(1).write.mode("overwrite").parquet(s"$dirA/documents.parquet")
    val dirB = java.nio.file.Files.createTempDirectory("golden36_pipeB").toString
    base.unionAll(base.withColumn("doc_id", col("doc_id") + 5000000L))
      .coalesce(1).write.mode("overwrite").parquet(s"$dirB/documents.parquet")
    def rows(dir: String) = run("pipeline_curation", dir).map(r =>
      (r.getAs[String]("lang_pred"), r.getAs[Long]("kept_docs"),
        r.getAs[Long]("total_tokens"), r.getAs[Double]("avg_quality"))).toSeq
    val a = rows(dirA)
    assert(a.nonEmpty && a.map(_._2).sum > 0)
    assert(rows(dirB) == a)
  }

  test("sim18_centroid_drift: hand per-dim quantized means incl. the " +
      "floor-division pin on a negative odd sum") {
    // even ids (0, 2): dim0 2.0; dim2 -1.0 / -0.001 -> qv -1000, -1:
    //   sum -1001, floorDiv(-1001, 2) = -501 (floor, NOT -500)
    // odd ids (1, 3): dim0 1.0, dim1 0.5
    val vecs = Seq(
      0L -> v2(0 -> 2.0f, 2 -> -1.0f),
      2L -> v2(0 -> 2.0f, 2 -> -0.001f),
      1L -> v2(0 -> 1.0f, 1 -> 0.5f),
      3L -> v2(0 -> 1.0f, 1 -> 0.5f))
    val out = run("sim18_centroid_drift", embFixture("drift", vecs))
    assert(out.length == 1)
    val r = out.head
    // per-dim centroids (x1000, floorDiv): even: d0 2000, d2 -501,
    // rest 0; odd: d0 1000, d1 500, rest 0. deltas: d0 1000, d1 -500,
    // d2 -501 -> l2sq = 1e6 + 250000 + 251001 = 1501001; linf = 1000
    assert(r.getAs[Long]("n_even") == 2L)
    assert(r.getAs[Long]("n_odd") == 2L)
    assert(r.getAs[Long]("l2sq_drift") == 1501001L)
    assert(r.getAs[Long]("linf_drift") == 1000L)
  }
}
