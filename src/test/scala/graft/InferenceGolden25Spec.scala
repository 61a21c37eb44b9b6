package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Published-value micro-goldens, part 25 — ninth gauge-steered round:
  * the FastSS fuzzy join, the sparse-cosine index, and the
  * temperature mixture. Anchors:
  *
  *  - j6 (FastSS, Bocek et al. 2007): the deletion-neighborhood
  *    candidate rule's three match classes by hand — exact (lev 0),
  *    insertion (lev 1), substitution (lev 1, via equal i-deletions)
  *    — all found through the variant equi-join, none missed.
  *  - dedup_sparse_cosine: identical docs read cos = 1 with the exact
  *    integer dot; a pair sharing only 2 of 3 rare shingles is pruned
  *    by the >= 3 overlap cut BEFORE any vector math (the candidate
  *    discipline, verified by absence).
  *  - tx16: the temperature rate min(1, 16/sqrt(n)) at a hand group
  *    size (n = 400 -> rate 0.8), with the admitted count replayed
  *    through the independent polynomial hash.
  */
@graft.Golden
class InferenceGolden25Spec extends SparkSpec {

  private def fixture(name: String, tables: (String, DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"golden25_$name").toString
    tables.foreach { case (t, df) =>
      df.coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  private def run(q: String, dir: String): Array[Row] =
    try SparkEntry.queries(q)(spark, dir).collect()
    finally {
      graft.queries.TextQueries.releaseCaches()
      graft.queries.ParityQueries.releaseCaches()
      graft.queries.DedupQueries.releaseSignatureCache()
      PlanWindows.releaseAll()
      spark.catalog.clearCache()
    }

  private def docsOf(rows: Seq[(Long, String, String)]): DataFrame = {
    import spark.implicits._
    rows.map { case (id, src, text) =>
      (id, text, "en", src, text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  private def polyHash(s: String): Long =
    s.foldLeft(7L)((acc, ch) => (acc * 31 + ch.toInt) % 1000000007L)

  test("j6_fuzzy_join finds all three FastSS match classes by hand: " +
      "exact, insertion, and substitution — through the variant equi-join") {
    import spark.implicits._
    // probe = cust 5's name with the 10th char dropped: 'AAAAAAAAAB'.
    // matches: cust 5 itself (insertion, lev 1), cust 6 (exact,
    // lev 0), cust 7 (substitution at the last char, lev 1); cust 1
    // is unrelated
    val cust = Seq(
      (1L, "ZZZZZZZZZZZ"), (5L, "AAAAAAAAAXB"),
      (6L, "AAAAAAAAAB"), (7L, "AAAAAAAAAC"))
      .toDF("c_custkey", "c_name")
    val out = run("j6_fuzzy_join", fixture("fz", "customer" -> cust))
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("n_matches"),
        r.getAs[Long]("best_custkey"), r.getAs[Long]("best_lev")))
    assert(out.toSeq == Seq((900005L, 3L, 5L, 0L)))
  }

  test("dedup_sparse_cosine: identical docs read cos = 1 with the exact " +
      "integer dot; a 2-of-3 shared pair is pruned before vector math") {
    // docs 1,2 identical (3 shingles each, all tf 1 -> dot 3, cos 1);
    // doc 3 shares only 2 shingles with them (< MinShared 3) -> no
    // candidate pair with 3 may appear
    val dir = fixture("sc", "documents" -> docsOf(Seq(
      (1L, "s", "w1 w2 w3 w4 w5"),
      (2L, "s", "w1 w2 w3 w4 w5"),
      (3L, "s", "w1 w2 w3 w4 z"))))
    val out = run("dedup_sparse_cosine", dir)
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
        r.getAs[Long]("dot"), r.getAs[Double]("cos")))
    assert(out.toSeq == Seq((1L, 2L, 3L, 1.0)))
  }

  test("tx16_temperature_mixture applies rate = min(1, 16/sqrt(n)) at a " +
      "hand group size; the admitted count replays the content hash") {
    // 400 docs with doc_id+1 in [512, 911] -> one 10-bit group,
    // rate = 16/20 = 0.8, threshold 800000 over the hash-bucket space
    val docs = (511L to 910L).map(i => (i, "s", s"doc body number $i"))
    val expected = docs.count { case (_, _, t) =>
      polyHash(t) % 1000000L < 800000L
    }.toLong
    val out = run("tx16_temperature_mixture",
      fixture("tm", "documents" -> docsOf(docs)))
      .map(r => (r.getAs[Int]("g"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_sampled"), r.getAs[Double]("rate")))
    assert(out.toSeq == Seq((10, 400L, expected, 0.8)))
  }
}
