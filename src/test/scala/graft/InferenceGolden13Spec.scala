package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Published-value micro-goldens, part 13 — the text-quality scorers.
  *
  * Anchors:
  *  - Repetition ratios (the Gopher/C4 filter family, Rae et al.
  *    2021 / Raffel et al. 2020): 1 − distinct/total is hand-exact on
  *    tiny token streams — a fully repeated doc scores (n−1)/n at the
  *    token grain and 1 − 1/(n−1) at the 2-gram grain (→ 1 as n
  *    grows), an all-distinct doc scores 0 at both — and the flag
  *    boundary is a FLOAT fact worth pinning: the nominal 1/20 case
  *    computes as 1 − 19/20, which rounds UP (0.05000000000000004 >
  *    the 0.05 literal), so the at-boundary doc DOES flag, on both
  *    engines identically; a clearly-below doc does not. The 6-dp
  *    display rounding hides the excess — the gate does not.
  *  - TF-IDF (Spärck Jones 1972): a term occurring in EVERY document
  *    carries idf = ln 1 = 0 — zero weight no matter how frequent,
  *    the stopword-suppression law the weighting exists for; a term
  *    exclusive to one source scores tf·ln(N/1) exactly.
  */
@graft.Golden
class InferenceGolden13Spec extends SparkSpec {

  private def fixture(name: String, tables: (String, DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"golden13_$name").toString
    tables.foreach { case (t, df) =>
      df.coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  private def run(q: String, dir: String): Array[Row] =
    try SparkEntry.queries(q)(spark, dir).collect()
    finally {
      graft.queries.EventQueries.releaseCaches()
      graft.queries.TextQueries.releaseCaches()
      graft.queries.ParityQueries.releaseCaches()
      PlanWindows.releaseAll()
      spark.catalog.clearCache()
    }

  private def round6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def docsDf(rows: Seq[(Long, String, String)]): DataFrame = {
    import spark.implicits._
    rows.map { case (id, src, text) => (id, text, "en", src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  // ===================================================================
  // 1. Repetition ratios — hand-exact ends and the strict flag boundary
  // ===================================================================

  test("tx9_repetition_filter: a fully repeated doc scores (n-1)/n and " +
      "1 - 1/(n-1); all-distinct scores 0; the float boundary is pinned") {
    // srcA: "w w w w" → dup_tok = 3/4, dup2 = 1 − 1/3 (flagged)
    // srcB: "a b c d" → both 0 (not flagged)
    // srcC: "x y x y u1..u17" — 21 tokens, 20 2-grams of which (x,y)
    //   repeats once → dup2 = 1 − 19/20 in DOUBLES, which rounds UP
    //   past the 0.05 literal → the nominal boundary doc FLAGS (the
    //   pinned float fact; 6-dp display shows 0.05)
    // srcD: one dup 2-gram of 40 → 0.025, comfortably below → clean
    val srcC2 = (Seq("x", "y", "x", "y") ++ (1 to 17).map(i => s"u$i")).mkString(" ")
    val srcD = (Seq("x", "y", "x", "y") ++ (1 to 37).map(i => s"v$i")).mkString(" ")
    val dir = fixture("rep", "documents" -> docsDf(Seq(
      (1L, "srcA", "w w w w"),
      (2L, "srcB", "a b c d"),
      (3L, "srcC", srcC2),
      (4L, "srcD", srcD))))
    val out = run("tx9_repetition_filter", dir)
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Double]("avg_dup_token_ratio"),
          r.getAs[Double]("avg_dup_2gram_ratio"),
          r.getAs[Long]("n_flagged"))).toMap
    assert(out("srcA") == ((0.75, 0.666667, 1L)))
    assert(out("srcB") == ((0.0, 0.0, 0L)))
    val (ctok, c2, cflag) = out("srcC")
    assert(c2 == 0.05 && cflag == 1L) // 1 − 19/20 rounds UP past 0.05
    assert(ctok == round6(1.0 - 19.0 / 21.0)) // x and y each repeat once
    assert(out("srcD")._3 == 0L) // clearly below the gate
  }

  // ===================================================================
  // 2. TF-IDF — Sparck Jones' zero-weight law for universal terms
  // ===================================================================

  test("tx10_tfidf_top_terms: a term in every document weighs exactly 0 " +
      "(Sparck Jones), an exclusive term weighs tf*ln(N)") {
    // 4 docs, 2 sources; "the" occurs in all 4 (idf = ln 1 = 0);
    // "zebra" appears 3 times in one srcA doc only (idf = ln 4)
    val dir = fixture("tfidf", "documents" -> docsDf(Seq(
      (1L, "srcA", "the zebra zebra zebra alpha"),
      (2L, "srcA", "the beta gamma delta epsilon"),
      (3L, "srcB", "the eta theta iota kappa"),
      (4L, "srcB", "the lam mu nu xi"))))
    val out = run("tx10_tfidf_top_terms", dir)
      .map(r => (r.getAs[String]("source"), r.getAs[String]("term")) ->
        r.getAs[Double]("tfidf")).toMap
    // the universal term never makes a top-5 ON MERIT: its score is 0
    out.get(("srcA", "the")).foreach(v => assert(v == 0.0))
    out.get(("srcB", "the")).foreach(v => assert(v == 0.0))
    // the exclusive term: tf = 3, df = 1, N = 4 → 3·ln 4
    assert(out(("srcA", "zebra")) == round6(3.0 * math.log(4.0)))
    // every singleton unique term scores ln 4 exactly
    assert(out(("srcA", "alpha")) == round6(math.log(4.0)))
  }
}
