package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Published-value micro-goldens, part 23 — seventh gauge-steered
  * round: the text-curation tail. Anchors:
  *
  *  - Phrase search: hand positional-postings intersection — adjacent
  *    "data slow" counted per occurrence, non-adjacent and reversed
  *    orders excluded (the Lucene phrase-join semantics).
  *  - Lexical complexity: the vowel-group syllable heuristic on hand
  *    words (united = 3 groups -> polysyllabic; cat = 1; xyz = 0).
  *  - Shingle novelty: hand df=1 fractions — two docs sharing one of
  *    their two shingles score 1/2 each, the all-unique doc scores 1.
  *  - Passage dedup: the planted re-crawl (every 5th doc re-arrives)
  *    duplicates exactly its chunks — hand counts.
  *  - Dup-n-gram coverage: the same planted re-crawl marks exactly
  *    the clone pair's positions as cross-doc duplicated (within-doc
  *    repeats deliberately excluded).
  */
@graft.Golden
class InferenceGolden23Spec extends SparkSpec {

  private def fixture(name: String, tables: (String, DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"golden23_$name").toString
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
      graft.queries.EventQueries.releaseCaches()
      graft.queries.DedupQueries.releaseSignatureCache()
      PlanWindows.releaseAll()
      spark.catalog.clearCache()
    }

  private def round6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def docsOf(rows: Seq[(Long, String, String)]): DataFrame = {
    import spark.implicits._
    rows.map { case (id, src, text) =>
      (id, text, "en", src, text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("tx32_phrase_search counts adjacent occurrences only: reversed " +
      "and gapped pairs do not match") {
    val dir = fixture("ph", "documents" -> docsOf(Seq(
      (1L, "s", "data slow x data slow"), // two adjacent hits
      (2L, "s", "data x slow"),           // gapped -> no hit
      (3L, "s", "slow data"))))           // reversed -> no hit
    val out = run("tx32_phrase_search", dir)
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_hits")))
    assert(out.toSeq == Seq((1L, 2L)))
  }

  test("tx33_lexical_complexity applies the vowel-group syllable " +
      "heuristic: united=3, cat=1, xyz=0") {
    val dir = fixture("lx", "documents" -> docsOf(Seq(
      (1L, "s", "united cat xyz"))))
    val r = run("tx33_lexical_complexity", dir).head
    assert(r.getAs[Long]("total_tokens") == 3L)
    assert(r.getAs[Double]("avg_syllables_per_token") == round6(4.0 / 3.0))
    assert(r.getAs[Double]("pct_polysyllabic") == round6(1.0 / 3.0))
  }

  test("tx34_shingle_novelty: a shared shingle halves both docs' " +
      "novelty; the all-unique doc scores 1") {
    // source s: "w1 w2 w3 w4" -> shingles {w1w2w3, w2w3w4};
    // "w1 w2 w3 z" -> {w1w2w3, w2w3z}: the shared shingle has df 2,
    // so each doc's novelty = 1/2. source t: one doc, one shingle,
    // df 1 -> novelty 1
    val dir = fixture("nv", "documents" -> docsOf(Seq(
      (1L, "s", "w1 w2 w3 w4"),
      (2L, "s", "w1 w2 w3 z"),
      (3L, "t", "q1 q2 q3"))))
    val out = run("tx34_shingle_novelty", dir)
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Double]("avg_novelty"))).toMap
    assert(out("s") == ((2L, 0.5)))
    assert(out("t") == ((1L, 1.0)))
  }

  test("tx13_passage_dedup: the planted re-crawl (doc_id % 5 == 0) " +
      "duplicates exactly its chunks") {
    // five short docs (one chunk each); doc 5 re-arrives -> 6 chunks,
    // 5 distinct, 1 removed
    val dir = fixture("pd", "documents" -> docsOf(
      (1L to 5L).map(i => (i, "s", s"a$i b$i c$i d$i"))))
    val r = run("tx13_passage_dedup", dir).head
    assert(r.getAs[Long]("n_chunks") == 6L)
    assert(r.getAs[Long]("n_distinct_passages") == 5L)
    assert(r.getAs[Long]("n_removed") == 1L)
  }

  test("tx22_dup_ngram_coverage: only the clone pair's 8-gram positions " +
      "count as cross-doc duplicated") {
    // five 9-token docs (2 gram positions each, disjoint vocab); doc 5
    // re-arrives -> 6 docs with grams; the clone pair reads dup_frac
    // 1.0 (flagged), the rest 0 -> avg 2/6, total dup positions 4
    val dir = fixture("dg", "documents" -> docsOf(
      (1L to 5L).map(i => (i, "s", (1 to 9).map(j => s"t${i}_$j").mkString(" ")))))
    val r = run("tx22_dup_ngram_coverage", dir).head
    assert(r.getAs[Long]("n_docs") == 6L)
    assert(r.getAs[Long]("n_flagged") == 2L)
    assert(r.getAs[Double]("avg_dup_frac") == round6(2.0 / 6.0))
    assert(r.getAs[Long]("total_dup_pos") == 4L)
  }
}
