package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Published-value micro-goldens, part 30 — the incremental dedup
  * pair (round-13 verdict ask 3's second named family: cross-batch
  * keep-first semantics). What the oracle cannot see here is exactly
  * the CONTRACT — which side of the history/arrival split wins, and
  * which pair classes are deliberately invisible — so both are pinned
  * on hand corpora where every fingerprint and Jaccard is 0 or 1:
  *
  *  - dedup_incremental: history wins (an ingest doc whose text
  *    already exists in the corpus is dropped, including the
  *    simulated re-crawl under a fresh doc_id), and the anti-join is
  *    ONLY against history — two identical docs inside one batch
  *    both survive (within-batch dedup is a different operator,
  *    dedup_exact_keep_first).
  *  - dedup_incremental_near: the asymmetric split — arrival×history
  *    matches reported (identical text ⇒ every band collides and
  *    jac = 1.0 exactly), history×history and arrival×arrival pairs
  *    structurally invisible, first_match = min history id.
  */
@graft.Golden
class InferenceGolden30Spec extends SparkSpec {

  private def fixture(name: String, docs: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory(s"golden30_$name").toString
    docs.toDF("doc_id", "text", "source")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        col("source"), length(col("text")).cast("long").as("n_chars"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def run(q: String, dir: String): Array[Row] =
    try SparkEntry.queries(q)(spark, dir).collect()
    finally {
      graft.queries.DedupQueries.releaseSignatureCache()
      spark.catalog.clearCache()
    }

  test("dedup_incremental: history wins — corpus text re-arriving " +
      "under any doc_id is dropped (incl. the %21 re-crawl), unique " +
      "ingest survives, and WITHIN-batch duplicates both pass") {
    // corpus = doc_id % 7 == 0 → {7, 14, 21}; 21 % 21 == 0 also
    // re-arrives as 500021 with the same text (the query builds that
    // re-crawl itself). Ingest = {1,2,3,4,5} ∪ {500021}.
    val out = run("dedup_incremental", fixture("inc", Seq(
      (7L, "delta echo foxtrot", "web"),
      (14L, "papa quebec romeo", "web"),
      (21L, "alpha bravo charlie", "web"),
      (1L, "delta echo foxtrot", "web"),    // = corpus 7 → dropped
      (2L, "golf hotel india", "web"),      // new → survives
      (3L, "juliet kilo lima", "books"),    // new → survives
      (4L, "mike november oscar", "cc"),    // batch-internal dup pair:
      (5L, "mike november oscar", "cc")     // BOTH survive (history-only join)
    ))).map(r => r.getAs[String]("source") -> r.getAs[Long]("n_new")).toMap
    // re-crawl 500021 ("alpha bravo charlie", source web) → dropped,
    // so web counts only doc 2
    assert(out == Map("books" -> 1L, "cc" -> 2L, "web" -> 1L))
  }

  test("dedup_incremental_near: arrival-x-history reported with " +
      "jac = 1.0 and first_match = min history id; history-x-history " +
      "and arrival-x-arrival pairs are structurally invisible") {
    // history = doc_id % 3 == 0 → {3, 6}; arrivals = {1, 2, 4, 5}.
    // T_A on 3, 6 (identical history pair — must NOT be reported) and
    // on arrival 1 (→ matches BOTH, first_match = 3, jac exactly 1).
    // T_B on arrivals 2 and 4 (identical arrival pair — must NOT be
    // reported). T_C unique on 5.
    val tA = "the quick brown fox jumps over the lazy dog"
    val tB = "lorem ipsum dolor sit amet consectetur adipiscing elit"
    val tC = "zulu yankee xray whiskey victor uniform tango"
    val out = run("dedup_incremental_near", fixture("incnear", Seq(
      (3L, tA, "web"), (6L, tA, "web"),
      (1L, tA, "web"),
      (2L, tB, "web"), (4L, tB, "web"),
      (5L, tC, "web")
    )))
    assert(out.length == 1, s"expected exactly the arrival-1 row, got ${out.toSeq}")
    val r = out.head
    assert(r.getAs[Long]("new_id") == 1L)
    assert(r.getAs[Long]("n_matches") == 2L)
    assert(r.getAs[Long]("first_match") == 3L)
    assert(r.getAs[Double]("best_jac") == 1.0)
  }
}
