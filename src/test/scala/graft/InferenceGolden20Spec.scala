package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Published-value micro-goldens, part 20 — fifth gauge-steered round:
  * decontamination, sequence packing, item-item CF, the Markov chain
  * score, and the containment ceiling. Anchors:
  *
  *  - Decontamination: hand 5-gram overlap — one shared verbatim gram
  *    between a training doc and the benchmark slice, counted once.
  *  - Sequence packing: concat-then-chunk pack ids from hand prefix
  *    sums at B = 2048, including a doc landing exactly on a pack
  *    boundary.
  *  - Item-item CF: hand binary-basket cosines cab/sqrt(ca*cb) with
  *    the support cut (cab >= 2) excluding a once-co-bought pair and
  *    the integer skey tie broken by item id.
  *  - Sequence likelihood: mean ln(n_trans/row_total) replayed from a
  *    hand transition matrix — the improbable chain ranks first.
  *  - Containment: C_max = 1 for identical docs (the ceiling), with
  *    the exact shingle-intersection count.
  */
@graft.Golden
class InferenceGolden20Spec extends SparkSpec {

  private def fixture(name: String, tables: (String, DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"golden20_$name").toString
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
      graft.queries.DedupQueries.releaseSignatureCache()
      PlanWindows.releaseAll()
      spark.catalog.clearCache()
    }

  private def round6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private val Day0 = 1704067200L

  private def eventsRows(
      rows: Seq[(Long, Long, Long, String, Double)]): DataFrame = {
    import spark.implicits._
    rows.toDF("event_id", "sec", "user_id", "event_type", "value")
      .select(col("event_id"), timestamp_seconds(col("sec")).as("ts"),
        col("user_id"), col("event_type"), col("value"),
        lit("{}").as("props"))
  }

  private def docsOf(rows: Seq[(Long, String, String)]): DataFrame = {
    import spark.implicits._
    rows.map { case (id, src, text) =>
      (id, text, "en", src, text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  // ===================================================================
  // 1. Decontamination — one shared verbatim 5-gram, counted once
  // ===================================================================

  test("tx41_decontamination counts exactly the training docs sharing a " +
      "verbatim 5-gram with the benchmark slice") {
    // doc 11 (doc_id % 11 == 0) IS the benchmark: grams
    // {q w e r t, w e r t y}; doc 12 shares exactly ONE of them
    // (q w e r t); doc 13 shares none and must be absent
    val dir = fixture("deco", "documents" -> docsOf(Seq(
      (11L, "s", "q w e r t y"),
      (12L, "s", "q w e r t z"),
      (13L, "s", "a b c d e f"))))
    val out = run("tx41_decontamination", dir)
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_contaminated"),
        r.getAs[Long]("grams_hit"), r.getAs[Long]("max_hit")))
    assert(out.toSeq == Seq(("s", 1L, 1L, 1L)))
  }

  // ===================================================================
  // 2. Sequence packing — hand prefix sums at B = 2048
  // ===================================================================

  test("tx42_sequence_packing: concat-then-chunk pack ids from hand " +
      "cumulative sums, incl. a doc starting exactly on a boundary") {
    def doc(id: Long, n: Int) = (id, "s", Seq.fill(n)("w").mkString(" "))
    // nt by doc_id order: 1000, 1500, 600, 2048, 10
    // cum - nt:           0,    1000, 2500, 3100, 5148
    // pack (div 2048):    0,    0,    1,    1,    2 (5148 = 2*2048 + 1052... div -> 2)
    // histogram: 2 packs started by 2 docs, 1 pack by 1 doc
    val dir = fixture("pack", "documents" -> docsOf(Seq(
      doc(1L, 1000), doc(2L, 1500), doc(3L, 600), doc(4L, 2048), doc(5L, 10))))
    val out = run("tx42_sequence_packing", dir)
      .map(r => (r.getAs[Long]("docs_started"), r.getAs[Long]("n_packs")))
    assert(out.toSeq == Seq((1L, 1L), (2L, 2L)))
  }

  // ===================================================================
  // 3. Item-item CF — hand basket cosines, support cut, id tie-break
  // ===================================================================

  test("j13_item_cf emits the hand also-bought lists: cosine " +
      "cab/sqrt(ca*cb), the cab>=2 support cut, ties by item id") {
    import spark.implicits._
    // baskets: {1,2} x2, {1,3} x2, {2,3} x1 (cut by support)
    // counts: c1 = 4, c2 = 3, c3 = 3; cos(1,2) = cos(1,3) =
    // 2/sqrt(12) = 0.577350; item 1's two neighbors tie on the
    // integer skey (333333) -> id order 2 then 3
    val baskets = Seq(
      1L -> Seq(1L, 2L), 2L -> Seq(1L, 2L), 3L -> Seq(1L, 3L),
      4L -> Seq(1L, 3L), 5L -> Seq(2L, 3L))
    val li = baskets.flatMap { case (ok, ps) => ps.map(p => (ok, p)) }
      .toDF("l_orderkey", "l_partkey")
    val out = run("j13_item_cf", fixture("cf", "lineitem" -> li))
      .map(r => (r.getAs[Long]("pa"), r.getAs[Long]("rk"),
        r.getAs[Long]("pb"), r.getAs[Long]("cab"),
        r.getAs[Double]("cosine")))
    val c = round6(2.0 / math.sqrt(12.0))
    assert(out.toSeq == Seq(
      (1L, 1L, 2L, 2L, c), (1L, 2L, 3L, 2L, c),
      (2L, 1L, 1L, 2L, c), (3L, 1L, 1L, 2L, c)))
  }

  // ===================================================================
  // 4. Sequence likelihood — hand transition matrix, improbable first
  // ===================================================================

  test("t_sequence_likelihood replays mean ln(n/row_total) from the " +
      "hand matrix; the improbable chain ranks first") {
    // user 1: a,a -> (a,a); user 3: a,a,a -> (a,a) x2; user 2: a,b
    // matrix: (a,a) 3, (a,b) 1, row total a = 4
    // scores: users 1,3 -> ln(3/4); user 2 -> ln(1/4) (most improbable)
    def ev(id: Long, u: Long, t: Long, tp: String) =
      (id, Day0 + t, u, tp, 1.0)
    val rows = Seq(
      ev(1L, 1L, 10L, "a"), ev(2L, 1L, 20L, "a"),
      ev(3L, 2L, 10L, "a"), ev(4L, 2L, 20L, "b"),
      ev(5L, 3L, 10L, "a"), ev(6L, 3L, 20L, "a"), ev(7L, 3L, 30L, "a"))
    val out = run("t_sequence_likelihood",
      fixture("seqll", "events" -> eventsRows(rows)))
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_trans"),
        r.getAs[Double]("avg_ll")))
    val lo = round6(math.log(1.0 / 4.0))
    val hi = round6(math.log(3.0 / 4.0))
    assert(out.toSeq == Seq((2L, 1L, lo), (1L, 1L, hi), (3L, 2L, hi)))
  }

  // ===================================================================
  // 5. Containment — the C_max = 1 ceiling with exact intersection
  // ===================================================================

  test("dedup_containment_pairs: identical docs read containment 1.0 " +
      "with the exact shingle-intersection count") {
    // 5 tokens -> 3 distinct 3-gram shingles; identical docs collide
    // in every minhash band by construction
    val dir = fixture("cont", "documents" -> docsOf(Seq(
      (1L, "s", "alpha beta gamma delta epsilon"),
      (2L, "s", "alpha beta gamma delta epsilon"))))
    val out = run("dedup_containment_pairs", dir)
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
        r.getAs[Long]("n_common"), r.getAs[Double]("containment")))
    assert(out.toSeq == Seq((1L, 2L, 3L, 1.0)))
  }
}
