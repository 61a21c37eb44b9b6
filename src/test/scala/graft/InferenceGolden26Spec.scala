package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Published-value micro-goldens, part 26 — tenth gauge-steered round:
  * the three-way merge decision table, the novelty curve, and Gini
  * feature gain. Anchors:
  *
  *  - diff_merge3: ALL EIGHT resolution classes of the three-way
  *    merge exercised in one hand fixture (keep / take_a / take_b /
  *    converged / three delete shapes / the delete-vs-edit conflict),
  *    each class pinned by its exact id_sum — the branch derivations
  *    replayed from the residue rules (%11/%7 vs %13/%5, %35 edits
  *    identically on both).
  *  - tx56: trigram first-seen deciles by hand — a repeated trigram
  *    counts once at its FIRST doc, the last decile clamps at 9,
  *    and the cumulative curve is the running sum.
  *  - tx49: the CART Gini gain replayed per feature word from the
  *    part-21 score/quality protocol (parent impurity minus the
  *    presence-weighted child impurities, same op order).
  */
@graft.Golden
class InferenceGolden26Spec extends SparkSpec {

  private def fixture(name: String, tables: (String, DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"golden26_$name").toString
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
      PlanWindows.releaseAll()
      spark.catalog.clearCache()
    }

  private def round6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def docsOf(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.map { case (id, text) => (id, text, "en", "s", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("diff_merge3 exercises all eight resolution classes, each pinned " +
      "by its exact id set (branch rules: A %11 drop/%7 edit, B %13 " +
      "drop/%5 edit, %35 identical edits)") {
    // id 1 same/same; 7 A-edit; 5 B-edit; 35 both-edit identically;
    // 11 A-delete; 13 B-delete; 143 both-delete; 55 A-delete B-edit
    val ids = Seq(1L, 5L, 7L, 11L, 13L, 35L, 55L, 143L)
    val dir = fixture("m3", "documents" -> docsOf(
      ids.map(i => (i, s"body of document $i"))))
    val out = run("diff_merge3", dir)
      .map(r => (r.getAs[String]("a_state"), r.getAs[String]("b_state"),
        r.getAs[String]("resolution"), r.getAs[Long]("n"),
        r.getAs[Long]("id_sum")))
    assert(out.toSeq == Seq(
      ("changed", "changed", "converged", 1L, 35L),
      ("changed", "same", "take_a", 1L, 7L),
      ("deleted", "changed", "conflict", 1L, 55L),
      ("deleted", "deleted", "delete", 1L, 143L),
      ("deleted", "same", "delete", 1L, 11L),
      ("same", "changed", "take_b", 1L, 5L),
      ("same", "deleted", "delete", 1L, 13L),
      ("same", "same", "keep", 1L, 1L)))
  }

  test("tx56_novelty_curve: a repeated trigram counts once at its first " +
      "doc; the last decile clamps at 9; the cumulative curve runs") {
    // nd = 3: doc 1 'a b c' (first seen, decile 10 div 3 = 3),
    // doc 2 repeats it (no new trigram), doc 3 'x y z' (decile
    // min(30 div 3, 9) = 9)
    val dir = fixture("nc", "documents" -> docsOf(Seq(
      (1L, "a b c"), (2L, "a b c"), (3L, "x y z"))))
    val out = run("tx56_novelty_curve", dir)
      .map(r => (r.getAs[Long]("decile"), r.getAs[Long]("new_trigrams"),
        r.getAs[Long]("cum_trigrams")))
    assert(out.toSeq == Seq((3L, 1L, 1L), (9L, 1L, 2L)))
  }

  test("tx49_gini_features replays the CART gain (parent impurity minus " +
      "presence-weighted child impurities) over the score protocol") {
    import graft.ext.QualityClassifier
    val texts: Seq[String] = Seq(
      "the the a of and x", "the quick brown fox", "alpha beta gamma",
      "of course it works", "plain words only here", "el la de y")
    def toks(t: String) = t.split(" ")
    def quality(t: String): Double = {
      val ts = toks(t); val n = ts.length.toDouble
      val stop = Seq("the", "a", "and", "of").map(w => ts.count(_ == w)).sum
      round6(math.min(n / 50.0, 1.0) * 0.5 + ts.distinct.length / n * 0.3
        + math.min(stop / n * 5.0, 1.0) * 0.2)
    }
    val qs = texts.map(quality)
    // Spark percentile(q, 0.5) interpolates: even n -> mean of the
    // two middle order statistics
    val sortedQ = qs.sorted
    val med =
      if (qs.length % 2 == 1) sortedQ(qs.length / 2)
      else (sortedQ(qs.length / 2 - 1) + sortedQ(qs.length / 2)) / 2.0
    val ys = qs.map(q => if (q > med) 1L else 0L)
    def gini(p: Long, n: Long): Double =
      2.0 * (p.toDouble / n) * (1.0 - p.toDouble / n)
    val n = texts.length.toLong
    val p = ys.sum
    val expected = QualityClassifier.featureWords.map { w =>
      val present = texts.zip(ys).filter(_._1.split(" ").contains(w))
      val n1 = present.size.toLong
      val p1 = present.map(_._2).sum
      val n0 = n - n1; val p0 = p - p1
      val gain = gini(p, n) -
        ((if (n1 > 0) n1.toDouble / n * gini(p1, n1) else 0.0) +
          (if (n0 > 0) n0.toDouble / n * gini(p0, n0) else 0.0))
      w -> (n1, round6(gain))
    }.toMap
    val out = run("tx49_gini_features", fixture("gf",
      "documents" -> docsOf(texts.zipWithIndex.map { case (t, i) =>
        ((i + 1).toLong, t)
      }))).map(r => r.getAs[String]("w") ->
        (r.getAs[Long]("n_present"), r.getAs[Double]("gain"))).toMap
    assert(out.keySet == expected.keySet)
    expected.foreach { case (w, (n1, g)) =>
      assert(out(w)._1 == n1, s"n_present($w)")
      assert(math.abs(out(w)._2 - g) <= 1.1e-6, s"gain($w): ${out(w)._2} vs $g")
    }
  }
}
