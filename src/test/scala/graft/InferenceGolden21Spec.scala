package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.ext.{QualityClassifier, QualityClassifierModel}

/** Published-value micro-goldens, part 21 — the classifier-derived
  * evaluators (the gap cluster parts 15-20 could not reach: their
  * (score, label) inputs come from the pinned logreg gate and the
  * quality heuristic over the text, so a value golden needs the
  * score replayed first).
  *
  * Protocol: the SCORE is computed through the production driver-side
  * helpers (QualityClassifier.featuresOf/scoreOf — which
  * QualityClassifierSpec already holds bit-equal to the plan-side
  * Column expressions), and the quality heuristic is replayed from
  * its pinned formula. The anchor then targets the EVALUATOR
  * MACHINERY — the hand-rolled part the oracle mirrors share:
  *
  *  - tx28: precision/recall/F1/accuracy recomputed from the
  *    confusion DEFINITIONS (van Rijsbergen's F1 = 2PR/(P+R)) over
  *    the replayed predictions and labels;
  *  - tx40: Cohen's kappa re-derived through the textbook
  *    (p_o − p_e)/(1 − p_e) route with exact arithmetic (the part-15
  *    Fleiss protocol applied to the 2×2 case);
  *  - tx43: AUC re-derived by brute-force positive×negative pair
  *    counting (the Mann-Whitney identity: P(score_pos > score_neg)
  *    with ties at 1/2) — independent of the tie-averaged-rank /
  *    cum / U assembly the query folds (the r11 shared-midrank bug
  *    class, anchored at last).
  */
@graft.Golden
class InferenceGolden21Spec extends SparkSpec {

  private def fixture(name: String, tables: (String, DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"golden21_$name").toString
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

  // ----- the replay: score via the production driver-side helpers
  // (spec-held bit-equal to the plan), q via the pinned formula -----

  private def score(text: String): Double = {
    val toks = text.split(" ")
    val freqs = QualityClassifier.featureWords.map(w =>
      toks.count(_ == w).toLong)
    QualityClassifier.scoreOf(
      QualityClassifier.featuresOf(toks.length.toLong,
        toks.distinct.length.toLong, freqs),
      QualityClassifierModel.weights)
  }

  private def quality(text: String): Double = {
    val toks = text.split(" ")
    val n = toks.length.toDouble
    val diversity = toks.distinct.length / n
    val stopHits = Seq("the", "a", "and", "of").map(w =>
      toks.count(_ == w)).sum.toDouble
    round6(math.min(n / 50.0, 1.0) * 0.5 + diversity * 0.3
      + math.min(stopHits / n * 5.0, 1.0) * 0.2)
  }

  /** The fixture: long low-diversity marker-heavy docs score positive
    * (length saturation dominates), short diverse docs negative; the
    * quality heuristic splits them differently enough that the
    * confusion table has mass off the diagonal.
    */
  private val texts: Seq[(Long, String)] = Seq(
    1L -> (("the a " * 25).trim),                     // long, 2 distinct
    2L -> (("the a " * 20).trim + " x y z w v"),      // long, more diverse
    3L -> (("of and " * 25).trim),                    // long, no w>0 markers
    4L -> "alpha beta gamma delta epsilon",           // short, diverse
    5L -> "one two three four five six seven",        // short, diverse
    6L -> (("the " * 30).trim),                       // medium, 1 distinct
    7L -> "p q r s t u v w x y z aa bb cc dd")        // short, very diverse

  private def replayed: Seq[(Double, Double)] =
    texts.map { case (_, t) => (score(t), quality(t)) }

  private def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)

  test("fixture sanity: both predicted classes and both label classes " +
      "are populated (otherwise the evaluators degenerate)") {
    val r = replayed
    val med = median(r.map(_._2))
    assert(r.count(_._1 > 0) >= 2 && r.count(_._1 <= 0) >= 2)
    assert(r.count(_._2 > med) >= 2 && r.count(_._2 <= med) >= 2)
  }

  test("tx28_eval_metrics matches the confusion-definition replay " +
      "(van Rijsbergen F1 = 2PR/(P+R))") {
    val r = replayed
    val med = median(r.map(_._2))
    val tp = r.count(x => x._1 > 0 && x._2 > med).toLong
    val fp = r.count(x => x._1 > 0 && x._2 <= med).toLong
    val fn = r.count(x => x._1 <= 0 && x._2 > med).toLong
    val tn = r.count(x => x._1 <= 0 && x._2 <= med).toLong
    val out = run("tx28_eval_metrics",
      fixture("ev", "documents" -> docsOf(texts))).head
    assert(out.getAs[Long]("tp") == tp && out.getAs[Long]("fp") == fp)
    assert(out.getAs[Long]("fn") == fn && out.getAs[Long]("tn") == tn)
    assert(out.getAs[Double]("prec") == round6(tp.toDouble / (tp + fp)))
    assert(out.getAs[Double]("recall") == round6(tp.toDouble / (tp + fn)))
    assert(out.getAs[Double]("f1") ==
      round6((2 * tp).toDouble / (2 * tp + fp + fn)))
    assert(out.getAs[Double]("accuracy") ==
      round6((tp + tn).toDouble / texts.length))
  }

  test("tx40_cohens_kappa matches the textbook (p_o - p_e)/(1 - p_e) " +
      "route on the replayed 2x2 table") {
    val r = replayed
    val med = median(r.map(_._2))
    val n = r.length
    val a = r.count(x => x._1 > 0 && x._2 > med)
    val b = r.count(x => x._1 > 0 && x._2 <= med)
    val c = r.count(x => x._1 <= 0 && x._2 > med)
    val dd = n - a - b - c
    // textbook route with exact arithmetic
    val mc = new java.math.MathContext(40)
    val po = BigDecimal(a + dd, mc) / BigDecimal(n, mc)
    val pe = (BigDecimal((a + b).toLong * (a + c), mc) +
      BigDecimal((c + dd).toLong * (b + dd), mc)) / BigDecimal(n.toLong * n, mc)
    val kappa = ((po - pe) / (BigDecimal(1, mc) - pe))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val out = run("tx40_cohens_kappa",
      fixture("ck", "documents" -> docsOf(texts))).head
    assert(out.getAs[Long]("a") == a.toLong && out.getAs[Long]("d") == dd.toLong)
    assert(out.getAs[Double]("kappa") == kappa)
  }

  test("tx29_calibration matches the replayed decile binning and exact " +
      "per-bin positive rates") {
    val r = replayed
    val med = median(r.map(_._2))
    val lo = r.map(_._1).min
    val hi = r.map(_._1).max
    def bucket(s: Double): Long =
      math.min(math.floor((s - lo) * 10.0 / (hi - lo)), 9.0).toLong
    val byB = r.groupBy(x => bucket(x._1))
    val out = run("tx29_calibration",
      fixture("cal", "documents" -> docsOf(texts)))
      .map(x => x.getAs[Long]("bucket") ->
        (x.getAs[Long]("n"), x.getAs[Long]("n_pos"),
          x.getAs[Double]("pos_rate"))).toMap
    assert(out.keySet == byB.keySet)
    byB.foreach { case (b, xs) =>
      val npos = xs.count(_._2 > med).toLong
      assert(out(b) == ((xs.size.toLong, npos,
        round6(npos.toDouble / xs.size))))
    }
  }

  test("tx48_brier_decomp satisfies Murphy's identity against an " +
      "independently-computed binned Brier score") {
    val r = replayed
    val med = median(r.map(_._2))
    def x6(s: Double): Long = BigDecimal((0.5 + s / (2.0 * (1.0 + math.abs(s))))
      * 1000000).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val py = r.map(x => (x6(x._1), if (x._2 > med) 1L else 0L))
    val byK = py.groupBy(x => math.min(x._1 / 100000L, 9L))
    val nn = py.size.toDouble
    val ybar = py.map(_._2).sum / nn
    // the DIRECT binned Brier: mean over docs of (pbar_k - y)^2 —
    // Murphy's theorem says this must equal REL - RES + UNC exactly
    // (the forecaster is evaluated at bin granularity)
    val direct = py.map { case (x, y) =>
      val k = math.min(x / 100000L, 9L)
      val xs = byK(k)
      val pbar = xs.map(_._1).sum.toDouble / 1000000.0 / xs.size
      (pbar - y) * (pbar - y)
    }.sum / nn
    val out = run("tx48_brier_decomp",
      fixture("br", "documents" -> docsOf(texts))).head
    assert(out.getAs[Long]("n") == py.size.toLong)
    assert(out.getAs[Double]("pos_rate") == round6(ybar))
    assert(math.abs(out.getAs[Double]("brier") - direct) <= 1.1e-6)
    // and the identity holds within the decomposition's own terms
    assert(math.abs(out.getAs[Double]("reliability")
      - out.getAs[Double]("resolution")
      + out.getAs[Double]("uncertainty")
      - out.getAs[Double]("brier")) <= 2.1e-6)
  }

  test("tx43_auc_exact matches brute-force Mann-Whitney pair counting " +
      "(ties at 1/2) over the replayed scores") {
    val r = replayed
    val med = median(r.map(_._2))
    def x6(s: Double): Long =
      BigDecimal(s * 1000000).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val pos = r.filter(_._2 > med).map(p => x6(p._1))
    val neg = r.filter(_._2 <= med).map(p => x6(p._1))
    val u = (for (p <- pos; q <- neg) yield {
      if (p > q) 1.0 else if (p == q) 0.5 else 0.0
    }).sum
    val auc = round6(u / (pos.size.toDouble * neg.size.toDouble))
    val out = run("tx43_auc_exact",
      fixture("auc", "documents" -> docsOf(texts))).head
    assert(out.getAs[Long]("n1") == pos.size.toLong)
    assert(out.getAs[Long]("n0") == neg.size.toLong)
    assert(out.getAs[Double]("auc") == auc)
  }
}
