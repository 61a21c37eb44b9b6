package graft

import org.apache.spark.sql.functions._

/** Published-value micro-goldens, part 37 — the quality scorer's hand
  * values. The gauge audit behind it: several DECLARATIVE-classified
  * queries (tx2's histogram, tx18/tx21/tx24's windows) consume
  * `TextAnalysis.qualityScoreTokens`, a hand-rolled scorer whose
  * DuckDB mirror is written by the same hand — engine diversity does
  * not anchor the FORMULA. TextAnalysisSpec pins only range and
  * ordering; this part pins exact values at every term's boundary:
  *
  *   q = min(n/50, 1)·0.5 + (distinct/n)·0.3 + min(stopRatio·5, 1)·0.2
  *
  * with stopRatio = hits of {the, a, and, of} / n, rounded to 6 dp.
  */
@graft.Golden
class InferenceGolden37Spec extends SparkSpec {

  private def score(text: String): Double = {
    import spark.implicits._
    Seq(text).toDF("text")
      .select(graft.ext.TextAnalysis.qualityScore(col("text")).as("q"))
      .collect().head.getAs[Double]("q")
  }

  test("all-stopword short text: 4/50·0.5 + 1.0·0.3 + cap(1)·0.2 = 0.54") {
    assert(score("the a of and") == 0.54)
  }

  test("pure repetition: length term only at diversity 1/4 -> 0.115") {
    // n=4: 0.08·0.5 = 0.04; diversity 0.25·0.3 = 0.075; no stopwords
    assert(score("x x x x") == 0.115)
  }

  test("the n = 50 length cap: 50 distinct non-stop tokens score " +
      "exactly 0.5 + 0.3 = 0.8, and more length cannot raise it") {
    val fifty = (1 to 50).map(i => s"w$i").mkString(" ")
    assert(score(fifty) == 0.8)
    val hundred = (1 to 100).map(i => s"w$i").mkString(" ")
    assert(score(hundred) == 0.8) // cap holds; diversity still 1
  }

  test("the stopRatio cap boundary: exactly 1-in-5 stopwords saturates " +
      "the 0.2 term (stopRatio·5 = 1), and 1-in-10 earns half of it") {
    // 10 tokens, 2 stopword hits -> ratio .2, term min(1,1)·0.2 = 0.2
    //   q = (10/50)·0.5 + 1.0·0.3 + 0.2 = 0.1 + 0.3 + 0.2 = 0.6
    val atCap = "the a w1 w2 w3 w4 w5 w6 w7 w8"
    assert(score(atCap) == 0.6)
    // 10 tokens, 1 hit -> ratio .1, term 0.5·0.2 = 0.1 -> q = 0.5
    val below = "the w1 w2 w3 w4 w5 w6 w7 w8 w9"
    assert(score(below) == 0.5)
  }

  test("a gate-relevant composite: the tx-family's q >= 0.5 threshold " +
      "sits between the repetition fixture and the stopword fixture") {
    assert(score("x x x x") < 0.5 && score("the a of and") >= 0.5)
  }
}
