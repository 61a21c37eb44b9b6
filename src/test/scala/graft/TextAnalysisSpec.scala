package graft

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, TextAnalysis}

/** Unit coverage for the text-analysis and exact-dedup operators
  * (TextQueries surface). Oracle parity is covered by the driver gate;
  * these pin the semantics on hand-checkable inputs.
  */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String, c: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
    Seq(text).toDF("text").select(c(col("text"))).head()

  test("tokenCount / distinctTokenCount / wordCount on a known sentence") {
    val t = "the cat and the hat"
    assert(one(t, TextAnalysis.tokenCount).getInt(0) == 5)
    assert(one(t, TextAnalysis.distinctTokenCount).getInt(0) == 4)
    assert(one(t, TextAnalysis.wordCount(_, "the")).getInt(0) == 2)
    assert(one(t, TextAnalysis.wordCount(_, "dog")).getInt(0) == 0)
  }

  test("native token_freqs == per-word composed filter counts") {
    val words = Seq("the", "a", "and", "of")
    val texts = Seq(
      "the cat and the hat of a cat",
      "no stopwords here whatsoever",
      "") // empty text → split yields [""] → zero matches
    val df = texts.toDF("text")
      .select(split(col("text"), " ").as("toks"))
    val diff = df.select(
        TextAnalysis.wordFreqs(col("toks"), words).as("fast"),
        array(words.map(w => TextAnalysis.wordCountIn(col("toks"), w).cast("long")): _*).as("ref"))
      .filter(col("fast") =!= col("ref"))
    assert(diff.isEmpty, diff.collect().mkString(","))
  }

  test("avgTokenLen: (chars - separators) / tokens") {
    // "ab cde" -> 5 letter chars / 2 tokens = 2.5
    assert(one("ab cde", TextAnalysis.avgTokenLen).getDouble(0) == 2.5)
  }

  test("qualityScore stays in [0,1] and rewards diverse stopword-bearing text") {
    val rich = ("the quick brown fox jumps over a lazy dog of unusual size and " +
      "temperament walking along the river bank at dawn with great care and poise " +
      "under a pale sky of drifting clouds while birds sing softly in the trees")
    val poor = "x x x x x"
    val rs = one(rich, TextAnalysis.qualityScore).getDouble(0)
    val ps = one(poor, TextAnalysis.qualityScore).getDouble(0)
    assert(rs >= 0.0 && rs <= 1.0 && ps >= 0.0 && ps <= 1.0)
    assert(rs > ps)
  }

  test("qualityScoreParts == qualityScoreTokens through the tx2/tx17 parts " +
      "route (round-15 declarative audit: the en-block coupling pinned)") {
    // the Parts callers (tx2_quality_hist, the tx17-family enrichment)
    // feed stopHits = stopHitsFromFreqs(wordFreqs(toks, allMarkerWords))
    // — the EN BLOCK of the 16-word marker freqs — relying on
    // allMarkerWords' first four words being exactly qualityStopwords.
    // InferenceGolden37Spec pins the Tokens formula; this pins the
    // Parts route to it on texts exercising every term (stopword-rich,
    // stopword-free, repetitive, >50-token saturation, other-language
    // markers that must NOT count as stopHits).
    val texts = Seq(
      "the quick brown fox and a dog of great size",
      "xyzzy qwerty plugh verdigris",
      "x x x x x x x x",
      Seq.fill(30)("the of a and").mkString(" "), // 120 tokens, saturated
      "el gato y la casa de madera und der hund", // es/de markers, no en
      "the the the the")
    val df = texts.toDF("text")
      .withColumn("__toks", TextAnalysis.tokens(col("text")))
    val both = df.select(
      TextAnalysis.qualityScoreTokens(col("__toks")).as("tok"),
      TextAnalysis.qualityScoreParts(
        size(col("__toks")),
        size(array_distinct(col("__toks"))),
        TextAnalysis.stopHitsFromFreqs(
          TextAnalysis.wordFreqs(col("__toks"), TextAnalysis.allMarkerWords)))
        .as("parts"))
      .collect()
    both.foreach(r => assert(r.getDouble(0) == r.getDouble(1), r.toString))
  }

  test("langId predicts by stopword hits with deterministic tie order") {
    assert(one("the cat sat on a mat of straw and wool", TextAnalysis.langId).getString(0) == "en")
    assert(one("el gato y la casa de madera", TextAnalysis.langId).getString(0) == "es")
    assert(one("der hund und die katze", TextAnalysis.langId).getString(0) == "de")
    assert(one("xyzzy qwerty plugh", TextAnalysis.langId).getString(0) == "und")
  }

  test("fingerprint is md5 hex") {
    assert(one("abc", TextAnalysis.fingerprint).getString(0)
      == "900150983cd24fb0d6963f7d28e17f72")
  }

  test("adjacentPairs: n-1 pairs, empty for 0/1-token docs") {
    def pairs(t: String): Seq[String] =
      one(t, c => TextAnalysis.adjacentPairs(TextAnalysis.tokens(c)))
        .getSeq[String](0)
    assert(pairs("a b c") == Seq("a b", "b c"))
    assert(pairs("solo") == Seq.empty)
    assert(pairs("") == Seq.empty) // split("") = [""] → one token, no pairs
  }

  test("dup ratios: repeats score high, all-distinct scores 0, short docs 0") {
    def ratios(t: String): (Double, Double) = {
      val r = Seq(t).toDF("text")
        .select(TextAnalysis.dupTokenRatio(TextAnalysis.tokens(col("text"))),
          TextAnalysis.dup2gramRatio(TextAnalysis.tokens(col("text"))))
        .head()
      (r.getDouble(0), r.getDouble(1))
    }
    assert(ratios("a b c d") == ((0.0, 0.0)))
    // "x y x y x y": 6 tokens 2 distinct → 4/6; 5 pairs 2 distinct → 3/5
    val (dt, d2) = ratios("x y x y x y")
    assert(math.abs(dt - 4.0 / 6) < 1e-12 && math.abs(d2 - 3.0 / 5) < 1e-12)
    assert(ratios("solo")._2 == 0.0) // <2 tokens → defined as 0
  }

  test("overlappingChunks: stride windows, end truncation, ≥1 chunk always") {
    def chunks(t: String, size: Int, stride: Int): Seq[Seq[String]] =
      Seq(t).toDF("text")
        .select(TextAnalysis.overlappingChunks(
          TextAnalysis.tokens(col("text")), size, stride))
        .head().getSeq[Seq[String]](0)
    val ten = (1 to 10).map("w" + _).mkString(" ")
    // size 4, stride 3 over 10 tokens: starts 0,3,6,9 → last truncates
    assert(chunks(ten, 4, 3) == Seq(
      Seq("w1", "w2", "w3", "w4"), Seq("w4", "w5", "w6", "w7"),
      Seq("w7", "w8", "w9", "w10"), Seq("w10")))
    // exact boundary: 6 tokens, size 3, stride 3 → exactly 2 full chunks
    val six = (1 to 6).map("w" + _).mkString(" ")
    assert(chunks(six, 3, 3) == Seq(Seq("w1", "w2", "w3"), Seq("w4", "w5", "w6")))
    assert(chunks("", 4, 3) == Seq(Seq(""))) // empty text → one 1-token chunk
    // EMPTY token array (unreachable via tokens, legal for the public
    // primitive): the greatest(…,0) guard must stop sequence(0,-1)
    // from descending into two garbage chunks
    val emptyArr = Seq(Seq.empty[String]).toDF("toks")
      .select(TextAnalysis.overlappingChunks(col("toks"), 4, 3))
      .head().getSeq[Seq[String]](0)
    assert(emptyArr == Seq(Seq.empty[String]), emptyArr.toString)
  }

  test("exactKeepFirst keeps the smallest-order row per key") {
    val df = Seq((1L, "a", "x"), (2L, "a", "y"), (3L, "b", "z"))
      .toDF("id", "key", "payload")
    val kept = Dedup.exactKeepFirst(df, Seq(col("key")), Seq(col("id")))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(2)))
    assert(kept.toSeq == Seq((1L, "x"), (3L, "z")))
  }

  test("exactSummary counts rows / uniques / dups") {
    val df = Seq("a", "a", "b", "c", "c", "c").toDF("text")
    val r = Dedup.exactSummary(df, col("text")).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((6L, 3L, 3L)))
  }

  test("count-min sketch token frequencies track exact counts (sketch surface)") {
    // the constant-memory frequency sketch for 100 TB vocab triage:
    // mergeable across partitions, overestimates only
    val tokens = (Seq.fill(500)("the") ++ Seq.fill(100)("spark") ++
      (1 to 400).map(i => s"rare$i")).toDF("token")
    val bytes = tokens
      .select(expr("count_min_sketch(token, 0.0001d, 0.99d, 42)"))
      .head().getAs[Array[Byte]](0)
    val sketch = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(bytes))
    assert(sketch.estimateCount("the") >= 500 && sketch.estimateCount("the") <= 520)
    assert(sketch.estimateCount("spark") >= 100 && sketch.estimateCount("spark") <= 120)
    assert(sketch.estimateCount("absent") <= 20)
  }

  test("approxDistinct lands within the rsd bound on distinct-heavy input") {
    val df = (1 to 2000).map(i => s"doc-$i").toDF("text")
    val r = Dedup.approxDistinct(df, col("text"), rsd = 0.02).head()
    val est = r.getLong(0)
    assert(math.abs(est - 2000.0) / 2000.0 < 0.1)
    assert(r.getLong(1) == 2000L)
  }
}
