package graft

import org.apache.spark.sql.functions._

import graft.ext.TextAnalysis

/** Property tests: the text primitives vs brute-force Scala on random
  * inputs — including whitespace pathologies (leading/trailing/double
  * spaces produce empty tokens in BOTH Spark `split` and DuckDB
  * `string_split`; locking that here keeps the oracle mirrors honest).
  */
class TextPropertySpec extends SparkSpec {
  import spark.implicits._

  /** Random strings over a 3-letter alphabet plus space runs, biased
    * toward short docs and edge shapes (empty, single token, trailing
    * space).
    */
  private def randomTexts(n: Int, seed: Long): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    val words = Seq("a", "b", "ab", "ba", "abc")
    (1 to n).map { _ =>
      rnd.nextInt(10) match {
        case 0 => ""
        case 1 => words(rnd.nextInt(words.length))
        case 2 => words(rnd.nextInt(words.length)) + " " // trailing space
        case 3 => " " + words(rnd.nextInt(words.length)) // leading space
        case _ =>
          val len = 1 + rnd.nextInt(40)
          (1 to len).map { _ =>
            if (rnd.nextInt(8) == 0) "" else words(rnd.nextInt(words.length))
          }.mkString(" ") // empty picks create double spaces
      }
    }
  }

  private def toks(s: String): Seq[String] = s.split(" ", -1).toSeq

  test("shingleHashList == shingles∘charHash WITH duplicates kept") {
    import graft.ext.NearDup
    val texts = randomTexts(150, seed = 23)
    val got = texts.toDF("text")
      .select(NearDup.shingleHashList(split(col("text"), " "), 3).as("hl"))
      .collect().map(_.getSeq[Long](0).toSeq)
    // brute force: every positional 3-shingle (duplicates kept, no
    // distinct), hashed with the shared polynomial hash
    def polyHash(s: String): Long =
      s.foldLeft(7L)((acc, ch) => (acc * 31 + ch.toLong) % 1000000007L)
    val expected = texts.map { t =>
      val tk = toks(t)
      if (tk.length < 3) Seq.empty[Long]
      else tk.sliding(3).map(w => polyHash(w.mkString(" "))).toSeq
    }
    got.zip(expected).zipWithIndex.foreach { case ((g, e), i) =>
      assert(g == e, s"text ${i}: '${texts(i)}'")
    }
  }

  test("map_zip_with integer dot == brute-force sparse dot") {
    val rnd = new scala.util.Random(31)
    val cases = (1 to 60).map { _ =>
      def vec = (1 to rnd.nextInt(8)).map(_ =>
        rnd.nextInt(6).toLong -> (1L + rnd.nextInt(5))).toMap
      (vec, vec)
    }
    val dotExpr = aggregate(
      map_values(map_zip_with(col("a"), col("b"),
        (_, x, y) => coalesce(x, lit(0L)) * coalesce(y, lit(0L)))),
      lit(0L), (acc, v) => acc + v)
    val got = cases.toDF("a", "b").select(dotExpr.as("dot"))
      .collect().map(_.getLong(0)).toSeq
    val expected = cases.map { case (a, b) =>
      a.keySet.intersect(b.keySet).toSeq.map(k => a(k) * b(k)).sum
    }
    assert(got == expected)
  }

  test("adjacentPairs == sliding(2) brute force (incl. empty/1-token)") {
    val texts = randomTexts(200, seed = 11)
    val got = texts.toDF("text")
      .select(TextAnalysis.adjacentPairs(TextAnalysis.tokens(col("text"))))
      .collect().map(_.getSeq[String](0))
    texts.zip(got).foreach { case (t, pairs) =>
      val want =
        if (toks(t).size < 2) Seq.empty
        else toks(t).sliding(2).map(_.mkString(" ")).toSeq
      assert(pairs == want, s"text=[$t]")
    }
  }

  test("dup ratios == brute force") {
    val texts = randomTexts(200, seed = 17)
    val got = texts.toDF("text")
      .select(TextAnalysis.dupTokenRatio(TextAnalysis.tokens(col("text"))),
        TextAnalysis.dup2gramRatio(TextAnalysis.tokens(col("text"))))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    texts.zip(got).foreach { case (t, (dt, d2)) =>
      val ts = toks(t)
      val wantDt = 1.0 - ts.distinct.size.toDouble / ts.size
      val wantD2 =
        if (ts.size < 2) 0.0
        else {
          val grams = ts.sliding(2).map(_.mkString(" ")).toSeq
          1.0 - grams.distinct.size.toDouble / grams.size
        }
      assert(math.abs(dt - wantDt) < 1e-12, s"dupTok text=[$t]")
      assert(math.abs(d2 - wantD2) < 1e-12, s"dup2 text=[$t]")
    }
  }

  test("overlappingChunks == brute-force window slices for random geometries") {
    val rnd = new scala.util.Random(23)
    val texts = randomTexts(120, seed = 23)
    for (_ <- 1 to 4) {
      val stride = 1 + rnd.nextInt(5)
      val size = stride + rnd.nextInt(4) // size >= stride (overlap or abut)
      val got = texts.toDF("text")
        .select(TextAnalysis.overlappingChunks(
          TextAnalysis.tokens(col("text")), size, stride))
        .collect().map(_.getSeq[Seq[String]](0))
      texts.zip(got).foreach { case (t, chunks) =>
        val ts = toks(t)
        val starts = 0 to ((ts.size - 1) / stride)
        val want = starts.map(i => ts.slice(i * stride, i * stride + size))
        assert(chunks == want, s"text=[$t] size=$size stride=$stride")
      }
    }
  }

  test("tokenCount/distinctTokenCount == split(-1) brute force on ragged spacing") {
    val texts = randomTexts(200, seed = 29)
    val got = texts.toDF("text")
      .select(TextAnalysis.tokenCount(col("text")),
        TextAnalysis.distinctTokenCount(col("text")))
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    texts.zip(got).foreach { case (t, (n, d)) =>
      assert(n == toks(t).size && d == toks(t).distinct.size, s"text=[$t]")
    }
  }
}
