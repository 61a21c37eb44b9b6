package graft

/** Independent-derivation golden for tx58_dup_span_coverage — the
  * InferenceGoldenSpec discipline applied to the span-merge machinery
  * on day one, instead of a round after it ships (the r11 lesson: the
  * DuckDB mirror is written by the same hand from the same derivation,
  * so a shared mistake is hash-green; a72/t_pettitt shipped
  * wrong-but-green for a full round that way).
  *
  * The recompute here is derivation-disjoint from BOTH engine mirrors
  * in every step that could hide a shared bug:
  *
  *  - dup detection on RAW GRAM STRINGS, not the charHash — equality
  *    therefore also witnesses that the shared hash is collision-free
  *    on this fixture (a collision would inflate the engine number
  *    but not the naive one);
  *  - interval merge by an explicit sorted fold with running (start,
  *    end) state — not a window running-max + island-id running-sum,
  *    so an off-by-one in the window frame bounds or in the
  *    adjacent-merge predicate (`s > pmax + 1`) cannot cancel;
  *  - per-doc and corpus totals accumulated in plain Longs.
  *
  * Two structural cases pin the semantics the naive fold and the
  * query must AGREE on: overlapping anchors merge into one span
  * (union length, no double count), and exactly-adjacent spans
  * (s2 = e1 + 1) merge into one maximal span.
  */
@graft.Golden
class DupSpanGoldenSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private val K = 8

  /** (covered, nSpans, maxSpan) from sorted anchor starts via an
    * explicit merge fold — the textbook merged-intervals loop.
    */
  private def mergeSpans(starts: Seq[Int]): (Long, Long, Long) = {
    var covered = 0L
    var n = 0L
    var maxLen = 0L
    var curS = -1
    var curE = -1
    def close(): Unit = if (curS >= 0) {
      val len = (curE - curS + 1).toLong
      covered += len
      n += 1
      maxLen = math.max(maxLen, len)
    }
    starts.sorted.foreach { s =>
      val e = s + K - 1
      if (curS < 0) { curS = s; curE = e }
      else if (s <= curE + 1) { curE = math.max(curE, e) }
      else { close(); curS = s; curE = e }
    }
    close()
    (covered, n, maxLen)
  }

  private def naive(ingest: Seq[(Long, String)])
      : (Long, Long, Long, Long, Long, Double, Long) = {
    val toksOf = ingest.map { case (id, t) => id -> t.split(" ", -1) }
    val occ = scala.collection.mutable.Map.empty[String, Int]
    toksOf.foreach { case (_, toks) =>
      var p = 0
      while (p + K <= toks.length) {
        val g = toks.slice(p, p + K).mkString(" ")
        occ.update(g, occ.getOrElse(g, 0) + 1)
        p += 1
      }
    }
    var nDocs = 0L; var docsWith = 0L; var nSpans = 0L
    var coveredTot = 0L; var tokTot = 0L; var maxSpan = 0L
    toksOf.foreach { case (_, toks) =>
      nDocs += 1
      tokTot += toks.length
      val anchors = (0 to toks.length - K).filter { p =>
        occ(toks.slice(p, p + K).mkString(" ")) >= 2
      }.map(_ + 1) // 1-based starts, as both engines compute them
      val (covered, n, mx) = mergeSpans(anchors)
      if (covered > 0) docsWith += 1
      nSpans += n
      coveredTot += covered
      maxSpan = math.max(maxSpan, mx)
    }
    val frac = BigDecimal(coveredTot.toDouble / tokTot.toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    (nDocs, docsWith, nSpans, coveredTot, tokTot, frac, maxSpan)
  }

  test("tx58 equals a raw-string naive recompute on the sf0.001 corpus") {
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val ingest = base ++
      base.filter(_._1 % 5 == 0).map { case (id, t) => (id + 700000L, t) }
    val exp = naive(ingest)
    // the fixture must actually exercise the machinery: the re-ingested
    // fifth of the corpus guarantees cross-doc duplicate spans
    assert(exp._2 > 0 && exp._4 > 0, s"fixture has no duplicated spans: $exp")

    val row = SparkEntry.queries("tx58_dup_span_coverage")(spark, sfDir)
      .collect().head
    assert(row.getLong(row.fieldIndex("n_docs")) == exp._1)
    assert(row.getLong(row.fieldIndex("docs_with_span")) == exp._2)
    assert(row.getLong(row.fieldIndex("n_spans")) == exp._3)
    assert(row.getLong(row.fieldIndex("covered_tokens")) == exp._4)
    assert(row.getLong(row.fieldIndex("total_tokens")) == exp._5)
    assert(row.getDouble(row.fieldIndex("corpus_dup_frac")) == exp._6)
    assert(row.getLong(row.fieldIndex("max_span_len")) == exp._7)
  }

  test("span semantics: overlap merges, exact adjacency merges") {
    // overlapping anchors 1,3 (k=8): union [1,10] -> one span, 10 tokens
    assert(mergeSpans(Seq(1, 3)) == (10L, 1L, 10L))
    // adjacent: [1,8] and [9,16] -> one maximal span of 16
    assert(mergeSpans(Seq(1, 9)) == (16L, 1L, 16L))
    // gap of one token: [1,8], [10,17] -> two spans
    assert(mergeSpans(Seq(1, 10)) == (16L, 2L, 8L))
    // duplicate of the identical anchor set collapses (distinct starts)
    assert(mergeSpans(Seq(5)) == (8L, 1L, 8L))
  }
}
