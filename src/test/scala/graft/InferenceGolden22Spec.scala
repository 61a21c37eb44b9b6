package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Published-value micro-goldens, part 22 — sixth gauge-steered round:
  * rate anomalies, structural holes, language ID, PII scrub, Dunning
  * keyness, leakage-safe splits, FD audit, and the Hilbert key.
  *
  *  - Rate anomaly: hand z = 10/sqrt(11) on a planted spike (all
  *    sufficient statistics exact), and the sd = 0 degenerate pinned
  *    to zero rows.
  *  - Local bridges (Granovetter): a hand triangle-plus-pendant — the
  *    pendant edge is the only edge in no triangle.
  *  - Language ID: hand marker counts, the cross-language confusion
  *    cell, and the zero-marker 'und' fallback.
  *  - PII: the planted id-derived address is found exactly once and
  *    the scrub leaves zero residual (the self-certifying theorem).
  *  - Dunning G2: a term exclusive to one half of a balanced corpus
  *    scores exactly 2*(a+db)*ln 2.
  *  - Leakage-safe split: groups_straddling = 0 is STRUCTURAL (same
  *    group => same hash); the naive-leak count and split sizes are
  *    replayed with the independent polynomial hash.
  *  - FD audit: hand violation counts and repair lower bounds
  *    (excess = sum(k-1)).
  *  - Hilbert: the query's unrolled walk must agree with the
  *    canonical published xy2d (rot/reflect per bit level) replayed
  *    imperatively, per-file aggregates compared on scattered points.
  */
@graft.Golden
class InferenceGolden22Spec extends SparkSpec {

  private def fixture(name: String, tables: (String, DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"golden22_$name").toString
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

  private def docsOf(rows: Seq[(Long, String, String, String)]): DataFrame = {
    import spark.implicits._
    rows.map { case (id, src, lang, text) =>
      (id, text, lang, src, text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  private def polyHash(s: String): Long =
    s.foldLeft(7L)((acc, ch) => (acc * 31 + ch.toInt) % 1000000007L)

  // ===================================================================
  // 1. Rate anomaly — hand z on a planted spike; sd = 0 degenerate
  // ===================================================================

  test("t_rate_anomaly flags exactly the spike at z = 10/sqrt(11); an " +
      "all-equal series yields zero rows (the sd = 0 pin)") {
    var eid = 0L
    def hour(h: Long, c: Long) = (1L to c).map { i =>
      eid += 1; (eid, Day0 + h * 3600L + i, eid % 7, "view", 1.0)
    }
    // ten hours of 10 plus one hour of 21: mu = 11, sd = sqrt(11)
    val rows = (0L to 9L).flatMap(h => hour(h, 10L)) ++ hour(10L, 21L)
    val out = run("t_rate_anomaly", fixture("ra", "events" -> eventsRows(rows)))
      .map(r => (r.getAs[Long]("cnt"), r.getAs[Double]("z")))
    assert(out.toSeq == Seq((21L, round6(10.0 / math.sqrt(11.0)))))

    var eid2 = 1000L
    val flat = (0L to 9L).flatMap { h =>
      (1L to 5L).map { i => eid2 += 1; (eid2, Day0 + h * 3600L + i, eid2 % 7, "view", 1.0) }
    }
    assert(run("t_rate_anomaly",
      fixture("ra0", "events" -> eventsRows(flat))).isEmpty)
  }

  // ===================================================================
  // 2. Local bridges — triangle closes, the pendant stays open
  // ===================================================================

  test("g16_local_bridges: in a triangle-plus-pendant co-purchase graph " +
      "only the pendant edge is a bridge (no shared neighbor)") {
    import spark.implicits._
    // each edge needs >= 2 co-orders; parts {1,2,3} form a triangle,
    // (3,4) is the pendant
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
    var ok = 0L
    val li = edges.flatMap { case (u, v) =>
      Seq.fill(2) { ok += 1; Seq((ok, u), (ok, v)) }.flatten
    }.toDF("l_orderkey", "l_partkey")
    val out = run("g16_local_bridges", fixture("lb", "lineitem" -> li))
      .map(r => (r.getAs[Long]("u"), r.getAs[Long]("v"),
        r.getAs[Long]("deg_u"), r.getAs[Long]("deg_v"),
        r.getAs[Long]("n_edges"), r.getAs[Long]("n_bridges"),
        r.getAs[Double]("bridge_frac")))
    assert(out.toSeq == Seq((3L, 4L, 3L, 1L, 4L, 1L, 0.25)))
  }

  // ===================================================================
  // 3. Language ID — hand marker counts, confusion cell, 'und' fallback
  // ===================================================================

  test("tx3_lang_confusion: marker argmax by hand — the mislabeled doc " +
      "lands off-diagonal, the zero-marker doc predicts 'und'") {
    val dir = fixture("lc", "documents" -> docsOf(Seq(
      (1L, "s", "en", "the the a of"),  // en markers -> en (diagonal)
      (2L, "s", "en", "el la de y"),    // es markers -> es (confusion)
      (3L, "s", "es", "el la x"),       // -> es (diagonal)
      (4L, "s", "xx", "zz qq"))))       // no markers -> und
    val out = run("tx3_lang_confusion", dir)
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("pred"),
        r.getAs[Long]("cnt")))
    assert(out.toSeq == Seq(
      ("en", "en", 1L), ("en", "es", 1L), ("es", "es", 1L), ("xx", "und", 1L)))
  }

  // ===================================================================
  // 4. PII — the planted address found once, zero residual
  // ===================================================================

  test("tx14_pii_scrub finds the planted address exactly once and the " +
      "redaction leaves zero residual") {
    // doc 7 (doc_id % 7 == 0) receives ' contact u7@example.com'
    val docs = (1L to 7L).map(i => (i, "s", "en", s"plain text $i"))
    val out = run("tx14_pii_scrub", fixture("pii", "documents" ->
      docsOf(docs))).head
    assert(out.getAs[Long]("n_docs") == 7L)
    assert(out.getAs[Long]("total_pii") == 1L)
    assert(out.getAs[Long]("docs_with_pii") == 1L)
    assert(out.getAs[Long]("residual_after_scrub") == 0L)
  }

  // ===================================================================
  // 5. Dunning G2 — the exclusive-term closed form 2(a+db)ln2
  // ===================================================================

  test("tx30_distinctive_terms: a term exclusive to one half of a " +
      "balanced corpus scores exactly 2*(5+5)*ln 2 (Dunning 1993)") {
    val dir = fixture("g2", "documents" -> docsOf(Seq(
      (1L, "src0", "en", "x x x x x"),
      (2L, "src1", "en", "y y y y y"))))
    val out = run("tx30_distinctive_terms", dir)
      .map(r => (r.getAs[String]("term"), r.getAs[Long]("cnt_target"),
        r.getAs[Long]("cnt_rest"), r.getAs[Double]("g2")))
    val g2 = round6(2.0 * (5.0 * math.log(5.0 / 2.5) + 5.0 * math.log(5.0 / 2.5)))
    assert(out.toSeq == Seq(("x", 5L, 0L, g2), ("y", 0L, 5L, g2)))
    assert(g2 == 13.862944) // 20 ln 2, the hand value
  }

  // ===================================================================
  // 6. Leakage-safe split — the structural zero + the replayed leak
  // ===================================================================

  test("tx44_leakage_safe_split: groups never straddle (structural); " +
      "the naive doc-hash leak and split sizes replay the polynomial hash") {
    // docs 1,2 identical (one near-dup cluster, grp = 1); 3,4 singletons
    val docs = Seq(
      (1L, "s", "en", "alpha beta gamma delta epsilon"),
      (2L, "s", "en", "alpha beta gamma delta epsilon"),
      (3L, "s", "en", "one two three four five"),
      (4L, "s", "en", "six seven eight nine ten"))
    val grpOf = Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 4L)
    def split(g: Long) = polyHash(g.toString) % 10L
    val splits = grpOf.values.toSeq.map(split) // per doc via its group
    val perDoc = grpOf.toSeq.map { case (_, g) => split(g) }
    val nTrain = perDoc.count(_ < 8L).toLong
    val nVal = perDoc.count(_ == 8L).toLong
    val nTest = perDoc.count(_ == 9L).toLong
    // naive leak: the {1,2} cluster's per-doc hashes differ
    val naiveLeak =
      if (polyHash("1") % 10L != polyHash("2") % 10L) 1L else 0L
    val out = run("tx44_leakage_safe_split",
      fixture("lss", "documents" -> docsOf(docs))).head
    assert(out.getAs[Long]("groups_straddling") == 0L) // the theorem
    assert(out.getAs[Long]("groups_leaking_naive") == naiveLeak)
    assert((out.getAs[Long]("n_train"), out.getAs[Long]("n_val"),
      out.getAs[Long]("n_test")) == ((nTrain, nVal, nTest)))
  }

  // ===================================================================
  // 7. FD audit — hand violation counts and repair lower bounds
  // ===================================================================

  test("audit_functional_deps counts hand violations: excess is the " +
      "minimum repair size sum(k - 1)") {
    import spark.implicits._
    val li = Seq((1L, "A"), (1L, "B"), (2L, "A"), (2L, "A"))
      .toDF("l_orderkey", "l_returnflag")
    val ords = Seq((1L, 1L, "P1"), (2L, 1L, "P2"), (3L, 2L, "P1"))
      .toDF("o_orderkey", "o_custkey", "o_orderpriority")
    val docs = docsOf(Seq(
      (1L, "s", "en", "t1"), (2L, "s", "en", "t2"),
      (3L, "t", "en", "t3"), (4L, "t", "es", "t4"), (5L, "t", "de", "t5")))
    val out = run("audit_functional_deps", fixture("fd",
      "lineitem" -> li, "orders" -> ords, "documents" -> docs))
      .map(r => (r.getAs[String]("fd"), r.getAs[Long]("n_det"),
        r.getAs[Long]("n_violating"), r.getAs[Long]("excess")))
    assert(out.toSeq == Seq(
      ("documents: source -> lang", 2L, 1L, 2L),
      ("lineitem: l_orderkey -> l_returnflag", 2L, 1L, 1L),
      ("orders: o_custkey -> o_orderpriority", 2L, 1L, 1L)))
  }

  // ===================================================================
  // 8. Hilbert — the canonical published xy2d, replayed imperatively
  // ===================================================================

  /** The standard xy2d walk (quadrant digit + reflect-swap rotation
    * per bit level) — the published imperative form, independent of
    * the query's unrolled Column chain.
    */
  private def xy2d(x0: Long, y0: Long): Long = {
    var x = x0; var y = y0; var d = 0L; var s = 128L
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s /= 2
    }
    d
  }

  test("layout_hilbert agrees with the canonical imperative xy2d on " +
      "scattered points (per-file aggregates at grain 96)") {
    val pts = Seq((0L, 0L), (255L, 0L), (0L, 255L), (255L, 255L),
      (16L, 16L), (100L, 50L), (7L, 200L))
    val rows = pts.zipWithIndex.map { case ((x, y), i) =>
      ((i + 1).toLong, Day0 + i + 1L, y, "view", 2.0 * x)
    }
    val expected = pts.groupBy { case (x, y) => xy2d(x, y) / 96L }
      .map { case (f, xs) =>
        f -> (xs.size.toLong, xs.map(_._1).min, xs.map(_._1).max,
          xs.map(_._2).min, xs.map(_._2).max)
      }
    val out = run("layout_hilbert",
      fixture("hil", "events" -> eventsRows(rows)))
      .map(r => r.getAs[Long]("hfile") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("x_min"),
          r.getAs[Long]("x_max"), r.getAs[Long]("y_min"),
          r.getAs[Long]("y_max"))).toMap
    assert(out == expected)
  }
}
