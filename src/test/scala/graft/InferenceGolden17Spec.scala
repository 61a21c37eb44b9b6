package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Published-value micro-goldens, part 17 — third gauge-steered round:
  * the interval/as-of join tail, the deterministic split/sample
  * family, the graph-descriptive tail, and the layout keys. Anchors:
  *
  *  - Interval union: hand gaps-and-islands, including the pinned
  *    touching-intervals rule (st == prev end MERGES — `st > pmax`
  *    is strict) and containment.
  *  - Nearest as-of: hand prior/next/equal-gap/equal-timestamp/
  *    no-click cases against pandas merge_asof 'nearest' semantics
  *    (tie -> prior; same-ts click sorts before the purchase).
  *  - PIT join: hand effective-dated history — a fact dated between
  *    versions reads the EARLIER one, a fact on the version date
  *    reads the new one, a fact before the first version reads NULL
  *    (the leakage bucket).
  *  - Splits/samples: the assignment is a pure function of the
  *    content/group/id hash — replayed with an independent
  *    plain-Scala polynomial fold (and java MessageDigest for the
  *    md5 ranking), so the expected split sizes, group atomicity,
  *    exact-k and the exact kept SET are all derived outside the
  *    engines.
  *  - Neighbor Jaccard: hand J values where two niche suppliers at
  *    J = 1 outrank giants (the normalization the raw co-occurrence
  *    count lacks), plus the >50-degree hub prune.
  *  - Seed harmonic: hand depth-2 Rochat harmonic (x2-scaled integer
  *    reciprocals) on a 3-node path from the seed.
  *  - Degree tail: floor(log2 deg) as integer bit length on a hand
  *    K5-plus-an-edge co-purchase graph.
  *  - Z-order: hand Morton codes, including the 63 -> 64 quadrant
  *    seam (z(7,7) = 63, z(8,0) = 64) that defines the file split.
  */
@graft.Golden
class InferenceGolden17Spec extends SparkSpec {

  private def fixture(name: String, tables: (String, DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"golden17_$name").toString
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

  private val Day0 = 1704067200L

  private def eventsRows(
      rows: Seq[(Long, Long, Long, String, Double)]): DataFrame = {
    import spark.implicits._
    rows.toDF("event_id", "sec", "user_id", "event_type", "value")
      .select(col("event_id"), timestamp_seconds(col("sec")).as("ts"),
        col("user_id"), col("event_type"), col("value"),
        lit("{}").as("props"))
  }

  // ===================================================================
  // 1. Interval union — islands by hand, touching intervals merge
  // ===================================================================

  test("j16_interval_union merges overlapping, contained AND touching " +
      "intervals into hand-derived islands") {
    // user 1: [0,10s) ∪ [5s,8s) (contained) ∪ [10s,12s) (touching —
    // st == running max end, and the rule is STRICTLY st > pmax, so
    // it merges) -> one island covering 12000 ms; [20s,21s) -> second
    // island, 1000 ms. user 2: one interval.
    val rows = Seq(
      (1L, Day0 + 0L, 1L, "view", 10.0),
      (2L, Day0 + 5L, 1L, "view", 3.0),
      (3L, Day0 + 10L, 1L, "view", 2.0),
      (4L, Day0 + 20L, 1L, "view", 1.0),
      (5L, Day0 + 100L, 2L, "view", 5.0))
    val out = run("j16_interval_union",
      fixture("iu", "events" -> eventsRows(rows)))
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_islands"),
        r.getAs[Long]("covered_ms")))
    assert(out.toSeq == Seq((1L, 2L, 13000L), (2L, 1L, 5000L)))
  }

  // ===================================================================
  // 2. Nearest as-of — merge_asof 'nearest' semantics by hand
  // ===================================================================

  test("j17_asof_nearest: prior/next by smaller gap, equal gap breaks " +
      "to prior, same-timestamp click is the prior, no clicks -> NULL") {
    def click(id: Long, u: Long, t: Long, cents: Long) =
      (id, Day0 + t, u, "click", cents / 100.0)
    def purch(id: Long, u: Long, t: Long) =
      (id, Day0 + t, u, "purchase", 9.99)
    val rows = Seq(
      click(1L, 1L, 10L, 100L), click(2L, 1L, 30L, 300L),
      purch(11L, 1L, 18L), // gaps 8 vs 12 -> prior
      purch(12L, 1L, 26L), // gaps 16 vs 4 -> next
      purch(13L, 1L, 20L), // gaps 10 vs 10 -> tie -> prior
      purch(14L, 2L, 5L),  // no clicks -> NULL
      click(3L, 3L, 30L, 200L),
      purch(15L, 3L, 30L)) // same ts: click sorts first -> prior, gap 0
    val out = run("j17_asof_nearest",
      fixture("an", "events" -> eventsRows(rows)))
      .map(r => r.getAs[Long]("event_id") ->
        (Option(r.getAs[String]("dir")),
          Option(r.getAs[Any]("gap_ms")).map(_.asInstanceOf[Long]),
          Option(r.getAs[Any]("click_cents")).map(_.asInstanceOf[Long])))
      .toMap
    assert(out(11L) == ((Some("prior"), Some(8000L), Some(100L))))
    assert(out(12L) == ((Some("next"), Some(4000L), Some(300L))))
    assert(out(13L) == ((Some("prior"), Some(10000L), Some(100L))))
    assert(out(14L) == ((None, None, None)))
    assert(out(15L) == ((Some("prior"), Some(0L), Some(200L))))
  }

  // ===================================================================
  // 3. PIT join — version visibility by hand, incl. the leakage bucket
  // ===================================================================

  test("j7_pit_join stamps each fact with the version valid AT fact " +
      "time: between-versions reads the earlier, on-the-date reads the " +
      "new, before-first reads NULL") {
    import spark.implicits._
    val ords = Seq(
      (1L, 1L, "A", java.sql.Date.valueOf("2024-01-01")),
      (2L, 1L, "B", java.sql.Date.valueOf("2024-02-01")))
      .toDF("o_orderkey", "o_custkey", "o_orderpriority", "o_orderdate")
    val li = Seq(
      (1L, java.sql.Date.valueOf("2023-12-30"), 1.0), // before v1 -> NULL
      (1L, java.sql.Date.valueOf("2024-01-15"), 2.0), // inside v1 -> A
      (1L, java.sql.Date.valueOf("2024-02-01"), 3.0), // ON v2's date -> B
      (2L, java.sql.Date.valueOf("2024-02-05"), 4.0)) // inside v2 -> B
      .toDF("l_orderkey", "l_shipdate", "l_quantity")
    val out = run("j7_pit_join",
      fixture("pit", "orders" -> ords, "lineitem" -> li))
      .map(r => (Option(r.getAs[String]("prio")), r.getAs[Long]("n_ship"),
        r.getAs[Double]("sum_qty")))
    assert(out.toSeq == Seq(
      (None, 1L, 1.0), (Some("A"), 1L, 2.0), (Some("B"), 2L, 7.0)))
  }

  // ===================================================================
  // 4-6. Deterministic splits/samples — independent hash replays
  // ===================================================================

  /** NearDup.charHash replayed: polynomial codepoint fold, seed 7,
    * mod P = 1000000007 (NearDupSpec proves the native expression
    * equals this fold; here it derives the EXPECTED assignments).
    */
  private def polyHash(s: String): Long =
    s.foldLeft(7L)((acc, ch) => (acc * 31 + ch.toInt) % 1000000007L)

  private def docsOf(rows: Seq[(Long, String, String)]): DataFrame = {
    import spark.implicits._
    rows.map { case (id, src, text) =>
      (id, text, "en", src, text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("split_train_holdout assignments replay the content hash: " +
      "expected split sizes derived outside the engines") {
    val texts = (1 to 40).map(i => s"document number $i about topic ${i % 5}")
    val docs = texts.zipWithIndex.map { case (t, i) => ((i + 1).toLong, "s", t) }
    def splitOf(t: String): String = {
      val b = polyHash(t) % 100
      if (b < 80) "train" else if (b < 90) "validation" else "test"
    }
    val expected = texts.groupBy(splitOf).view.mapValues(_.size.toLong).toMap
    val out = run("split_train_holdout",
      fixture("sth", "documents" -> docsOf(docs)))
      .map(r => r.getAs[String]("split") -> r.getAs[Long]("n_docs")).toMap
    assert(out == expected)
    assert(expected.values.sum == 40L) // a partition: every doc in exactly one split
  }

  test("split_group_aware: whole groups move together (atomicity), " +
      "assignments replay the GROUP hash") {
    val sources = Seq("alpha", "beta", "gamma", "delta", "epsilon")
    val docs = for {
      (src, si) <- sources.zipWithIndex; j <- 1 to 4
    } yield ((si * 10 + j).toLong, src, s"text $src $j")
    def splitOf(src: String): String = {
      val b = polyHash(src) % 100
      if (b < 80) "train" else if (b < 90) "validation" else "test"
    }
    val bySplit = sources.groupBy(splitOf)
    val out = run("split_group_aware",
      fixture("sga", "documents" -> docsOf(docs)))
      .map(r => r.getAs[String]("split") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_sources"))).toMap
    val expected = bySplit.view.mapValues(ss =>
      (ss.size.toLong * 4L, ss.size.toLong)).toMap
    assert(out == expected)
    // atomicity is visible in the shape itself: n_docs == 4 * n_sources
    out.values.foreach { case (nd, ns) => assert(nd == 4L * ns) }
  }

  test("sample_exact_k keeps exactly k per large group (all of a small " +
      "one), and the kept SET replays the md5 ranking") {
    // source big: 12 docs -> exactly 7 kept, the 7 smallest by
    // (md5(doc_id), doc_id); source tiny: 3 docs -> all kept
    val docs = (1L to 12L).map(i => (i, "big", s"b $i")) ++
      (101L to 103L).map(i => (i, "tiny", s"t $i"))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expectedBig = (1L to 12L).sortBy(i => (md5hex(i.toString), i))
      .take(7).sum
    val out = run("sample_exact_k",
      fixture("sek", "documents" -> docsOf(docs)))
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_kept"), r.getAs[Long]("kept_id_sum"))).toMap
    assert(out("big") == ((7L, expectedBig)))
    assert(out("tiny") == ((3L, 101L + 102L + 103L)))
  }

  test("sample_stratified rates replay the per-doc content hash") {
    val docs = (1 to 30).map(i => (i.toLong, if (i <= 15) "a" else "b",
      s"content piece $i"))
    def kept(t: String): Boolean = polyHash(t) % 10 == 0
    val expected = docs.groupBy(_._2).view.mapValues { ds =>
      (ds.size.toLong, ds.count(d => kept(d._3)).toLong)
    }.toMap
    val out = run("sample_stratified",
      fixture("sst", "documents" -> docsOf(docs)))
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_sampled"))).toMap
    assert(out == expected)
  }

  // ===================================================================
  // 7. Neighbor Jaccard — niche beats giants; the hub prune
  // ===================================================================

  private def purchases(rows: Seq[(Long, Long)]): Seq[(String, DataFrame)] = {
    import spark.implicits._
    val ords = rows.zipWithIndex.map { case ((c, _), i) => (i.toLong + 1, c) }
      .toDF("o_orderkey", "o_custkey")
    val li = rows.zipWithIndex.map { case ((_, s), i) => (i.toLong + 1, s) }
      .toDF("l_orderkey", "l_suppkey")
    Seq("orders" -> ords, "lineitem" -> li)
  }

  test("g8_neighbor_jaccard: J = c12/(d1+d2-c12) by hand — full overlap " +
      "at J = 1 outranks the bigger partial overlap; hub customers " +
      "above the degree cap are pruned") {
    // custs 1-3 buy ONLY supps 1,2 -> J(1,2) = 3/(3+3-3) = 1
    // custs 4-7 buy supps 3 AND 4; custs 8,9 buy supp 3 alone ->
    // d3 = 6, d4 = 4, c34 = 4 -> J(3,4) = 4/6 = 0.666667
    // cust 99 buys 51 suppliers (100..150) -> pruned (cap 50): none
    // of those pairs may appear
    val rows =
      (1L to 3L).flatMap(c => Seq((c, 1L), (c, 2L))) ++
        (4L to 7L).flatMap(c => Seq((c, 3L), (c, 4L))) ++
        Seq((8L, 3L), (9L, 3L)) ++
        (100L to 150L).map(sp => (99L, sp))
    val out = run("g8_neighbor_jaccard", fixture("nj", purchases(rows): _*))
      .map(r => ((r.getAs[Long]("s1"), r.getAs[Long]("s2")),
        (r.getAs[Long]("c12"), r.getAs[Double]("jaccard"))))
    assert(out.toSeq == Seq(
      ((1L, 2L), (3L, 1.0)),
      ((3L, 4L), (4L, 0.666667))))
  }

  // ===================================================================
  // 8. Seed harmonic — depth-2 hand walk
  // ===================================================================

  test("g9_seed_harmonic: x2-scaled reciprocals by hand on a path from " +
      "the seed (d=1 -> 2 points, d=2 -> 1 point, d=3 unreached)") {
    // supp 7 is the seed (suppkey % 7 == 0). cust 1 buys supps 7 and
    // 1; cust 2 buys supp 1. Distances from the seed: cust 1 = 1,
    // supp 1 = 2, cust 2 = 3 (unreached at depth 2).
    val rows = Seq((1L, 7L), (1L, 1L), (2L, 1L))
    val out = run("g9_seed_harmonic", fixture("sh", purchases(rows): _*))
      .map(r => (r.getAs[String]("kind"), r.getAs[Long]("key"),
        r.getAs[Long]("harmonic2"), r.getAs[Long]("n_seeds_reached")))
    assert(out.toSeq == Seq(
      ("customer", 1L, 2L, 1L), ("supplier", 1L, 1L, 1L)))
  }

  // ===================================================================
  // 9. Degree tail — bit-length buckets by hand
  // ===================================================================

  test("g19_degree_tail: floor(log2 deg) via bit length on a hand " +
      "co-purchase graph (K5 -> degree 4 -> bucket 2; an edge -> bucket 0)") {
    import spark.implicits._
    // order 1 holds parts 1..5 (K5, all degrees 4); order 2 holds
    // parts 10,11 (degree 1 each)
    val li = ((1L to 5L).map(p => (1L, p)) ++ Seq((2L, 10L), (2L, 11L)))
      .toDF("l_orderkey", "l_partkey")
    val out = run("g19_degree_tail", fixture("dt", "lineitem" -> li))
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("min_degree"),
        r.getAs[Long]("n_nodes")))
    assert(out.toSeq == Seq((0L, 1L, 2L), (2L, 4L, 5L)))
  }

  // ===================================================================
  // 10. Z-order — hand Morton codes and the quadrant seam
  // ===================================================================

  test("layout_zorder interleaves to the hand Morton codes: z(7,7) = 63 " +
      "stays in file 0, z(8,0) = 64 crosses the seam into file 1") {
    // x = floor(value/2) mod 256, y = user_id mod 256
    val rows = Seq(
      (1L, Day0 + 1L, 0L, "view", 0.0),   // (0,0)  -> z 0   -> file 0
      (2L, Day0 + 2L, 7L, "view", 14.0),  // (7,7)  -> z 63  -> file 0
      (3L, Day0 + 3L, 0L, "view", 16.0),  // (8,0)  -> z 64  -> file 1
      (4L, Day0 + 4L, 8L, "view", 0.0))   // (0,8)  -> z 128 -> file 2
    val out = run("layout_zorder",
      fixture("zo", "events" -> eventsRows(rows)))
      .map(r => (r.getAs[Long]("zfile"), r.getAs[Long]("n_rows"),
        r.getAs[Int]("x_min"), r.getAs[Int]("x_max"),
        r.getAs[Int]("y_min"), r.getAs[Int]("y_max")))
    assert(out.toSeq == Seq(
      (0L, 2L, 0, 7, 0, 7), (1L, 1L, 8, 8, 0, 0), (2L, 1L, 0, 0, 8, 8)))
  }
}
