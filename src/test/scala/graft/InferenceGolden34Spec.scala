package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Published-value micro-goldens, part 34 — the text-curation tail.
  * Anchors:
  *
  *  - tx4: md5 against RFC 1321 test-suite values and the rolling
  *    polynomial hash against an independent character fold.
  *  - tx27 (Mihalcea–Tarau TextRank): the 2-word alternation is a
  *    fixed point at rank = Scale exactly; the star document ranks
  *    hub ≫ leaves with the full 3-round integer trace by hand.
  *  - tx46 (Burrows-Delta flavored style distance): per-mille
  *    profiles and the densified L1 by hand, including the
  *    zero-fill for one-sided vocabulary.
  *  - tx51 (Rose et al. RAKE): deg/freq word scores and phrase
  *    scores by hand — the long-phrase-beats-frequent-word property.
  *  - tx57 (feature hashing): full independent replay (trigrams,
  *    polynomial hash, bucket fold, collided-mass accounting).
  *  - sketch_cms (Cormode–Muthukrishnan): exact counts by hand on a
  *    corpus where the 1e-4-width sketch cannot collide; the absent
  *    probe reads 0; within_bound everywhere.
  *  - tx17: integer epoch arithmetic on fractional-zero sources and
  *    the hash-gated fractional epoch replayed independently.
  *  - tx21/tx24: window-rank semantics on all-tie fixtures — the
  *    keep-set and the percent-rank decile boundary are pure
  *    functions of (doc_id, n) there, incl. the n = 1 degenerate.
  *  - tx37: positional proximity by hand — in-window hit, over-slop
  *    miss, and the order requirement (w1 strictly after w0).
  */
@graft.Golden
class InferenceGolden34Spec extends SparkSpec {

  private def docsFixture(name: String,
      docs: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory(s"golden34_$name").toString
    docs.toDF("doc_id", "text", "source")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        col("source"), length(col("text")).cast("long").as("n_chars"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def run(q: String, dir: String): Array[Row] =
    try SparkEntry.queries(q)(spark, dir).collect()
    finally {
      graft.queries.TextQueries.releaseCaches()
      spark.catalog.clearCache()
    }

  private val P = 1000000007L
  private def charHash(s: String): Long =
    s.foldLeft(7L)((acc, ch) => (acc * 31 + ch.toInt) % P)
  private def r6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("tx4_fingerprint_sample: md5 matches RFC 1321 values; the " +
      "rolling hash matches the independent character fold") {
    // RFC 1321 test suite: md5("abc"), md5("message digest")
    val out = run("tx4_fingerprint_sample", docsFixture("tx4", Seq(
      (1L, "abc", "web"), (2L, "message digest", "web"))))
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("fp"), r.getAs[Long]("fp_roll"))).toMap
    assert(out(1L) == (("900150983cd24fb0d6963f7d28e17f72", charHash("abc"))))
    assert(out(2L) ==
      (("f96b697d7cb7938d525a2f31aaf161d0", charHash("message digest"))))
  }

  test("tx27_textrank: the 2-word alternation is a fixed point at " +
      "Scale; the star ranks hub 2483250 over leaves 505583 (hand trace)") {
    // both words degree 1 on each other: every round returns 1e6
    val flat = run("tx27_textrank", docsFixture("tr1", Seq(
      (1L, "wordaaaa wordbbbb wordaaaa wordbbbb", "web"))))
      .map(r => r.getAs[String]("word") -> r.getAs[Long]("rank")).toMap
    assert(flat == Map("wordaaaa" -> 1000000L, "wordbbbb" -> 1000000L))
    // star: aaaa adjacent to bbbb/cccc/dddd — the g4-style 3-round
    // integer trace: hub 2700000 -> 1254999 -> 2483250; leaves
    // 433333 -> 915000 -> 505583
    val star = run("tx27_textrank", docsFixture("tr2", Seq(
      (1L, "aaaa bbbb aaaa cccc aaaa dddd", "web"))))
      .map(r => r.getAs[String]("word") -> r.getAs[Long]("rank")).toMap
    assert(star == Map("aaaa" -> 2483250L,
      "bbbb" -> 505583L, "cccc" -> 505583L, "dddd" -> 505583L))
  }

  test("tx46_style_distance: hand per-mille profiles with zero-filled " +
      "one-sided vocabulary - L1 = 99999 exactly") {
    // A: "x x y" -> pm(x)=66666, pm(y)=33333, pm(z)=0 (t=3)
    // B: "x z"   -> pm(x)=50000, pm(z)=50000, pm(y)=0 (t=2)
    val out = run("tx46_style_distance", docsFixture("sty", Seq(
      (1L, "x x y", "srcA"), (2L, "x z", "srcB"))))
    assert(out.length == 1)
    val r = out.head
    assert((r.getAs[String]("s1"), r.getAs[String]("s2"),
      r.getAs[Long]("l1_permille")) == (("srcA", "srcB", 99999L)))
  }

  test("tx51_rake_keywords: hand deg/freq scores - the 3-word phrase " +
      "outscores the repeated word's short phrase (the RAKE property)") {
    // "deep learning beats | shallow learning | yesterday"
    // wscore(x1e6): deep 3, learning 5/2 -> 2500000, beats 3,
    // shallow 2, yesterday 1; phrase scores: 8.5e6 / 4.5e6 / 1e6
    val out = run("tx51_rake_keywords", docsFixture("rake", Seq(
      (1L, "deep learning beats the shallow learning of yesterday", "web"))))
      .map(r => r.getAs[String]("phrase") ->
        (r.getAs[Long]("n_words"), r.getAs[Long]("n_occ"),
          r.getAs[Long]("score")))
    assert(out.toSeq == Seq(
      "deep learning beats" -> ((3L, 1L, 8500000L)),
      "shallow learning" -> ((2L, 1L, 4500000L)),
      "yesterday" -> ((1L, 1L, 1000000L))))
  }

  test("tx57_feature_hash == the full independent replay (trigrams, " +
      "polynomial hash, bucket fold, collided-mass accounting)") {
    val texts = Seq((1L, "abcdabcd", "web"), (2L, "bcdxyz", "web"),
      (3L, "zzzz", "web"))
    val out = run("tx57_feature_hash", docsFixture("fh", texts))
      .map(r => r.getAs[Long]("m") ->
        (r.getAs[Long]("vocab"), r.getAs[Long]("used_buckets"),
          r.getAs[Long]("collided_buckets"), r.getAs[Long]("collided_mass"),
          r.getAs[Double]("collided_frac"))).toMap
    val freqs = texts.flatMap { case (_, t, _) =>
      if (t.length < 3) Seq.empty
      else (0 to t.length - 3).map(i => t.substring(i, i + 3))
    }.groupBy(identity).map { case (g, xs) => g -> xs.size.toLong }
    val expected = Seq(256L, 4096L).map { m =>
      val buckets = freqs.toSeq.groupBy { case (g, _) => charHash(g) % m }
      val collided = buckets.values.filter(_.size > 1)
      val tmass = freqs.values.sum
      val cmass = collided.map(xs => xs.map(_._2).sum - xs.map(_._2).max).sum
      m -> ((freqs.size.toLong, buckets.size.toLong, collided.size.toLong,
        cmass, r6(cmass.toDouble / tmass.toDouble)))
    }.toMap
    assert(out == expected)
  }

  test("sketch_cms_token_freq: hand corpus - exact counts, absent probe " +
      "0, within_bound everywhere (no collision at 1e-4 width here)") {
    val out = run("sketch_cms_token_freq", docsFixture("cms", Seq(
      (1L, "join join hash scan", "web"),
      (2L, "join spark table query data data", "web"))))
      .map(r => r.getAs[String]("token") ->
        (r.getAs[Long]("exact_cnt"), r.getAs[Boolean]("within_bound"))).toMap
    assert(out == Map(
      "join" -> ((3L, true)), "hash" -> ((1L, true)), "scan" -> ((1L, true)),
      "spark" -> ((1L, true)), "table" -> ((1L, true)), "query" -> ((1L, true)),
      "data" -> ((2L, true)), "absent_token_xyz" -> ((0L, true))))
  }

  test("tx17_epoch_oversample: whole-epoch integer arithmetic on " +
      "fractional-zero sources; the fractional gate replayed by hash") {
    // srcN % 4 == 0 => fracMille 0: src0 reps 1, src4 reps 2, src8
    // reps 3 — pure integers, no gate
    val fixture = Seq(
      (1L, "one two three", "src0"), (2L, "four five", "src0"),
      (3L, "a b c d", "src4"), (4L, "e f", "src8"),
      // src1: whole 2, fracMille 250 — gate decides the 3rd epoch
      (5L, "gate text here", "src1"))
    val out = run("tx17_epoch_oversample", docsFixture("epoch", fixture))
      .map(r => (r.getAs[String]("source"), r.getAs[Int]("epoch")) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"))).toMap
    val gateExtra = (charHash("gate text here") % 1000L) < 250L
    val expected = Map(
      ("src0", 1) -> ((2L, 5L)),
      ("src4", 1) -> ((1L, 4L)), ("src4", 2) -> ((1L, 4L)),
      ("src8", 1) -> ((1L, 2L)), ("src8", 2) -> ((1L, 2L)),
      ("src8", 3) -> ((1L, 2L))) ++
      (1 to (if (gateExtra) 3 else 2)).map(e => ("src1", e) -> ((1L, 3L)))
    assert(out == expected)
  }

  test("tx21_source_cap keep-set on an all-tie source: ranks fall back " +
      "to doc_id, ids 11-12 are cut, the kept set is exact") {
    val docs = (1L to 12L).map(i => (i, "same text here", "big")) :+
      ((20L, "other text", "small"))
    val out = run("tx21_source_cap", docsFixture("cap", docs))
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_kept"), r.getAs[Long]("kept_id_sum"))).toMap
    assert(out("big") == ((10L, 55L)))   // 1..10 kept, 11-12 cut
    assert(out("small") == ((1L, 20L)))
  }

  test("tx24_quantile_normalize percent-rank boundary on all-tie " +
      "sources: (rank-1)/(n-1) >= 0.9 keeps exactly the last ceil(n/10) " +
      "ids; a singleton source has pr = 0 and an empty decile") {
    val docs = (1L to 11L).map(i => (i, "same text here", "big")) :+
      ((20L, "lonely", "solo"))
    val out = run("tx24_quantile_normalize", docsFixture("qn", docs))
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_top_decile"))).toMap
    // n = 11: pr = (rk-1)/10 >= 0.9 <=> rk >= 10 -> ids 10, 11
    assert(out("big") == ((11L, 2L)))
    assert(out("solo") == ((1L, 0L))) // percent_rank of a singleton is 0
  }

  test("tx37_proximity_search by hand: in-slop hit (gap 3), over-slop " +
      "miss (gap 5), and order (w1 strictly after w0) all pinned") {
    val out = run("tx37_proximity_search", docsFixture("prox", Seq(
      (1L, "data systems are slow today", "web"),   // gap 3: hit
      (2L, "data moves very very very slow", "web"), // gap 5: miss
      (3L, "slow data", "web"),                      // wrong order: miss
      (4L, "data x slow y data", "web"))))           // gap 2: hit
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_hits"), r.getAs[Long]("min_gap"))).toMap
    assert(out == Map(1L -> ((1L, 3L)), 4L -> ((1L, 2L))))
  }
}
