package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Published-value micro-goldens, part 28 — twelfth gauge-steered
  * round: BPE encoding, cluster provenance, and the HLL accuracy
  * curve. Anchors:
  *
  *  - tx25: the pinned-merge-list encoder by hand — a present merge
  *    pair fuses into one token, absent pairs stay apart, so the
  *    compression ratio is an exact hand rational.
  *  - tx55: single-source vs cross-source dup clusters with hand
  *    majority purity (the syndication-vs-recrawl provenance read).
  *  - est_hll_curve: all three (m, rw1, alpha) arms replayed
  *    independently from the leading-bit-position register form —
  *    registers, scaled sums, and the rounded alpha*m^2*2^rw1/S
  *    estimate exactly.
  */
@graft.Golden
class InferenceGolden28Spec extends SparkSpec {

  private def fixture(name: String, tables: (String, DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"golden28_$name").toString
    tables.foreach { case (t, df) =>
      df.coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  private def run(q: String, dir: String): Array[Row] =
    try SparkEntry.queries(q)(spark, dir).collect()
    finally {
      graft.queries.TextQueries.releaseCaches()
      graft.queries.DedupQueries.releaseSignatureCache()
      graft.queries.ParityQueries.releaseCaches()
      PlanWindows.releaseAll()
      spark.catalog.clearCache()
    }

  private def round6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def docsOf(rows: Seq[(Long, String, String)]): DataFrame = {
    import spark.implicits._
    rows.map { case (id, src, text) =>
      (id, text, "en", src, text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("tx25_bpe_encode fuses exactly the pinned merge pairs: " +
      "'table hash' becomes one token, unmatched words stay apart") {
    // merges include (table, hash): raw 3 tokens -> bpe 2;
    // the second doc matches no merge: raw 2 -> bpe 2
    val dir = fixture("bpe", "documents" -> docsOf(Seq(
      (1L, "s", "table hash part"), (2L, "s", "plain words"))))
    val r = run("tx25_bpe_encode", dir).head
    assert(r.getAs[Long]("raw_tokens") == 5L)
    assert(r.getAs[Long]("bpe_tokens") == 4L)
    assert(r.getAs[Double]("compression") == 0.8)
  }

  test("tx55_dup_source_mix separates single-source from cross-source " +
      "clusters with hand majority purity") {
    // cluster {1,2}: both source s -> single_source, purity 1;
    // cluster {3,4}: sources s and t -> cross_source, majority 1 of 2
    val dir = fixture("mix", "documents" -> docsOf(Seq(
      (1L, "s", "alpha beta gamma delta epsilon"),
      (2L, "s", "alpha beta gamma delta epsilon"),
      (3L, "s", "one two three four five six"),
      (4L, "t", "one two three four five six"))))
    val out = run("tx55_dup_source_mix", dir)
      .map(r => r.getAs[String]("mix") ->
        (r.getAs[Long]("n_clusters"), r.getAs[Long]("n_docs"),
          r.getAs[Long]("n_majority_docs"), r.getAs[Double]("purity"))).toMap
    assert(out("single_source") == ((1L, 2L, 2L, 1.0)))
    assert(out("cross_source") == ((1L, 2L, 1L, 0.5)))
  }

  // ----- the independent HLL-curve replay -----

  private def charHash(s: String): Long =
    s.foldLeft(7L)((acc, ch) => (acc * 31 + ch.toInt) % 1000000007L)

  test("est_hll_curve matches the independent register replay on all " +
      "three (m, rw1, alpha) arms") {
    // 40 docs, each a unique 3-token trigram -> 40 distinct trigrams
    val texts = (1 to 40).map(i => s"u${i}a u${i}b u${i}c")
    val dir = fixture("curve", "documents" -> docsOf(
      texts.zipWithIndex.map { case (t, i) => ((i + 1).toLong, "s", t) }))
    val hs = texts.map(charHash).distinct
    def bitLength(w: Long): Long = 64L - java.lang.Long.numberOfLeadingZeros(w)
    def arm(m: Int, rw1: Int, alpha: Double): (Long, Long, Long) = {
      val regs = scala.collection.mutable.Map.empty[Long, Long]
      hs.foreach { hv =>
        val b = hv % m
        val w = hv / m
        val rho = if (w == 0L) rw1.toLong else rw1.toLong - bitLength(w)
        regs(b) = math.max(regs.getOrElse(b, 0L), rho)
      }
      val mxs = (0 until m).map(b => regs.getOrElse(b.toLong, 0L))
      val ssum = mxs.map(mx => 1L << (rw1 - mx).toInt).sum
      val v0 = mxs.count(_ == 0L).toLong
      val est = math.round(alpha * m.toDouble * m.toDouble *
        (1L << rw1).toDouble / ssum.toDouble)
      (ssum, v0, est)
    }
    val expected = Map(
      16L -> arm(16, 28, 0.673),
      64L -> arm(64, 25, 0.709),
      256L -> arm(256, 23, 0.718273))
    val out = run("est_hll_curve", dir)
      .map(r => r.getAs[Long]("m") ->
        (r.getAs[Long]("ssum"), r.getAs[Long]("v0"),
          r.getAs[Long]("hll_est"), r.getAs[Long]("exact"))).toMap
    expected.foreach { case (m, (ssum, v0, est)) =>
      val (gs, gv, ge, gx) = out(m)
      assert(gx == 40L, s"exact(m=$m)")
      assert(gs == ssum, s"ssum(m=$m)")
      assert(gv == v0, s"v0(m=$m)")
      assert(ge == est, s"est(m=$m)")
    }
  }
}
