package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Published-value micro-goldens, part 24 — eighth gauge-steered
  * round: packing bins, Hamilton apportionment, the pointer-doubling
  * hierarchy, and out-of-fold target encoding. Anchors:
  *
  *  - pack_sequences: concat-and-chunk bin ids from hand per-source
  *    prefix sums (bin = floor(tokens-before / L)).
  *  - sample_allocation: Hamilton's largest-remainder apportionment —
  *    floors + the leftover seat handed to the tie-broken largest
  *    remainder, sum(alloc) = k exactly.
  *  - g14: the pointer-doubling ladder must resolve a hand 3-level
  *    chain to its true root and depth (the recursive-CTE semantics
  *    without a recursive operator).
  *  - tx47: the out-of-fold complement identity
  *    enc = (S - S_f + m*prior)/(N - N_f + m) at m = 20 on a hand
  *    label table — the leakage-free encoding every fold can verify
  *    excludes its own labels.
  */
@graft.Golden
class InferenceGolden24Spec extends SparkSpec {

  private def fixture(name: String, tables: (String, DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"golden24_$name").toString
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

  private def docsOf(rows: Seq[(Long, String, String)]): DataFrame = {
    import spark.implicits._
    rows.map { case (id, src, text) =>
      (id, text, "en", src, text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("pack_sequences assigns hand concat-and-chunk bins: " +
      "bin = floor(tokens-before / 2048) per source in doc_id order") {
    def doc(id: Long, src: String, n: Int) =
      (id, src, Seq.fill(n)("w").mkString(" "))
    // source s: nt 1000, 1500, 600 -> tokens-before 0, 1000, 2500 ->
    // bins 0, 0, 1; source t: one small doc -> bin 0
    val dir = fixture("ps", "documents" -> docsOf(Seq(
      doc(1L, "s", 1000), doc(2L, "s", 1500), doc(3L, "s", 600),
      doc(4L, "t", 10))))
    val out = run("pack_sequences", dir)
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("bin"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("bin_tokens")))
    assert(out.toSeq == Seq(
      ("s", 0L, 2L, 2500L), ("s", 1L, 1L, 600L), ("t", 0L, 1L, 10L)))
  }

  test("sample_allocation apportions by Hamilton's largest remainder: " +
      "floors + the tie-broken leftover seat, sum(alloc) = 100 exactly") {
    // three equal sources: quotas 33 each, one leftover seat; all
    // remainders equal (100*1 mod 3 = 1) -> the name tie-break hands
    // it to 'a'
    val dir = fixture("al", "documents" -> docsOf(Seq(
      (1L, "a", "x"), (2L, "b", "y"), (3L, "c", "z"))))
    val out = run("sample_allocation", dir)
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("alloc")))
    assert(out.toSeq.sortBy(_._1) == Seq(("a", 34L), ("b", 33L), ("c", 33L)))
    assert(out.map(_._2).sum == 100L)
  }

  test("g14_hierarchy_rollup resolves a hand 3-level chain to its true " +
      "root and depth through the pointer-doubling ladder") {
    import spark.implicits._
    // parent = key div 10, roots < 10: 351 -> 35 -> 3; 7 is a lone root
    val part = Seq((3L, 1.0), (35L, 1.0), (351L, 1.0), (7L, 1.0))
      .toDF("p_partkey", "p_retailprice")
    val out = run("g14_hierarchy_rollup", fixture("hr", "part" -> part))
      .map(r => (r.getAs[Long]("root"), r.getAs[Long]("n_parts"),
        r.getAs[Long]("total_cents"), r.getAs[Long]("max_depth")))
    assert(out.toSeq == Seq((3L, 3L, 300L, 2L), (7L, 1L, 100L, 0L)))
  }

  test("tx47_target_encoding computes the out-of-fold complement " +
      "identity (S - S_f + 20*prior)/(N - N_f + 20) on a hand table") {
    import spark.implicits._
    // cat U: orders 1 (fold 1, returned), 2 (fold 2, clean),
    // 3 (fold 3, returned); cat V: order 5 (fold 0, clean).
    // global prior = 2/4 = 0.5
    val ords = Seq((1L, "U"), (2L, "U"), (3L, "U"), (5L, "V"))
      .toDF("o_orderkey", "o_orderpriority")
    val li = Seq((1L, "R"), (3L, "R"), (2L, "N"), (5L, "N"))
      .toDF("l_orderkey", "l_returnflag")
    val out = run("tx47_target_encoding",
      fixture("te", "orders" -> ords, "lineitem" -> li))
      .map(r => ((r.getAs[String]("cat"), r.getAs[Long]("fold")),
        (r.getAs[Long]("nf"), r.getAs[Double]("enc")))).toMap
    // enc(U,1) = (2-1 + 10)/(3-1 + 20) = 11/22 = 0.5 (its own returned
    // label excluded); enc(U,2) = (2-0 + 10)/(2 + 20) = 12/22
    assert(out(("U", 1L)) == ((1L, 0.5)))
    assert(out(("U", 2L)) == ((1L, round6(12.0 / 22.0))))
    assert(out(("U", 3L)) == ((1L, 0.5)))
    assert(out(("V", 0L)) == ((1L, 0.5)))
  }
}
