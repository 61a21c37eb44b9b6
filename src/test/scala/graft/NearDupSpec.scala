package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.ext.NearDup

/** Semantics of the near-dup primitives plus the MinHash collision
  * properties the banded candidate generation relies on (round-1
  * verdict item 4): identical documents always collide in every band;
  * documents with disjoint shingle sets (essentially) never do.
  */
class NearDupSpec extends SparkSpec {
  import spark.implicits._

  private val params = NearDup.minhashParams(16)

  private def sigOf(text: String): Seq[Long] =
    Seq(text).toDF("text")
      .select(NearDup.minhashSignature(
        transform(NearDup.shingles(split(col("text"), " "), 3), NearDup.charHash(_)),
        params): _*)
      .head().toSeq.map(_.asInstanceOf[Long])

  test("charHash matches the reference polynomial fold (and drops empty chars)") {
    val expected = "ab".foldLeft(7L)((acc, c) => (acc * 31 + c.toInt) % NearDup.P)
    val got = Seq("ab").toDF("t").select(NearDup.charHash(col("t"))).head().getLong(0)
    assert(got == expected)
  }

  test("native poly_hash == HOF charHash on ASCII and BMP unicode") {
    val rnd = new scala.util.Random(3)
    val ascii = Seq.fill(50)(rnd.alphanumeric.take(rnd.nextInt(30) + 1).mkString)
    val bmp = Seq("héllo wörld", "日本語のテキスト", "русский текст", "", "mixed 中文 text")
    val df = (ascii ++ bmp).toDF("t")
    val diff = df.select(
        NearDup.charHash(col("t")).as("fast"),
        NearDup.charHashHof(col("t")).as("ref"))
      .filter(col("fast") =!= col("ref"))
    assert(diff.isEmpty, diff.collect().take(3).mkString(","))
  }

  test("native shingle_hash_set == composed HOF formulation (incl. n<k and dup shingles)") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a b a b a b a b", // duplicate shingles → dedup must agree
      "one two",         // fewer than k tokens → empty set
      "",                // empty text
      "naïve café über résumé straße naïve café über") // BMP unicode
    val df = texts.toDF("text")
    val toks = split(col("text"), " ")
    val diff = df.select(
        NearDup.shingleHashSet(toks, 3).as("fast"),
        NearDup.shingleHashSetHof(toks, 3).as("ref"))
      .filter(col("fast") =!= col("ref"))
    assert(diff.isEmpty, diff.collect().mkString(","))
  }

  test("shingle_hash_set participates in whole-stage codegen") {
    val df = spark.range(4)
      .select(split(concat(lit("a b c d e f"), col("id").cast("string")), " ").as("toks"))
      .select(NearDup.shingleHashSet(col("toks"), 3).as("hs"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("*") && l.contains("shingle_hash_set")), plan)
    assert(df.collect().length == 4)
  }

  test("native minhash_sigs == composed array_min(transform) signature") {
    val df = Seq(
      "the quick brown fox jumps over the lazy dog and runs far away",
      "an entirely different document with other words in it here now",
      "one two") // < k tokens → empty hash set → empty signature
      .toDF("text")
      .select(NearDup.shingleHashSet(split(col("text"), " "), 3).as("hs"))
    val composed = df.select(NearDup.minhashSignature(col("hs"), params): _*)
      .collect().map(_.toSeq.map(Option(_).map(_.asInstanceOf[Long])))
    val native = df.select(NearDup.minhashSigs(col("hs"), 16).as("ms"))
      .collect().map(_.getSeq[Long](0))
    // non-empty rows: identical k-vectors; empty row: empty native array
    // vs all-null composed columns (both band to null → no candidates)
    composed.zip(native).foreach {
      case (c, n) if c.forall(_.isDefined) => assert(c.map(_.get) == n)
      case (c, n) => assert(c.forall(_.isEmpty) && n.isEmpty)
    }
  }

  test("shingles: distinct k-grams, empty below k tokens") {
    def sh(t: String) = Seq(t).toDF("t")
      .select(NearDup.shingles(split(col("t"), " "), 3)).head().getSeq[String](0)
    assert(sh("a b c d") == Seq("a b c", "b c d"))
    assert(sh("a b c a b c a b c") == Seq("a b c", "b c a", "c a b"))
    assert(sh("a b").isEmpty)
  }

  test("native jaccard_sorted == array_intersect jaccard on random sets") {
    val rnd = new scala.util.Random(29)
    val rows = Seq.fill(100)((
      rnd.shuffle((1L to 200L).toList).take(rnd.nextInt(40) + 1).toArray,
      rnd.shuffle((1L to 200L).toList).take(rnd.nextInt(40) + 1).toArray))
    val df = rows.toDF("a", "b")
    val diff = df.select(
        NearDup.jaccardSorted(array_sort(col("a")), array_sort(col("b"))).as("fast"),
        NearDup.jaccard(col("a"), col("b")).as("ref"))
      .filter(col("fast") =!= col("ref"))
    assert(diff.isEmpty, diff.collect().take(3).mkString(","))
  }

  test("jaccard_sorted: two empty sets → NULL (the DuckDB-mirror semantics)") {
    // the oracle's 0/0 is NULL in DuckDB, so the pair is dropped by any
    // threshold filter. NaN here would instead PASS Spark's
    // NaN-is-greatest comparisons and emit spurious pairs — and the
    // composed array_intersect form can't even be used as the reference
    // for this case: under Spark 4's default ANSI mode its divide
    // THROWS on sub-k-token document pairs (a latent crash the native
    // expression removes)
    val df = Seq((Array.empty[Long], Array.empty[Long])).toDF("a", "b")
    assert(df.select(NearDup.jaccardSorted(col("a"), col("b"))).head().isNullAt(0))
  }

  test("jaccard on known sets") {
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
    assert(df.select(NearDup.jaccard(col("x"), col("y"))).head().getDouble(0) == 0.5)
  }

  test("identical documents share the full minhash signature") {
    val t = "spark joins the table and sorts the result by key order"
    assert(sigOf(t) == sigOf(t))
  }

  test("minhash signature agreement tracks jaccard on a near-dup pair") {
    val a = "one two three four five six seven eight nine ten eleven twelve"
    val b = "one two three four five six seven eight nine ten eleven thirteen"
    val agree = sigOf(a).zip(sigOf(b)).count { case (x, y) => x == y }
    assert(agree >= 8, s"only $agree/16 minhashes agree for ~0.8-jaccard docs")
  }

  test("property: disjoint-vocabulary docs never share a minhash (p≈0)") {
    // vocabularies are disjoint by construction → jaccard 0 → a shared
    // minhash requires a 1-in-1e9 polynomial hash collision
    val prop = Prop.forAll(Gen.chooseNum(4, 12), Gen.chooseNum(4, 12)) {
      (n: Int, m: Int) =>
        val a = (0 until n).map(i => s"left$i").mkString(" ")
        val b = (0 until m).map(i => s"right$i").mkString(" ")
        sigOf(a).zip(sigOf(b)).forall { case (x, y) => x != y }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("native simhash_bits == HOF simhash on random hash sets") {
    val rnd = new scala.util.Random(9)
    val rows = Seq.fill(100)(Seq.fill(rnd.nextInt(40) + 1)(rnd.nextLong(1L << 30)))
    val df = rows.toDF("hs")
    val diff = df.select(
        NearDup.simhash(col("hs"), 30).as("fast"),
        NearDup.simhashHof(col("hs"), 30).as("ref"))
      .filter(col("fast") =!= col("ref"))
    assert(diff.isEmpty, diff.collect().take(3).mkString(","))
  }

  test("native simhash_wide == composed 2x30-bit rehash formulation") {
    val rnd = new scala.util.Random(17)
    val df = Seq.fill(50)(Array.fill(rnd.nextInt(40) + 1)(
        math.abs(rnd.nextLong()) % NearDup.P))
      .toDF("hs")
    val diff = df.select(
        NearDup.simhashWide(col("hs")).as("fast"),
        NearDup.simhashWideHof(col("hs")).as("ref"))
      .filter(col("fast") =!= col("ref"))
    assert(diff.isEmpty, diff.collect().take(3).mkString(","))
  }

  test("property: signatures within hamming h share a band among h+1 bands (pigeonhole)") {
    val prop = Prop.forAll(Gen.chooseNum(0L, (1L << 30) - 1), Gen.listOfN(3, Gen.chooseNum(0, 29))) {
      (sig: Long, flips: List[Int]) =>
        val other = flips.distinct.foldLeft(sig)((s, b) => s ^ (1L << b))
        val df = Seq((sig, other)).toDF("a", "b")
        val bands = df.select(
          NearDup.simhashBands(col("a"), 30, 4).as("ba"),
          NearDup.simhashBands(col("b"), 30, 4).as("bb")).head()
        val ba = bands.getSeq[org.apache.spark.sql.Row](0).map(r => (r.getInt(0), r.getLong(1)))
        val bb = bands.getSeq[org.apache.spark.sql.Row](1).map(r => (r.getInt(0), r.getLong(1)))
        ba.intersect(bb).nonEmpty
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("simhash: identical inputs → distance 0; near inputs → small distance") {
    def shOf(t: String): Long =
      Seq(t).toDF("text")
        .select(NearDup.simhash(
          transform(NearDup.shingles(split(col("text"), " "), 3), NearDup.charHash(_)), 30))
        .head().getLong(0)
    val a = "one two three four five six seven eight nine ten eleven twelve"
    val c = "one two three four five six seven eight nine ten eleven thirteen"
    assert(shOf(a) == shOf(a))
    val hd = java.lang.Long.bitCount(shOf(a) ^ shOf(c))
    assert(hd <= 10, s"hamming $hd too large for near-dup docs")
  }
}
