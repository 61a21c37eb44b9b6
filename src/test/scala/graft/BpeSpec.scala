package graft

import graft.ext.Bpe

/** Iterative BPE merge training vs a driver-side brute-force
  * reference (explicit greedy single-pass merge over token lists) —
  * the replace-based corpus representation must agree with the
  * textbook list-walk on every round, including the overlapping-run
  * and tie-break cases.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Textbook reference: greedy left-to-right single-pass merge. */
  private def refMerge(toks: List[String], l: String, r: String): List[String] =
    toks match {
      case a :: b :: rest if a == l && b == r => s"$a $b" :: refMerge(rest, l, r)
      case a :: rest                          => a :: refMerge(rest, l, r)
      case Nil                                => Nil
    }

  private def refTrain(corpus: Seq[String], nRounds: Int): Seq[(Int, String, String, Long)] = {
    var docs = corpus.map(_.split(" ", -1).toList)
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var round = 1
    var done = false
    while (round <= nRounds && !done) {
      val counts = docs.flatMap(t => t.zip(t.drop(1)))
        .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      if (counts.isEmpty) done = true
      else {
        // same pinned tie-break: max count, then smallest (l, r)
        val ((l, r), cnt) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        out += ((round, l, r, cnt))
        docs = docs.map(refMerge(_, l, r))
        round += 1
      }
    }
    out.result()
  }

  private def run(corpus: Seq[String], nRounds: Int): Seq[(Int, String, String, Long)] =
    Bpe.train(corpus.toDF("text"), "text", nRounds)
      .map(m => (m.round, m.left, m.right, m.freq))

  test("merges match the brute-force reference on a crafted corpus") {
    val corpus = Seq(
      "a a a a",         // overlapping run: greedy must yield [aa, aa]
      "the cat sat on the mat",
      "the cat ate the cat food",
      "b a a b a a")
    assert(run(corpus, 6) == refTrain(corpus, 6))
  }

  test("property: random corpora agree for all rounds") {
    val rnd = new scala.util.Random(11)
    val vocab = Vector("x", "y", "z", "w")
    for (trial <- 1 to 3) {
      val corpus = Seq.fill(12)(
        Seq.fill(3 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.length))).mkString(" "))
      assert(run(corpus, 5) == refTrain(corpus, 5), s"trial $trial: $corpus")
    }
  }

  test("merged symbols participate in later rounds") {
    // "x y" dominates round 1; round 2's top pair must contain the
    // merged "x y" symbol — the property that makes the loop BPE and
    // not just repeated pair counting
    val corpus = Seq.fill(5)("x y z") :+ "x y"
    val merges = run(corpus, 2)
    assert(merges.head._2 == "x" && merges.head._3 == "y")
    assert(merges(1)._2 == "x y" && merges(1)._3 == "z", merges.toString)
  }

  test("exhausted corpus stops early and releases cleanly") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val merges = run(Seq("solo", "single"), 4)
    assert(merges.isEmpty)
    val added = sc.getPersistentRDDs.keySet -- before
    assert(added.isEmpty, s"leaked checkpoint blocks: $added")
  }
}
