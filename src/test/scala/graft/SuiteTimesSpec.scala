package graft

import org.scalatest.funsuite.AnyFunSuite

/** SUITE_TIMES.json semantics (round-13 verdict ask 4): the verify
  * sweep's ratchet discipline applied to the test suite — full runs
  * rewrite the total pair, subset runs only their own suite entries,
  * a ≥1.5× jump holds the held total while recording the last.
  */
class SuiteTimesSpec extends AnyFunSuite {

  test("first full run seeds held == last == total and the count") {
    val (s, full, held) = SuiteTimes.merge(SuiteTimes.Empty,
      Map("A" -> 10.0, "B" -> 20.0))
    assert(full && !held)
    assert(s.heldTotal.contains(30.0) && s.lastTotal.contains(30.0))
    assert(s.fullSuiteCount == 2 && s.times == Map("A" -> 10.0, "B" -> 20.0))
  }

  test("subset run updates its suites but never the total pair") {
    val (s1, _, _) = SuiteTimes.merge(SuiteTimes.Empty,
      (1 to 10).map(i => s"S$i" -> 1.0).toMap)
    val (s2, full, _) = SuiteTimes.merge(s1, Map("S3" -> 99.0))
    assert(!full)
    assert(s2.heldTotal == s1.heldTotal && s2.lastTotal == s1.lastTotal)
    assert(s2.fullSuiteCount == 10)
    assert(s2.times("S3") == 99.0 && s2.times("S1") == 1.0)
  }

  test("a clean full-run change rewrites held (including DOWNWARD)") {
    val (s1, _, _) = SuiteTimes.merge(SuiteTimes.Empty, Map("A" -> 30.0, "B" -> 10.0))
    val (s2, full, held) = SuiteTimes.merge(s1, Map("A" -> 20.0, "B" -> 5.0))
    assert(full && !held)
    assert(s2.heldTotal.contains(25.0) && s2.lastTotal.contains(25.0))
  }

  test("a >=1.5x full-run jump HOLDS the held total, records the last") {
    val (s1, _, _) = SuiteTimes.merge(SuiteTimes.Empty, Map("A" -> 10.0, "B" -> 10.0))
    val (s2, full, held) = SuiteTimes.merge(s1, Map("A" -> 20.0, "B" -> 15.0))
    assert(full && held)
    assert(s2.heldTotal.contains(20.0)) // the pre-jump baseline
    assert(s2.lastTotal.contains(35.0)) // the drift stays visible
    // recovery: the next clean run rewrites normally
    val (s3, _, held3) = SuiteTimes.merge(s2, Map("A" -> 11.0, "B" -> 10.0))
    assert(!held3 && s3.heldTotal.contains(21.0) && s3.lastTotal.contains(21.0))
  }

  test("a grown suite set (>10% more suites) RESEEDS instead of " +
      "ratcheting - new suites are deliberate cost, not drift") {
    // the seeding hazard: a 4-suite subset-seeded baseline must not
    // hold against the first real 100-suite run forever
    val (s1, _, _) = SuiteTimes.merge(SuiteTimes.Empty, Map("A" -> 0.4))
    val big = (1 to 100).map(i => s"S$i" -> 1.0).toMap
    val (s2, full, held) = SuiteTimes.merge(s1, big)
    assert(full && !held)
    assert(s2.heldTotal.contains(100.0) && s2.fullSuiteCount == 100)
    // and a same-size loaded re-run afterwards ratchets normally
    val (s3, _, held3) = SuiteTimes.merge(s2, big.map { case (k, v) => k -> v * 2 })
    assert(held3 && s3.heldTotal.contains(100.0) && s3.lastTotal.contains(200.0))
  }

  test("a full run drops stale per-suite keys (deleted/renamed suites); " +
      "a subset run keeps merging over prev") {
    // round-14 advice: `prev.times ++ ran` let a deleted suite's entry
    // linger forever — a full run enumerates the whole suite set, so
    // any prev key it didn't measure is provably dead
    val (s1, _, _) = SuiteTimes.merge(SuiteTimes.Empty,
      (1 to 10).map(i => s"S$i" -> 1.0).toMap)
    // S10 renamed to T10: the next full run measures 10 suites again
    val renamed = ((1 to 9).map(i => s"S$i" -> 1.0) :+ ("T10" -> 1.0)).toMap
    val (s2, full, _) = SuiteTimes.merge(s1, renamed)
    assert(full)
    assert(!s2.times.contains("S10") && s2.times.contains("T10"))
    // subset runs can't tell dead from unmeasured: prev keys survive
    val (s3, full3, _) = SuiteTimes.merge(s2, Map("S1" -> 2.0))
    assert(!full3 && s3.times.contains("T10") && s3.times("S1") == 2.0)
  }

  test("render/parse roundtrip") {
    val (s1, _, _) = SuiteTimes.merge(SuiteTimes.Empty,
      Map("graft.FooSpec" -> 1.25, "graft.BarSpec" -> 0.5))
    val body = SuiteTimes.render(s1)
    val back = SuiteTimes.parse(body)
    assert(back.times == s1.times)
    assert(back.heldTotal == s1.heldTotal && back.lastTotal == s1.lastTotal)
    assert(back.fullSuiteCount == 2)
  }

  test("empty run is a no-op (aborted before any suite completed)") {
    val (s1, _, _) = SuiteTimes.merge(SuiteTimes.Empty, Map("A" -> 1.0))
    val (s2, full, held) = SuiteTimes.merge(s1, Map.empty)
    assert(s2 == s1 && !full && !held)
  }

  test("reporter ignores suites whose tests were all tag-excluded " +
      "(a -l graft.Golden run must stay a SUBSET run)") {
    // the r15 incident: tag exclusion still fires SuiteCompleted for
    // every discovered suite (~1 ms, zero test events), so the fast
    // loop looked like a full run and rewrote the held total down to
    // a golden-less number. A suite counts only if >=1 test ran.
    import org.scalatest.events._
    val rep = new SuiteTimeReporter
    val ord = new Ordinal(1)
    def suiteDone(name: String, ms: Long) = SuiteCompleted(
      ord, name, name, Some(name), Some(ms))
    // GoldenSpec: discovered, completed, but zero tests ran
    rep.apply(suiteDone("graft.GoldenSpec", 1L))
    // FastSpec: one test actually ran
    rep.apply(TestSucceeded(ord, "graft.FastSpec", "graft.FastSpec",
      Some("graft.FastSpec"), "t1", "t1", Vector.empty))
    rep.apply(suiteDone("graft.FastSpec", 1500L))
    assert(rep.ranSnapshot == Map("graft.FastSpec" -> 1.5))
  }
}
