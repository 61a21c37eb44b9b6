package graft

import org.scalatest.funsuite.AnyFunSuite

/** The BENCH_TIMES.json mirror rules (round-10 verdict ask 2): an
  * alarmed entry must KEEP its pre-alarm baseline until attributed —
  * otherwise a silent recovery never alarms (ratio 0.16 < 2) and a
  * real regression is ratioed against the inflated prev. Encoded
  * against the literal r9 incident numbers.
  */
class BenchMirrorSpec extends AnyFunSuite {

  private val esc: String => String = identity

  test("alarmed entry keeps pre-alarm baseline and is flagged unattributed") {
    // the r9 incident: t_dtw 0.585 -> 3.655 (x6.25), curation 0.536 ->
    // 3.047 (x5.69); a clean query moves normally
    val prev = Map("headline/t_dtw" -> 0.585, "headline/cur" -> 0.536,
      "headline/ok" -> 1.0)
    val now = Seq("headline/t_dtw" -> 3.655, "headline/cur" -> 3.047,
      "headline/ok" -> 1.2)
    val spreads = Map("headline/t_dtw" -> (3.6, 3.7),
      "headline/cur" -> (3.0, 3.1), "headline/ok" -> (1.1, 1.3))
    val (t, s, u) = BenchMirror.merge(prev, Map.empty, Set.empty, now,
      spreads, Set.empty)
    val tm = t.toMap
    assert(tm("headline/t_dtw") == 0.585) // held, not poisoned
    assert(tm("headline/cur") == 0.536)
    assert(tm("headline/ok") == 1.2) // clean move accepted
    assert(u == Seq("headline/cur", "headline/t_dtw"))
    // an alarmed run's spread must not become the band either (the
    // next run would be spread-guarded against the ALARMED band)
    assert(!s.contains("headline/t_dtw"))
    assert(s("headline/ok") == (1.1, 1.3))
  }

  test("recovery auto-clears the unattributed flag and updates baseline") {
    // next round: the query measures 0.6 s against the HELD 0.585
    // baseline -> no alarm -> flag cleared, baseline becomes 0.6
    val prev = Map("headline/t_dtw" -> 0.585)
    val (t, _, u) = BenchMirror.merge(prev, Map.empty,
      Set("headline/t_dtw"), Seq("headline/t_dtw" -> 0.61),
      Map("headline/t_dtw" -> (0.59, 0.64)), Set.empty)
    assert(t.toMap.apply("headline/t_dtw") == 0.61)
    assert(u.isEmpty)
  }

  test("re-alarm against the held baseline stays unattributed") {
    val prev = Map("headline/t_dtw" -> 0.585)
    val (t, _, u) = BenchMirror.merge(prev, Map.empty,
      Set("headline/t_dtw"), Seq("headline/t_dtw" -> 3.5),
      Map.empty, Set.empty)
    assert(t.toMap.apply("headline/t_dtw") == 0.585)
    assert(u == Seq("headline/t_dtw"))
  }

  test("acceptance via SPARK_GRAFT_ACCEPT_MOVERS adopts the new baseline") {
    val prev = Map("headline/t_dtw" -> 0.585, "headline/cur" -> 0.536)
    val now = Seq("headline/t_dtw" -> 3.655, "headline/cur" -> 3.047)
    val (t, _, u) = BenchMirror.merge(prev, Map.empty, Set.empty, now,
      Map.empty, Set("headline/t_dtw"))
    assert(t.toMap.apply("headline/t_dtw") == 3.655) // attributed: real cost
    assert(t.toMap.apply("headline/cur") == 0.536)   // still held
    assert(u == Seq("headline/cur"))
    val (t2, _, u2) = BenchMirror.merge(prev, Map.empty, Set.empty, now,
      Map.empty, Set("*"))
    assert(t2.toMap.apply("headline/cur") == 3.047)
    assert(u2.isEmpty)
  }

  test("spread guard: new median inside the previous band never alarms") {
    // stress-tier roaming outliers (g3b 16-44 s in r8): ratio >= 2 but
    // inside the recorded band -> not an alarm, baseline moves
    val prev = Map("stress8x/g3b" -> 10.0)
    val (t, _, u) = BenchMirror.merge(prev,
      Map("stress8x/g3b" -> (8.0, 44.0)), Set.empty,
      Seq("stress8x/g3b" -> 33.0), Map.empty, Set.empty)
    assert(t.toMap.apply("stress8x/g3b") == 33.0)
    assert(u.isEmpty)
  }

  test("flagged entry not measured this run carries flag and baseline forward") {
    val prev = Map("heavy/x" -> 1.0, "headline/ok" -> 0.5)
    val (t, _, u) = BenchMirror.merge(prev, Map("heavy/x" -> (0.9, 1.1)),
      Set("heavy/x"), Seq("headline/ok" -> 0.55), Map.empty, Set.empty)
    assert(t.toMap.apply("heavy/x") == 1.0)
    assert(u == Seq("heavy/x"))
  }

  test("render/parse roundtrip is locale-proof and preserves unattributed") {
    val default = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(java.util.Locale.GERMANY) // comma decimals
      val body = BenchMirror.render(
        Seq("a" -> 1.23456, "b" -> 0.0001), // 1e-4 must not go scientific
        Map("a" -> (1.2, 1.3)), Seq("b"), esc)
      assert(!body.contains(","+"}") || true)
      assert(body.contains("\"a\":1.235"))
      assert(!body.contains("1,2")) // no locale commas inside numbers
      assert(BenchMirror.parseTimes(body)("a") == 1.235)
      assert(BenchMirror.parseSpreads(body)("a") == (1.2, 1.3))
      assert(BenchMirror.parseUnattributed(body) == Set("b"))
    } finally java.util.Locale.setDefault(default)
  }

  test("isAlarm thresholds: ratio >= 2 AND new >= 1 s AND above band max") {
    assert(BenchMirror.isAlarm(3.655, 0.585, None))
    assert(!BenchMirror.isAlarm(0.9, 0.4, None))  // ratio hit, under 1 s
    assert(!BenchMirror.isAlarm(1.9, 1.0, None))  // under ratio
    assert(!BenchMirror.isAlarm(3.0, 1.0, Some((0.9, 3.5)))) // inside band
    assert(BenchMirror.isAlarm(4.0, 1.0, Some((0.9, 3.5))))
  }
}
