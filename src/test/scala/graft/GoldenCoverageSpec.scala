package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** The golden-coverage gauge (round-12 verdict ask 3): every registry
  * query is classified in [[GoldenCoverage]] as independently ANCHORED,
  * DECLARATIVE (engine diversity is the anchor), or listed here in the
  * pinned never_goldened gap. The pin is the `never_benched`
  * discipline applied to derivation coverage: a NEW query that lands
  * unclassified fails this suite the round it lands, and the gap list
  * can only shrink deliberately (anchor it or justify it — never
  * silently). The artifact ships as GOLDEN_COVERAGE.json so the gap is
  * observable the way bench coverage is.
  */
class GoldenCoverageSpec extends AnyFunSuite {

  private val registry = SparkEntry.orderedNames

  /** Round 13 closed 132 → 47; round 14 closed the rest: parts 29-33
    * (the verdict-named record-linkage / incremental-dedup / media
    * families, the graph tail, the metric tail), the MEASURED anchor
    * class (in-query exact-arm recall gauges, bench-floored every
    * run), parts 34-35 (the tx/sim/inference tail), and part 36 (the
    * structural-theorem five: exact≡LSH DBSCAN on completeness
    * fixtures, signature determinism, planted-identical recall,
    * pipeline idempotence, quantized-drift hand fold).
    */
  /** EMPTY as of round 14 — parts 15-36 worked the gap 132 → 0.
    * The pin still gates: a NEW query landing unclassified re-opens
    * the list and fails this suite the round it lands.
    */
  private val expectedGap: Seq[String] = Seq.empty

  test("every classification entry names a live registry query") {
    assert(GoldenCoverage.staleEntries(registry).isEmpty)
  }

  test("no query is classified in more than one class") {
    val ad = GoldenCoverage.anchors.keySet & GoldenCoverage.declarative
    val am = GoldenCoverage.anchors.keySet & GoldenCoverage.measured.keySet
    val dm = GoldenCoverage.declarative & GoldenCoverage.measured.keySet
    assert(ad.isEmpty && am.isEmpty && dm.isEmpty,
      s"double-classified: ${ad ++ am ++ dm}")
  }

  test("every measured-class entry is an ANN/recall gauge whose value " +
      "names its exact arm (the class is narrow by design)") {
    GoldenCoverage.measured.foreach { case (q, why) =>
      assert(q.startsWith("sim"), s"$q: measured class is for the " +
        "in-query exact-arm recall gauges only")
      assert(why.toLowerCase.contains("exact"),
        s"$q: justification must name the exact ground-truth arm")
    }
  }

  test("the never_goldened gap matches the pinned list (classify every " +
      "new query; shrink the gap deliberately)") {
    val gap = GoldenCoverage.neverGoldened(registry)
    val unexpected = gap.toSet -- expectedGap.toSet
    val anchoredSince = expectedGap.toSet -- gap.toSet
    assert(unexpected.isEmpty,
      s"new queries missing a GoldenCoverage classification: $unexpected")
    assert(anchoredSince.isEmpty,
      s"queries anchored since the pin - remove from expectedGap: $anchoredSince")
  }

  test("GOLDEN_COVERAGE.json artifact reflects the classification") {
    val gap = GoldenCoverage.neverGoldened(registry)
    def arr(xs: Seq[String]) =
      xs.map(s => "\"" + s + "\"").mkString("[", ",", "]")
    val json =
      s"""{"total":${registry.size},""" +
        s""""anchored":${GoldenCoverage.anchors.size},""" +
        s""""declarative":${GoldenCoverage.declarative.size},""" +
        s""""measured":${GoldenCoverage.measured.size},""" +
        s""""never_goldened_count":${gap.size},""" +
        s""""never_goldened":${arr(gap)}}"""
    Files.writeString(Paths.get("GOLDEN_COVERAGE.json"), json)
    assert(registry.size ==
      GoldenCoverage.anchors.size + GoldenCoverage.declarative.size +
        GoldenCoverage.measured.size + gap.size)
  }
}
