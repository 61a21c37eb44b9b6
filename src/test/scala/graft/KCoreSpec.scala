package graft

import graft.ext.KCore

/** k-core peel contract: the pinned-round trajectory must match a
  * hand-computed peel on a known graph, including a converged round
  * (n_removed = 0) that leaves the core untouched, and the emitted
  * counts must describe the graph AFTER each round's deletions.
  */
class KCoreSpec extends SparkSpec {
  import spark.implicits._

  test("matches the hand-computed peel on a triangle with a tail") {
    // triangle {1,2,3} plus tail 3-4, 4-5 (u < v per edge)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("u", "v")

    val got = KCore.peelStats(edges, k = 2, rounds = 3)
      .orderBy("round")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    // round 1: node 5 (deg 1) peels → {1,2,3,4}, 4 edges
    // round 2: node 4 (deg now 1) peels → triangle, 3 edges
    // round 3: every degree ≥ 2 → converged, nothing removed
    assert(got === Array(
      (1L, 1L, 4L, 4L),
      (2L, 1L, 3L, 3L),
      (3L, 0L, 3L, 3L)))
  }

  test("frontier peel is exactly the pinned-round peel (random graphs)") {
    // the frontier variant maintains degrees incrementally; its whole
    // contract is bit-identical per-round stats vs the full recompute
    for (seed <- Seq(1, 7, 42)) {
      val rnd = new scala.util.Random(seed)
      val edges = (1 to 300)
        .map { _ =>
          val a = rnd.nextInt(60).toLong; val b = rnd.nextInt(60).toLong
          (math.min(a, b), math.max(a, b))
        }
        .filter(p => p._1 != p._2).distinct
        .toDF("u", "v")
      val pinned = KCore.peelStats(edges, k = 3, rounds = 5)
        .orderBy("round").collect().map(_.toSeq)
      val frontier = KCore.peelStatsFrontier(edges, k = 3, rounds = 5)
        .orderBy("round").collect().map(_.toSeq)
      assert(pinned.toSeq == frontier.toSeq, s"diverged at seed $seed")
    }
  }

  test("frontier peel handles silently-isolated nodes like the pinned peel") {
    // star 1-{2,3,4} plus pendant pair 5-6: k=2 round 1 removes
    // 2,3,4,5,6 (degree 1), isolating node 1 WITHOUT counting it —
    // the case where a frontier degree table must drop the zero-degree
    // row silently rather than report it as removed
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (5L, 6L)).toDF("u", "v")
    val pinned = KCore.peelStats(edges, k = 2, rounds = 2)
      .orderBy("round").collect().map(_.toSeq)
    val frontier = KCore.peelStatsFrontier(edges, k = 2, rounds = 2)
      .orderBy("round").collect().map(_.toSeq)
    assert(pinned.toSeq == frontier.toSeq)
  }

  test("k above max degree peels everything to the empty graph") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("u", "v")
    val got = KCore.peelStats(edges, k = 3, rounds = 2)
      .orderBy("round")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // round 1 removes all three nodes (degrees 1, 2, 1); round 2 is
    // a fixpoint over the empty graph
    assert(got === Array((1L, 3L, 0L, 0L), (2L, 0L, 0L, 0L)))
  }
}
