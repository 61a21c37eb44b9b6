package graft

import graft.ext.Truss

/** k-truss contract: the peel must agree with an independent
  * plain-Scala replay on a hand-built graph where truss and core
  * membership DIFFER — the hub-with-no-closure edge that k-core
  * keeps and k-truss peels.
  */
class TrussSpec extends SparkSpec {
  import spark.implicits._

  test("peels closure-poor edges a degree test would keep") {
    // triangle {1,2,3} each pair doubled into a 4-clique-minus-edge?
    // Simpler: 4-clique {1,2,3,4} (every edge in 2 triangles) plus a
    // pendant path 4-5, 5-6: at k=4 (support >= 2) the clique
    // survives round 1 intact, the path edges (support 0) peel
    // immediately even though node 5 has degree 2.
    val clique = for {
      a <- 1L to 4L; b <- 1L to 4L if a < b
    } yield (a, b)
    val edges = (clique ++ Seq((4L, 5L), (5L, 6L))).toDF("u", "v")

    val got = Truss.peelStats(edges, k = 4, rounds = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    // independent replay
    var es = (clique ++ Seq((4L, 5L), (5L, 6L))).toSet
    val expected = (1 to 2).map { r =>
      def nbrs(n: Long) = es.collect {
        case (a, b) if a == n => b
        case (a, b) if b == n => a
      }
      val before = es.size
      es = es.filter { case (u, v) => (nbrs(u) & nbrs(v)).size >= 2 }
      val nodes = es.flatMap(e => Seq(e._1, e._2))
      (r.toLong, (before - es.size).toLong, nodes.size.toLong, es.size.toLong)
    }
    assert(got.toSeq == expected, s"got ${got.toSeq} expected $expected")
    // the 4-clique survives; both path edges are gone after round 1
    assert(got(0) == (1L, 2L, 4L, 6L))
  }
}
