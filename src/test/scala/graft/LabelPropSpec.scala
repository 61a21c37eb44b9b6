package graft

import graft.ext.LabelProp

/** LPA contract: the distributed iteration must agree with an
  * independent plain-Scala replay of the vote/tie update on random
  * graphs (including the bipartite case the self-vote damps), and a
  * barbell graph must split into its two communities.
  */
class LabelPropSpec extends SparkSpec {
  import spark.implicits._

  private def replay(und: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val sym = und ++ und.map(_.swap)
    val nodes = sym.map(_._1).distinct
    val adj = sym.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var lab = nodes.map(n => n -> n).toMap
    for (_ <- 1 to rounds) {
      lab = nodes.map { n =>
        val votes = (n +: adj(n)).groupBy(lab).view.mapValues(_.size).toMap
        val mx = votes.values.max
        n -> votes.collect { case (l, c) if c == mx => l }.min
      }.toMap
    }
    lab
  }

  private def run(und: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    LabelProp.labels(edges, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("matches a plain-Scala replay on random graphs") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val n = 12 + rnd.nextInt(10)
      val und = (for (_ <- 1 to 3 * n) yield {
        val u = rnd.nextInt(n).toLong
        val v = rnd.nextInt(n).toLong
        if (u < v) Some((u, v)) else if (v < u) Some((v, u)) else None
      }).flatten.distinct
      assert(run(und, 3) == replay(und, 3), s"trial $trial: $und")
    }
  }

  test("self-vote keeps a 4-cycle (bipartite) deterministic and matched") {
    val und = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))
    assert(run(und, 4) == replay(und, 4))
  }

  test("barbell graph splits into its two cliques") {
    // two K4 cliques joined by one bridge edge
    def clique(off: Long) = for {
      i <- 0L to 3L; j <- (i + 1) to 3L
    } yield (off + i, off + j)
    val und = clique(0) ++ clique(10) :+ (3L, 10L)
    val lab = run(und, 3)
    val left = (0L to 3L).map(lab).toSet
    val right = (10L to 13L).map(lab).toSet
    assert(left.size == 1 && right.size == 1 && left != right,
      s"cliques did not converge to two distinct communities: $lab")
  }
}
