package graft

import org.apache.spark.sql.functions._

import graft.ext.Stress

/** [[graft.ext.Stress.sigmaTable]] on graphs with KNOWN shortest-path
  * counts — the level-synchronized BFS must count exactly the
  * shortest paths (nodes reached at an earlier level must never
  * accumulate longer-path contributions), because g21's stress
  * products are only meaningful if σ is exact.
  */
class StressSpec extends SparkSpec {
  import spark.implicits._

  private def edges(pairs: (Long, Long)*) = {
    val df = pairs.toSeq.toDF("src", "dst")
    df.unionAll(df.select(col("dst").as("src"), col("src").as("dst")))
  }

  test("diamond graph: two shortest paths merge at the far node") {
    // 1 - {2, 3} - 4 : σ(1→4) must be 2 through the merged level,
    // and the direct neighbors keep σ = 1.
    val e = edges((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L))
    val seeds = Seq(1L).toDF("seed")
    val p = Stress.sigmaTable(e, seeds, rounds = 3)
      .select("node", "d", "sigma").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(p(1L) === ((0L, 1L)))
    assert(p(2L) === ((1L, 1L)))
    assert(p(3L) === ((1L, 1L)))
    assert(p(4L) === ((2L, 2L)))
  }

  test("negative control: a shortcut edge must reset the path count") {
    // Same diamond plus a direct 1-4 edge: node 4 is now at distance
    // 1 with σ = 1 — a walker that kept accumulating level-2 arrivals
    // (paths of length 2 that are no longer shortest) would report 3.
    val e = edges((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (1L, 4L))
    val seeds = Seq(1L).toDF("seed")
    val p = Stress.sigmaTable(e, seeds, rounds = 3)
      .filter(col("node") === 4L)
      .select("d", "sigma").as[(Long, Long)].collect()
    assert(p.toSeq === Seq((1L, 1L)))
  }

  test("multi-seed: path tables stay independent per seed") {
    // path 1-2-3: from seed 1, node 3 has (d=2, σ=1); from seed 3,
    // node 1 has (d=2, σ=1); the shared middle node is at d=1 for
    // both and must appear twice, once per seed.
    val e = edges((1L, 2L), (2L, 3L))
    val seeds = Seq(1L, 3L).toDF("seed")
    val p = Stress.sigmaTable(e, seeds, rounds = 2)
    assert(p.filter(col("node") === 2L).count() === 2L)
    val far = p.filter(col("seed") === 1L && col("node") === 3L)
      .select("d", "sigma").as[(Long, Long)].collect()
    assert(far.toSeq === Seq((2L, 1L)))
  }
}
