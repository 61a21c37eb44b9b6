package graft

import org.apache.spark.sql.functions._

import graft.ext.PageRank

/** PageRank contract: the iteration must agree with an independent
  * plain-Scala replay of the integer update on a hand-built graph,
  * ranks must respect the conservation bounds the integer update
  * implies, and the plan must stay equi-join-only.
  */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  test("matches a plain-Scala replay on a small graph") {
    // path graph 1-2-3 plus a pendant 4 attached to 2, symmetrized
    val und = Seq((1L, 2L), (2L, 3L), (2L, 4L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")

    val rounds = 3
    val got = PageRank.ranks(edges, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // independent replay with plain Scala longs
    val adj = (und ++ und.map(_.swap)).groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val deg = adj.view.mapValues(_.size.toLong).toMap
    var rank = adj.keys.map(_ -> PageRank.Scale).toMap
    for (_ <- 1 to rounds) {
      val contrib = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for ((u, vs) <- adj; v <- vs) contrib(v) += rank(u) / deg(u)
      rank = adj.keys.map(n =>
        n -> (PageRank.Base + PageRank.DampNum * contrib(n) / 100L)).toMap
    }
    assert(got == rank, s"got $got expected $rank")
    // the well-connected hub must outrank the pendant
    assert(got(2L) > got(4L))
  }

  test("g1_pagerank plan is equi-join-only; ranks respect integer conservation") {
    val sf = "/root/testdata/sf0.001"
    val df = SparkEntry.queries("g1_pagerank")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    val rows = df.collect()
    assert(rows.length == 20)
    // every rank >= the damping base; floor-division only loses mass,
    // so no rank can exceed nodes * Scale (loose sanity bound)
    assert(rows.forall(_.getLong(2) >= PageRank.Base))
  }

  test("personalized ranks match a plain-Scala replay and localize to seeds") {
    // two components: seed-side path 1-2-3, far pair 10-11 (no seed)
    val und = Seq((1L, 2L), (2L, 3L), (10L, 11L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val rounds = 3
    val got = PageRank
      .personalizedRanks(edges, col("node") === 1L, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val adj = (und ++ und.map(_.swap)).groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val deg = adj.view.mapValues(_.size.toLong).toMap
    val seed = Set(1L)
    var rank = adj.keys.map(n => n -> (if (seed(n)) PageRank.Scale else 0L)).toMap
    for (_ <- 1 to rounds) {
      val contrib = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for ((u, vs) <- adj; v <- vs) contrib(v) += rank(u) / deg(u)
      rank = adj.keys.map(n =>
        n -> ((if (seed(n)) PageRank.Base else 0L) +
          PageRank.DampNum * contrib(n) / 100L)).toMap
    }
    assert(got == rank, s"got $got expected $rank")
    // mass localizes: the disconnected component holds zero rank
    // while every node reachable from the seed holds some
    assert(got(10L) == 0L && got(11L) == 0L)
    assert(got(1L) > 0L && got(2L) > 0L && got(3L) > 0L)
  }
}
