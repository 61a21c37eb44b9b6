package graft

import graft.ext.Hits

/** HITS contract: the iteration must agree with an independent
  * plain-Scala replay of the integer update on a hand-built
  * bipartite graph, max-normalization must pin each side's top
  * score to exactly Scale, and the registered query's plan must
  * stay equi-join + broadcast-only.
  */
class HitsSpec extends SparkSpec {
  import spark.implicits._

  test("matches a plain-Scala replay on a small bipartite graph") {
    // hubs {1,2,3} → auths {10,11,12}: hub 1 reaches all three
    // auths, hub 2 reaches {10,11}, hub 3 only the shared auth 10
    val es = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 10L), (2L, 11L), (3L, 10L))
    val edges = es.toDF("hub", "auth")

    val rounds = 2
    val (hubsDf, authsDf) = Hits.hubsAuthorities(edges, rounds)
    val gotH = hubsDf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gotA = authsDf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // independent replay with plain Scala longs
    var h = es.map(_._1).distinct.map(_ -> Hits.Scale).toMap
    var a = Map.empty[Long, Long]
    for (_ <- 1 to rounds) {
      val araw = es.groupBy(_._2).view.mapValues(_.map(e => h(e._1)).sum).toMap
      val amax = araw.values.max
      a = araw.view.mapValues(v => v * Hits.Scale / amax).toMap
      val hraw = es.groupBy(_._1).view.mapValues(_.map(e => a(e._2)).sum).toMap
      val hmax = hraw.values.max
      h = hraw.view.mapValues(v => v * Hits.Scale / hmax).toMap
    }
    assert(gotH == h, s"hubs: got $gotH expected $h")
    assert(gotA == a, s"auths: got $gotA expected $a")
    // max-normalization pins each side's top to exactly Scale
    assert(gotH.values.max == Hits.Scale && gotA.values.max == Hits.Scale)
    // mutual reinforcement: the broadest hub and the most-reached
    // authority win their sides
    assert(gotH(1L) > gotH(3L) && gotA(10L) > gotA(12L))
  }

  test("g6_hits plan is equi-join + broadcast-only and emits both sides") {
    val sf = "/root/testdata/sf0.001"
    val df = SparkEntry.queries("g6_hits")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    val rows = df.collect()
    assert(rows.nonEmpty && rows.map(_.getString(0)).toSet == Set("customer", "supplier"))
    // scores are scaled longs in [0, Scale]
    assert(rows.forall(r => r.getLong(2) >= 0L && r.getLong(2) <= Hits.Scale))
  }
}
