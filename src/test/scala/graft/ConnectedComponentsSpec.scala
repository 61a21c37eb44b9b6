package graft

import org.apache.spark.sql.functions._

import graft.ext.Dedup

/** Distributed min-label-propagation connected components vs a
  * driver-side union-find oracle: random graphs, chains (diameter
  * stress), cliques, and the empty graph.
  */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force union-find. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // canonical label = min node id of the component
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val byRoot = nodes.groupBy(find)
    byRoot.valuesIterator.flatMap { members =>
      val label = members.min
      members.map(_ -> label)
    }.toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Dedup.connectedComponents(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("property: random graphs match union-find") {
    val rnd = new scala.util.Random(53)
    for (trial <- 1 to 5) {
      val n = 30 + trial * 20
      val edges = Seq.fill(n)((rnd.nextInt(100).toLong, rnd.nextInt(100).toLong))
        .filter(e => e._1 != e._2)
      assert(run(edges) == unionFind(edges), s"trial $trial")
    }
  }

  test("chain graph: label floods the full diameter") {
    // 0-1-2-...-15 as a single path; min label 0 must reach node 15
    val edges = (0L until 15L).map(i => (i, i + 1))
    val got = run(edges)
    assert(got.values.toSet == Set(0L), got.toString)
    assert(got.keySet == (0L to 15L).toSet)
  }

  test("cliques and empty graph") {
    val clique = for (a <- 10L to 13L; b <- (a + 1) to 13L) yield (a, b)
    val two = clique ++ Seq((20L, 21L))
    val got = run(two)
    assert(got == unionFind(two))
    assert(got(13L) == 10L && got(21L) == 20L)

    val empty = Dedup.connectedComponents(
      Seq.empty[(Long, Long)].toDF("a", "b"), "a", "b")
    assert(empty.isEmpty)
  }

  test("superseded rounds release their checkpoint blocks") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    // chain of diameter 15 → ~15 rounds, each one localCheckpoint
    val edges = (0L until 15L).map(i => (i, i + 1))
    val labels = Dedup.connectedComponents(edges.toDF("a", "b"), "a", "b")
    labels.collect()
    val added = sc.getPersistentRDDs.keySet -- before
    // only the RETURNED frame's checkpoint may stay resident — sym and
    // every superseded round must have been unpersisted (without the
    // release this is ~17 entries)
    assert(added.size <= 1, s"leaked checkpoint blocks: $added")
  }

  test("two CC jobs run concurrently in one session (direct-handle release)") {
    // the old getPersistentRDDs set-diff could capture a FOREIGN rdd
    // persisted inside the diff window and destroy its only
    // (lineage-truncated) copy; direct handles make concurrent runs
    // safe — both results must still match union-find
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val chainA = (0L until 12L).map(i => (i, i + 1))
    val cliqueB = for (a <- 100L to 105L; b <- (a + 1) to 105L) yield (a, b)
    val fa = Future(run(chainA))
    val fb = Future(run(cliqueB))
    assert(Await.result(fa, 120.seconds) == unionFind(chainA))
    assert(Await.result(fb, 120.seconds) == unionFind(cliqueB))
  }

  test("one action per CC round (convergence rides the label job)") {
    // AQE splits one action into several scheduler jobs (per shuffle
    // stage), so count Dataset ACTIONS: the eager checkpoint is the
    // only action a round may fire — the old code added an isEmpty
    // convergence probe per round (~2× actions)
    val actions = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit = {
        actions.add(funcName); ()
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      // chain of diameter 15 → 16 rounds to converge (maxIter 20):
      // 2 init checkpoints + 16 round checkpoints, nothing else
      val edges = (0L until 15L).map(i => (i, i + 1))
      Dedup.connectedComponents(edges.toDF("a", "b"), "a", "b")
      Thread.sleep(500) // listener delivery is async
      import scala.jdk.CollectionConverters._
      val names = actions.asScala.toSeq
      assert(!names.contains("isEmpty"), s"convergence probe is back: $names")
      assert(names.size <= 20 + 4, s"${names.size} actions: $names")
    } finally spark.listenerManager.unregister(listener)
  }

  test("unconverged at maxIter fails loudly (round-14 advice: no partial labels)") {
    // 2 rounds flood the min label only ~2 hops down a 15-hop chain;
    // returning that truncation would silently break comp = min-member
    val edges = (0L until 15L).map(i => (i, i + 1))
    val e = intercept[IllegalStateException] {
      Dedup.connectedComponents(edges.toDF("a", "b"), "a", "b", maxIter = 2)
    }
    assert(e.getMessage.contains("converge"), e.getMessage)
  }

  test("pointer-jump: 200-hop chain converges inside default maxIter") {
    // pure one-hop flooding needs ~200 rounds; path halving from round
    // jumpFrom doubles covered distance per round (4, 8, 16, ... 256),
    // so the default maxIter=20 must suffice
    val edges = (0L until 200L).map(i => (i, i + 1))
    val got = run(edges)
    assert(got.values.toSet == Set(0L))
    assert(got.keySet == (0L to 200L).toSet)
  }
}
