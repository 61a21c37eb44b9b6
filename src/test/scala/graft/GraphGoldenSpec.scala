package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Structural-theorem micro-goldens for the GRAPH family (g1-g22) —
  * part 5 of the round-12 golden program. The graph operators were
  * the largest remaining family with no anchor independent of the
  * shared Spark/DuckDB derivation; unlike the inference family their
  * natural anchors are exact graph theorems on tiny hand-built
  * graphs, reached through the queries' own edge derivations (orders
  * × lineitem co-purchase and customer↔supplier bipartite graphs),
  * so the support thresholds, node encodings, and seed rules are
  * exercised too.
  *
  * Anchors:
  *  - Triangles: every vertex of K₆ closes C(5,2) = 10 triangles
  *    (deg 5), total C(6,3) = 20.
  *  - Transitivity: 1 on a clique, 0 on a star (the two ends of the
  *    clustering spectrum — Watts-Strogatz's calibration points).
  *  - k-core (Seidman 1983): a clique Kₙ is its own (n−1)-core — a
  *    k = 3 peel removes nothing from K₆ and removes exactly the
  *    pendant from K₄+pendant, then stabilizes; the frontier peel
  *    must emit the identical trajectory.
  *  - PageRank (Page et al. 1999): on a REGULAR graph the rank
  *    vector is uniform (the transition matrix is doubly stochastic)
  *    — and the engine's integer lattice preserves the uniformity
  *    EXACTLY, every node's arithmetic being identical.
  *  - HITS (Kleinberg 1999): on a complete bipartite graph hubs are
  *    uniform and authorities are uniform — the paper's own motivating
  *    fixed point.
  *  - SSSP: hand-exact Bellman-Ford distances along a weighted path
  *    (each round relaxes one more hop).
  *  - LPA (Raghavan et al. 2007): on disjoint dense components the
  *    propagation converges to one label per component.
  */
@graft.Golden
class GraphGoldenSpec extends SparkSpec {

  private def fixture(name: String, tables: (String, DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"goldeng_$name").toString
    tables.foreach { case (t, df) =>
      df.coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  private def run(q: String, dir: String): Array[Row] =
    try SparkEntry.queries(q)(spark, dir).collect()
    finally {
      graft.queries.EventQueries.releaseCaches()
      graft.queries.TextQueries.releaseCaches()
      graft.queries.ParityQueries.releaseCaches()
      PlanWindows.releaseAll()
      spark.catalog.clearCache()
    }

  /** orders = (o_orderkey, o_custkey); lines = (l_orderkey,
    * l_partkey, l_suppkey, l_quantity, l_extendedprice).
    */
  private def graphTables(orders: Seq[(Long, Long)],
      lines: Seq[(Long, Long, Long, Double, Double)]): Seq[(String, DataFrame)] = {
    import spark.implicits._
    Seq(
      "orders" -> orders.toDF("o_orderkey", "o_custkey"),
      "lineitem" -> lines.toDF("l_orderkey", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice"))
  }

  /** One order per (okey, custkey) whose lineitems name the given
    * (partkey, suppkey, price) triples.
    */
  private def order(ok: Long, ck: Long,
      items: Seq[(Long, Long, Double)]): (Seq[(Long, Long)], Seq[(Long, Long, Long, Double, Double)]) =
    (Seq((ok, ck)),
      items.map { case (pk, sk, pr) => (ok, pk, sk, 48.0, pr) })

  private def merge(parts: (Seq[(Long, Long)], Seq[(Long, Long, Long, Double, Double)])*)
      : Seq[(String, DataFrame)] =
    graphTables(parts.flatMap(_._1), parts.flatMap(_._2))

  // ===================================================================
  // 1. Triangles — every K₆ vertex closes C(5,2) = 10
  // ===================================================================

  test("g2_triangles: one 6-part order is K6 — every part has deg 5 and " +
      "C(5,2) = 10 triangles") {
    val dir = fixture("k6", merge(
      order(1L, 1L, (11L to 16L).map(pk => (pk, 1L, 1.0)))): _*)
    val out = run("g2_triangles", dir)
      .map(r => (r.getAs[Long]("part_key"), r.getAs[Long]("deg"),
        r.getAs[Long]("tri")))
    assert(out.length == 6)
    assert(out.map(_._1).sorted.toSeq == (11L to 16L))
    out.foreach { case (pk, deg, tri) =>
      assert(deg == 5L && tri == 10L, s"part $pk: deg $deg tri $tri")
    }
  }

  // ===================================================================
  // 2. Transitivity — the clique/star calibration points
  // ===================================================================

  test("g12_transitivity is exactly 1 on a clique and 0 on a star") {
    // support threshold is >= 2 orders, so every shape ships twice
    val clique = fixture("t_k6", merge(
      order(1L, 1L, (11L to 16L).map(pk => (pk, 1L, 1.0))),
      order(2L, 1L, (11L to 16L).map(pk => (pk, 1L, 1.0)))): _*)
    val r = run("g12_transitivity", clique).head
    assert(r.getAs[Long]("n_nodes") == 6L)
    assert(r.getAs[Long]("n_triangles") == 20L) // C(6,3)
    assert(r.getAs[Long]("wedges") == 60L) // 6 · C(5,2)
    assert(r.getAs[Double]("transitivity") == 1.0)

    // star: hub part 10 with three 2-part orders (each twice)
    val star = fixture("t_star", merge(
      (1 to 3).flatMap { leaf =>
        Seq(order(leaf * 10L, 1L, Seq((10L, 1L, 1.0), (10L + leaf, 1L, 1.0))),
          order(leaf * 10L + 1, 1L, Seq((10L, 1L, 1.0), (10L + leaf, 1L, 1.0))))
      }: _*): _*)
    val r2 = run("g12_transitivity", star).head
    assert(r2.getAs[Long]("n_triangles") == 0L)
    assert(r2.getAs[Long]("wedges") == 3L) // C(3,2) at the hub
    assert(r2.getAs[Double]("transitivity") == 0.0)
  }

  // ===================================================================
  // 3. k-core peel — Seidman's clique invariance, pendant removal,
  //    and frontier ≡ pinned on the same fixtures
  // ===================================================================

  test("g3_kcore and g3b_kcore_frontier: K6 survives a k=3 peel untouched; " +
      "K4+pendant loses exactly the pendant (Seidman 1983)") {
    def trajectory(q: String, dir: String): Seq[(Long, Long, Long, Long)] =
      run(q, dir).map(r => (r.getAs[Long]("round"), r.getAs[Long]("n_removed"),
        r.getAs[Long]("n_nodes"), r.getAs[Long]("n_edges"))).toSeq

    val k6 = fixture("core_k6", merge(
      order(1L, 1L, (11L to 16L).map(pk => (pk, 1L, 1.0))),
      order(2L, 1L, (11L to 16L).map(pk => (pk, 1L, 1.0)))): _*)
    val expectK6 = (1L to 4L).map(r => (r, 0L, 6L, 15L))
    assert(trajectory("g3_kcore", k6) == expectK6)
    assert(trajectory("g3b_kcore_frontier", k6) == expectK6)

    // K4 on parts 1-4 plus pendant part 5 hanging off part 4
    val pend = fixture("core_pend", merge(
      order(1L, 1L, (1L to 4L).map(pk => (pk, 1L, 1.0))),
      order(2L, 1L, (1L to 4L).map(pk => (pk, 1L, 1.0))),
      order(3L, 1L, Seq((4L, 1L, 1.0), (5L, 1L, 1.0))),
      order(4L, 1L, Seq((4L, 1L, 1.0), (5L, 1L, 1.0)))): _*)
    val expectPend = (1L, 1L, 4L, 6L) +: (2L to 4L).map(r => (r, 0L, 4L, 6L))
    assert(trajectory("g3_kcore", pend) == expectPend)
    assert(trajectory("g3b_kcore_frontier", pend) == expectPend)
  }

  // ===================================================================
  // 4. PageRank + HITS — regular/complete-bipartite uniformity
  // ===================================================================

  test("g1_pagerank is exactly uniform on the 3-regular K_{3,3} purchase " +
      "graph; g6_hits hubs and authorities are uniform (Kleinberg's fixed point)") {
    // customers 1..3 each buy from suppliers 1..3 — complete
    // bipartite, every node degree 3
    val dir = fixture("k33", merge(
      (1L to 3L).map(c =>
        order(c, c, (1L to 3L).map(sk => (100L + sk, sk, 1.0)))): _*): _*)
    val pr = run("g1_pagerank", dir)
      .map(r => (r.getAs[String]("kind"), r.getAs[Long]("key"),
        r.getAs[Long]("rank")))
    assert(pr.length == 6)
    assert(pr.map(_._3).distinct.length == 1, // doubly stochastic ⇒ uniform
      s"ranks not uniform: ${pr.mkString(", ")}")
    assert(pr.count(_._1 == "customer") == 3 && pr.count(_._1 == "supplier") == 3)

    val hits = run("g6_hits", dir)
      .map(r => (r.getAs[String]("kind"), r.getAs[Long]("key"),
        r.getAs[Long]("score"), r.getAs[Long]("rk")))
    val hubs = hits.filter(_._1 == "customer")
    val auths = hits.filter(_._1 == "supplier")
    assert(hubs.length == 3 && auths.length == 3)
    assert(hubs.map(_._3).distinct.length == 1)
    assert(auths.map(_._3).distinct.length == 1)
    // equal scores rank by key: 1, 2, 3
    assert(hubs.sortBy(_._2).map(_._4).toSeq == Seq(1L, 2L, 3L))
  }

  // ===================================================================
  // 5. SSSP — hand-exact Bellman-Ford along a weighted path
  // ===================================================================

  test("g13_sssp relaxes a weighted path to its exact Bellman-Ford " +
      "distances, one hop per round") {
    // c1 -100- s1 -200- c2 -300- s2 -400- c3 (weights in cents =
    // min l_extendedprice·100 per customer-supplier pair)
    val dir = fixture("path", merge(
      order(1L, 1L, Seq((900L, 1L, 1.0))),
      order(2L, 2L, Seq((901L, 1L, 2.0))),
      order(3L, 2L, Seq((902L, 2L, 3.0))),
      order(4L, 3L, Seq((903L, 2L, 4.0)))): _*)
    val out = run("g13_sssp", dir)
      .map(r => (r.getAs[String]("kind"), r.getAs[Long]("key"),
        r.getAs[Long]("dist"), r.getAs[Long]("n_reached")))
    // seed = min node = customer 1 (excluded from output)
    assert(out.toSeq == Seq(
      ("supplier", 1L, 100L, 5L),
      ("customer", 2L, 300L, 5L),
      ("supplier", 2L, 600L, 5L),
      ("customer", 3L, 1000L, 5L)))
  }

  // ===================================================================
  // 6. LPA — one label per dense component
  // ===================================================================

  test("g5_label_prop converges to one community per disjoint K_{2,2} " +
      "(Raghavan et al. 2007)") {
    // two disjoint complete-bipartite components (quantity 48 clears
    // the query's l_quantity > 47 edge filter)
    val dir = fixture("lpa", merge(
      order(1L, 1L, Seq((800L, 1L, 1.0), (801L, 2L, 1.0))),
      order(2L, 2L, Seq((802L, 1L, 1.0), (803L, 2L, 1.0))),
      order(3L, 3L, Seq((804L, 3L, 1.0), (805L, 4L, 1.0))),
      order(4L, 4L, Seq((806L, 3L, 1.0), (807L, 4L, 1.0)))): _*)
    val out = run("g5_label_prop", dir)
      .map(r => (r.getAs[Long]("size"), r.getAs[Long]("n_communities")))
    assert(out.toSeq == Seq((4L, 2L)))
  }
}
