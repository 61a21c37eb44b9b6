package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Published-value micro-goldens, part 32 — the graph-descriptive
  * tail. Anchors:
  *
  *  - g4 (personalized PageRank): the full 3-round integer iteration
  *    hand-traced on a 3-node purchase path (seed supplier → 741625 /
  *    204187 / 54187 exactly), plus the teleport theorem: with no
  *    seed in the graph every rank is identically zero.
  *  - g10 (Newman 2002 assortativity): the star reads r = −1 exactly
  *    (the canonical anti-assortative end), and a degree-regular
  *    graph has zero degree variance — the d1 > 0 guard must return
  *    an EMPTY frame, not a NaN row.
  *  - g11 (rich-club φ, Zhou–Mondragón): a hand 20-node purchase
  *    graph whose top decile is exactly the two degree-5 hubs joined
  *    by an edge — club density 1, graph density 28/380.
  *  - g17 (Seidman core decomposition): hand peel — a K4 on ≥2-order
  *    support is a 3-core, its ≥2-order pendant is core 1, and a
  *    single-order pair never becomes an edge at all.
  *  - g22 (ANF/HyperBall, Palmer 2002 / Boldi 2011): the 16-register
  *    sketch INDEPENDENTLY replayed — polynomial hash, rho ladder,
  *    max-merge BFS propagation, the 0.673·m² estimator — on a
  *    4-node path, all three rounds.
  */
@graft.Golden
class InferenceGolden32Spec extends SparkSpec {

  private def fixture(name: String, tables: (String, DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"golden32_$name").toString
    tables.foreach { case (t, df) =>
      df.coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  private def run(q: String, dir: String): Array[Row] =
    try SparkEntry.queries(q)(spark, dir).collect()
    finally {
      graft.queries.ParityQueries.releaseCaches()
      spark.catalog.clearCache()
    }

  /** orders + lineitem carrying exactly the given (custkey, suppkey)
    * purchase pairs, one synthetic order per pair.
    */
  private def purchases(pairs: Seq[(Long, Long)]): Seq[(String, DataFrame)] = {
    import spark.implicits._
    val orders = pairs.zipWithIndex
      .map { case ((ck, _), i) => (100L + i, ck) }
      .toDF("o_orderkey", "o_custkey")
    val lineitem = pairs.zipWithIndex
      .map { case ((_, sk), i) => (100L + i, sk) }
      .toDF("l_orderkey", "l_suppkey")
    Seq("orders" -> orders, "lineitem" -> lineitem)
  }

  test("g4_ppr_seeds: the 3-round integer PPR hand trace on a purchase " +
      "path — customer 741625, seed supplier 204187, non-seed 54187") {
    // customer 1 (node 2) buys from seed supplier 7 (node 15, 7%7=0)
    // and non-seed supplier 1 (node 3). Hand rounds (Scale 1e6, Base
    // 150000, damp 85, truncating div):
    //   r1: c=850000  s7=150000  s1=0
    //   r2: c=127500  s7=511250  s1=361250
    //   r3: c=741625  s7=204187  s1=54187
    val out = run("g4_ppr_seeds",
        fixture("ppr", purchases(Seq((1L, 7L), (1L, 1L))): _*))
      .map(r => (r.getAs[String]("kind"), r.getAs[Long]("key")) ->
        r.getAs[Long]("rank")).toMap
    assert(out == Map(
      ("customer", 1L) -> 741625L,
      ("supplier", 7L) -> 204187L,
      ("supplier", 1L) -> 54187L))
  }

  test("g4_ppr_seeds: with no seed supplier in the graph every rank is " +
      "zero — the teleport mass has nowhere to enter") {
    val out = run("g4_ppr_seeds",
      fixture("ppr0", purchases(Seq((1L, 1L), (1L, 2L), (2L, 2L))): _*))
    assert(out.isEmpty) // rank > 0 filter: PPR without seeds is all-zero
  }

  test("g10_assortativity: the star is r = -1 exactly (Newman 2002); " +
      "a degree-regular graph returns EMPTY (zero variance guard)") {
    // star: customer 1 → suppliers 1,2,3. Symmetrized m=6 directed
    // edges; su=sv=12, suu=svv=30, suv=18 → r = -36/36 = -1.
    val star = run("g10_assortativity",
      fixture("star", purchases(Seq((1L, 1L), (1L, 2L), (1L, 3L))): _*))
    assert(star.length == 1)
    assert(star.head.getAs[Long]("n_edges") == 6L)
    assert(star.head.getAs[Double]("assortativity") == -1.0)
    // 1-regular graph: two disjoint customer-supplier pairs — every
    // degree is 1, d1 = d2 = 0, and the guard yields no row
    val regular = run("g10_assortativity",
      fixture("reg", purchases(Seq((1L, 1L), (2L, 2L))): _*))
    assert(regular.isEmpty)
  }

  test("g11_rich_club: hand 20-node graph — the top decile is the two " +
      "degree-5 hubs, club density exactly 1, graph density 28/380") {
    // c1 buys from s1..s5; c2..c5 buy from s1; c6..c10 buy from
    // s6..s10 1:1. 20 nodes, 14 distinct purchase edges. Degrees:
    // c1=5, s1=5, all others 1 → club = ceil(20/10) = 2 hubs {c1,s1},
    // joined by their own trade edge → e_club=1, density 2/(2·1)=1.
    val pairs = (1L to 5L).map(sk => (1L, sk)) ++
      (2L to 5L).map(ck => (ck, 1L)) ++
      (6L to 10L).map(i => (i, i))
    val out = run("g11_rich_club", fixture("club", purchases(pairs): _*))
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("club_size") == 2L)
    assert(r.getAs[Long]("e_club") == 1L)
    assert(r.getAs[Double]("club_density") == 1.0)
    assert(r.getAs[Double]("graph_density") ==
      math.rint(28.0 / 380.0 * 1e6) / 1e6)
  }

  test("g17_core_decomposition: hand peel — the supported K4 is a " +
      "3-core, its pendant is core 1, single-order pairs are no edge") {
    import spark.implicits._
    // parts 1-4 co-occur in orders 101 AND 102 (K4 at support 2);
    // parts {1,5} share orders 103,104 (supported pendant);
    // parts {6,7} share only order 105 (support 1 → NOT an edge)
    val li = (Seq(101L, 102L).flatMap(ok => Seq(1L, 2L, 3L, 4L).map(pk => (ok, pk))) ++
        Seq(103L, 104L).flatMap(ok => Seq(1L, 5L).map(pk => (ok, pk))) ++
        Seq((105L, 6L), (105L, 7L)))
      .toDF("l_orderkey", "l_partkey")
    val out = run("g17_core_decomposition", fixture("core", "lineitem" -> li))
      .map(r => r.getAs[Long]("core") -> r.getAs[Long]("n_nodes")).toMap
    // K4 nodes peel at k=4 but survive k=3 → core 3 (Seidman: the
    // K4 degeneracy); part 5 (deg 1) falls at k=2 → core 1; parts
    // 6,7 never enter the graph
    assert(out == Map(1L -> 1L, 3L -> 4L))
  }

  // ----- g22: the ANF sketch replayed from the definition -----

  private val P = 1000000007L

  private def charHash(s: String): Long =
    s.foldLeft(7L)((acc, ch) => (acc * 31 + ch.toInt) % P)

  /** (idx, mx) register of one node — hash chain + rho ladder replay. */
  private def register(v: Long): (Long, Option[Long]) = {
    val h = (1103515245L * charHash(v.toString) + 12345L) % P
    val idx = h % 16L
    val w = h / 16L
    val mx =
      if (w == 0L) Some(27L)
      else {
        val i = java.lang.Long.numberOfTrailingZeros(w) + 1L
        if (i <= 26L) Some(i) else None // the ladder has no arm past 26
      }
    (idx, mx)
  }

  /** nf_est3 for round r: per node, max-merge the registers of its
    * distance-≤r neighborhood (self included), apply the 0.673·m²
    * estimator with 2²⁷-scaled integer denominators, ×1000, round,
    * sum over nodes.
    */
  private def anfReplay(adj: Map[Long, Set[Long]], r: Int): Long = {
    def ball(v: Long): Set[Long] = {
      var cur = Set(v)
      for (_ <- 1 to r) cur = cur ++ cur.flatMap(u => adj.getOrElse(u, Set.empty))
      cur
    }
    adj.keys.toSeq.map { v =>
      val regs = ball(v).toSeq.map(register)
        .groupBy(_._1)
        .map { case (idx, xs) =>
          idx -> xs.flatMap(_._2).reduceOption((a: Long, b: Long) => math.max(a, b))
        }
      val nz = regs.size.toLong
      val s2 = regs.values.flatten.map(mx => 1L << (27 - mx).toInt).sum
      math.round(0.673 * 34359738368.0 /
        (s2 + (16L - nz) * 134217728L).toDouble * 1000.0)
    }.sum
  }

  test("g22_neighborhood_function == the independent ANF replay " +
      "(Palmer/Boldi): hash chain, rho ladder, max-merge balls, the " +
      "0.673 m^2 estimator — all three rounds on a 4-node path") {
    // purchase path: c1-s1, c2-s1, c2-s2 → nodes 2-3-4-5 in a path
    val out = run("g22_neighborhood_function",
        fixture("anf", purchases(Seq((1L, 1L), (2L, 1L), (2L, 2L))): _*))
      .map(r => r.getAs[Long]("r") ->
        (r.getAs[Long]("nf_est3"), r.getAs[Long]("n_nodes"))).toMap
    val adj = Map[Long, Set[Long]](
      2L -> Set(3L), 3L -> Set(2L, 4L), 4L -> Set(3L, 5L), 5L -> Set(4L))
    assert(out == Map(
      1L -> ((anfReplay(adj, 1), 4L)),
      2L -> ((anfReplay(adj, 2), 4L)),
      3L -> ((anfReplay(adj, 3), 4L))))
  }
}
