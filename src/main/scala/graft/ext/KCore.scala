package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core peel with pinned rounds — the degeneracy-ordering primitive
  * of graph curation (Seidman's k-core; Matula/Beck peel): repeatedly
  * delete nodes whose CURRENT degree is below k, and what survives is
  * the k-core — the subgraph where boilerplate-driven tendrils and
  * one-off co-occurrences have been peeled away, leaving the densely
  * connected community structure. Same curation family as
  * [[PageRank]] (global centrality) and [[Triangles]] (local
  * closure): the core number gates which documents/entities sit in a
  * robust neighborhood vs hang off the graph's periphery.
  *
  * Cross-engine exact by the [[PageRank]] recipe: rounds are PINNED
  * (the output is the R-round peel, a pure integer function of the
  * edge list — converged iff a round removes zero nodes, visible in
  * the emitted per-round stats), every quantity an exact long count,
  * so DuckDB replays the identical peel as an unrolled CTE
  * ([[Sql.rounds]]) and must land on identical rows.
  *
  * Spark shape per round: one degree aggregation over the remaining
  * edges (uniform-key shuffle), a sub-k filter, two anti joins to
  * drop incident edges (the removed set is ≤ \|nodes\| and shrinks
  * fast — AQE broadcasts it), and three scalar aggregates for the
  * round's stats row. Each round's edge set is persisted through the
  * caller's [[graft.queries.TrackedCache]]: the peel re-reads e_r
  * once for degrees, twice for stats, and once as the next round's
  * input, so an uncached formulation would recompute the (shrinking)
  * graph O(R) times. At production scale the peel is frontier-able
  * exactly like [[Dedup.connectedComponents]] — only neighbors of
  * removed nodes can change degree — but the pinned-round full
  * recompute IS the oracle-replayable form, and R is small (core
  * gating uses shallow peels; full degeneracy ordering would iterate
  * to fixpoint with the frontier discipline).
  *
  * Output: one row per round — (round, n_removed, n_nodes, n_edges),
  * node/edge counts AFTER the round's deletions. Bounded by R at any
  * data scale.
  */
object KCore {

  /** R pinned peel rounds at threshold k over an undirected simple
    * edge list (u, v), u < v, one row per edge. `cache` persists each
    * round's shrinking edge set (released by the owning registry).
    */
  def peelStats(edges: DataFrame, k: Int, rounds: Int,
      cache: DataFrame => DataFrame): DataFrame = {
    var e = cache(edges)
    val stats = (1 to rounds).map { r =>
      val deg = e.select(col("u").as("n"))
        .unionAll(e.select(col("v").as("n")))
        .groupBy("n").agg(count(lit(1)).as("dg"))
      val bad = deg.filter(col("dg") < k).select("n")
      val next = cache(
        e.join(bad.withColumnRenamed("n", "u"), Seq("u"), "left_anti")
          .join(bad.withColumnRenamed("n", "v"), Seq("v"), "left_anti")
          .select("u", "v"))
      val nNodes = next.select(col("u").as("n"))
        .unionAll(next.select(col("v").as("n")))
        .agg(countDistinct(col("n")).as("n_nodes"))
      val row = bad.agg(count(lit(1)).as("n_removed"))
        .crossJoin(broadcast(nNodes))
        .crossJoin(broadcast(next.agg(count(lit(1)).as("n_edges"))))
        .select(lit(r.toLong).as("round"), col("n_removed"),
          col("n_nodes"), col("n_edges"))
      e = next
      row
    }
    stats.reduce(_ unionAll _)
  }

  /** DuckDB mirror: unrolled rounds over a CTE `e0` (u, v) — emits
    * `d1/bad1/e1/s1 … s{rounds}` with the identical peel; select
    * `SELECT * FROM s1 UNION ALL … ORDER BY round` after it.
    */
  object Sql {

    def rounds(k: Int, n: Int): String =
      (1 to n).map { r =>
        val p = r - 1
        s"""d$r AS (SELECT n, count(*) AS dg FROM (
           |  SELECT u AS n FROM e$p UNION ALL SELECT v FROM e$p) GROUP BY 1),
           |bad$r AS (SELECT n FROM d$r WHERE dg < $k),
           |e$r AS (SELECT e.u, e.v FROM e$p e
           |  LEFT JOIN bad$r bu ON e.u = bu.n
           |  LEFT JOIN bad$r bv ON e.v = bv.n
           |  WHERE bu.n IS NULL AND bv.n IS NULL),
           |s$r AS (SELECT CAST($r AS BIGINT) AS round,
           |  (SELECT count(*) FROM bad$r)::BIGINT AS n_removed,
           |  (SELECT count(DISTINCT n) FROM (
           |    SELECT u AS n FROM e$r UNION ALL SELECT v FROM e$r))::BIGINT AS n_nodes,
           |  (SELECT count(*) FROM e$r)::BIGINT AS n_edges)""".stripMargin
      }.mkString(",\n")

    def select(n: Int): String =
      (1 to n).map(r => s"SELECT * FROM s$r")
        .mkString("", " UNION ALL ", " ORDER BY round")
  }
}
