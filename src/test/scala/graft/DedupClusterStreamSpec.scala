package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ext.Dedup
import graft.stream.DedupClusterStream

/** Streaming dup-cluster maintenance ≡ the batch connected components
  * (round-13 verdict ask 5, the Scd2StreamSpec equality pattern): a
  * similarity-edge stream fed through foreachBatch micro-batches must
  * leave the Maintainer's (node → component) assignment IDENTICAL to
  * Dedup.connectedComponents over the full edge set, for ANY
  * sequential batching — including edge-at-a-time, where the
  * cross-batch cases (bridging two standing clusters, growing one,
  * untouched pass-through) all occur.
  */
object DedupClusterStreamSpec {
  final case class Edge(src: Long, dst: Long)
}

class DedupClusterStreamSpec extends SparkSpec {
  import DedupClusterStreamSpec.Edge
  import spark.implicits._

  private def asMap(df: DataFrame): Map[Long, Long] =
    df.collect().map { r: Row =>
      r.getAs[Long]("node") -> r.getAs[Long]("comp")
    }.toMap

  private def runStream(batches: Seq[Seq[Edge]], name: String): Map[Long, Long] = {
    val m = new DedupClusterStream.Maintainer("src", "dst")
    val input = MemoryStream[Edge](spark)
    val query = input.toDS().writeStream
      .foreachBatch((ds: org.apache.spark.sql.Dataset[Edge], id: Long) =>
        m.merge(ds.toDF(), id))
      .outputMode("update").queryName(name).start()
    try {
      batches.foreach { b =>
        if (b.nonEmpty) input.addData(b)
        query.processAllAvailable()
      }
      val out = m.assignments.map(asMap).getOrElse(Map.empty)
      out
    } finally {
      query.stop()
      m.release()
    }
  }

  private def batchCC(edges: Seq[Edge]): Map[Long, Long] =
    asMap(Dedup.connectedComponents(
      edges.toDF("src", "dst").select(col("src").as("a"), col("dst").as("b")),
      "a", "b"))

  /** Random edge set over few nodes so clusters collide and bridge. */
  private def randomEdges(seed: Long, nNodes: Int, nEdges: Int): Seq[Edge] = {
    val rnd = new scala.util.Random(seed)
    (1 to nEdges).map { _ =>
      val a = rnd.nextInt(nNodes).toLong + 1
      val b = rnd.nextInt(nNodes).toLong + 1
      if (a == b) Edge(a, b + 1) else Edge(a, b)
    }
  }

  test("stream == batch across three batchings including edge-at-a-time") {
    val edges = randomEdges(seed = 7L, nNodes = 18, nEdges = 30)
    val expected = batchCC(edges)
    assert(expected.nonEmpty)
    val oneShot = runStream(Seq(edges), "dcs_one")
    assert(oneShot == expected)
    val three = runStream(edges.grouped(10).toSeq, "dcs_three")
    assert(three == expected)
    val single = runStream(edges.map(Seq(_)), "dcs_single")
    assert(single == expected)
  }

  test("a bridge edge merges two standing clusters under the global-min " +
      "representative; untouched clusters pass through unchanged") {
    // batch 1: three disjoint clusters {1,2,3}, {10,11}, {20,21}
    val b1 = Seq(Edge(1, 2), Edge(2, 3), Edge(10, 11), Edge(20, 21))
    // batch 2: bridge 3-10 merges the first two; {20,21} untouched
    val b2 = Seq(Edge(3, 10))
    val out = runStream(Seq(b1, b2), "dcs_bridge")
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 1L, 11L -> 1L,
      20L -> 20L, 21L -> 20L))
    assert(out == batchCC(b1 ++ b2))
  }

  test("an empty micro-batch is a no-op and a new-node edge attaches to " +
      "the standing cluster without renaming it") {
    val b1 = Seq(Edge(5, 6))
    val b3 = Seq(Edge(6, 7)) // 7 is new; comp stays 5
    val out = runStream(Seq(b1, Seq.empty, b3), "dcs_grow")
    assert(out == Map(5L -> 5L, 6L -> 5L, 7L -> 5L))
  }

  test("a smaller-id newcomer RENAMES the touched cluster (min-label " +
      "semantics survive incrementality)") {
    val out = runStream(Seq(Seq(Edge(5, 6)), Seq(Edge(1, 6))), "dcs_min")
    assert(out == Map(1L -> 1L, 5L -> 1L, 6L -> 1L))
  }
}
