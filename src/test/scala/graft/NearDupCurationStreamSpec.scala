package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ext.{Dedup, NearDup}
import graft.stream.NearDupCurationStream

/** Streaming near-dup curation ≡ batch (banded candidates → Jaccard
  * re-rank → connected components) — the near-dup generalization of
  * CurationStreamSpec's twin: the banding keys replace the IVF cell
  * as the blocking structure, and the proof is EXACT even though
  * banding is approximate, because both arms apply the identical
  * band criterion and re-rank (a banding recall miss is missed by
  * BOTH sides, so the edge sets still agree pair-for-pair).
  */
object NearDupCurationStreamSpec {
  final case class Doc(doc_id: Long, text: String)
}

class NearDupCurationStreamSpec extends SparkSpec {
  import NearDupCurationStreamSpec.Doc
  import spark.implicits._

  private val Threshold = 0.4
  private val MinhashK = 16
  private val ShingleK = 3

  /** Two near-dup families (exact clones + edited variants), two
    * singletons, and a LATE bridging variant (30 edits doc 3 further —
    * near 3, farther from 1/2).
    */
  private val corpus: Seq[Doc] = Seq(
    Doc(1L, "the quick brown fox jumps over the lazy dog by the misty river"),
    Doc(2L, "the quick brown fox jumps over the lazy dog by the misty river"),
    Doc(3L, "the quick brown fox jumps over the lazy dog by the old stone bridge"),
    Doc(4L, "completely different content about spark streaming and state stores"),
    Doc(5L, "yet another unrelated document mentioning parquet files and shuffles"),
    Doc(10L, "large language models train on carefully deduplicated web corpora"),
    Doc(11L, "large language models train on carefully deduplicated web corpora"),
    Doc(30L, "the quick brown fox jumps over the sleepy dog by the old stone bridge"),
    Doc(40L, "short text"),
    Doc(41L, ""))

  private def docsDf(vs: Seq[Doc]): DataFrame = vs.toDF("doc_id", "text")

  private def clusterMap(df: DataFrame): Map[Long, Long] =
    df.collect().map { r: Row =>
      r.getAs[Long]("node") -> r.getAs[Long]("comp")
    }.toMap

  private def storeKeys(df: DataFrame): Set[(Long, Int, Long, Long)] =
    df.select(col("doc_id"), col("band"),
        coalesce(col("h1"), lit(-1L)), coalesce(col("h2"), lit(-1L)))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSet

  private def runStream(batches: Seq[Seq[Doc]], name: String)
      : (Set[(Long, Int, Long, Long)], Map[Long, Long]) = {
    val m = new NearDupCurationStream.Maintainer(Threshold, MinhashK, ShingleK)
    val input = MemoryStream[Doc](spark)
    val query = input.toDS().writeStream
      .foreachBatch((ds: org.apache.spark.sql.Dataset[Doc], id: Long) =>
        m.ingest(ds.toDF(), id))
      .outputMode("update").queryName(name).start()
    try {
      batches.foreach { b =>
        if (b.nonEmpty) input.addData(b)
        query.processAllAvailable()
      }
      (m.bandIndex.map(storeKeys).getOrElse(Set.empty),
        m.clusters.map(clusterMap).getOrElse(Map.empty))
    } finally {
      query.stop()
      m.release()
    }
  }

  private def batchTwin(vs: Seq[Doc])
      : (Set[(Long, Int, Long, Long)], Map[Long, Long]) = {
    val sigs = NearDupCurationStream.signatures(docsDf(vs), MinhashK, ShingleK)
    val bandKey = Seq("band", "h1", "h2")
    val edges = sigs.as("a").join(sigs.as("b"),
        bandKey.map(k => col(s"a.$k") === col(s"b.$k")).reduce(_ && _) &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("src"), col("b.doc_id").as("dst"),
        col("a.hs").as("hsa"), col("b.hs").as("hsb"))
      .distinct()
      .filter(round(NearDup.jaccard(col("hsa"), col("hsb")), 6) >= Threshold)
      .select("src", "dst")
    val cc =
      if (edges.isEmpty) Map.empty[Long, Long]
      else clusterMap(Dedup.connectedComponents(edges, "src", "dst"))
    (storeKeys(sigs), cc)
  }

  test("stream == batch twin across three batchings incl. doc-at-a-time") {
    val (expStore, expClusters) = batchTwin(corpus)
    // structural sanity on the BATCH arm the twin is judged against:
    // exact clones always co-band (identical signatures) at Jaccard 1
    assert(expClusters.get(1L) == expClusters.get(2L) &&
      expClusters.contains(1L))
    assert(expClusters.get(10L) == expClusters.get(11L) &&
      expClusters.contains(10L))
    for ((batches, name) <- Seq(
        (Seq(corpus), "ndc_one"),
        (corpus.grouped(3).toSeq, "ndc_three"),
        (corpus.map(Seq(_)), "ndc_single"))) {
      val (gotStore, gotClusters) = runStream(batches, name)
      assert(gotStore == expStore, s"$name store")
      assert(gotClusters == expClusters, s"$name clusters")
    }
  }

  test("late bridging variant merges standing near-dup clusters across " +
      "batches; untouched family passes through") {
    // 1/2/3's family and 10/11 settle early; 30 (variant of 3) arrives
    // alone later — whatever the batch arm says, the stream must agree
    val batches = Seq(
      corpus.filter(_.doc_id <= 5),
      corpus.filter(d => d.doc_id >= 10 && d.doc_id < 30),
      Seq.empty,
      corpus.filter(_.doc_id >= 30))
    val (gotStore, gotClusters) = runStream(batches, "ndc_late")
    val (expStore, expClusters) = batchTwin(corpus)
    assert(gotClusters == expClusters)
    assert(gotStore == expStore)
  }

  test("property: random corpora from a small token pool match the batch " +
      "twin under random batchings") {
    val pool = Seq("spark", "data", "stream", "join", "shuffle", "token",
      "model", "train", "corpus", "batch", "state", "store")
    val rnd = new scala.util.Random(29)
    for (trial <- 1 to 2) {
      val docs = (1 to 18).map { i =>
        val n = 6 + rnd.nextInt(7)
        Doc(i.toLong, Seq.fill(n)(pool(rnd.nextInt(pool.length))).mkString(" "))
      } ++ Seq(Doc(100L, ""), Doc(101L, "one"))
      val vs = rnd.shuffle(docs)
      val batches = {
        val out = Seq.newBuilder[Seq[Doc]]
        var rest = vs
        while (rest.nonEmpty) {
          val k = 1 + rnd.nextInt(math.max(1, rest.length))
          out += rest.take(k); rest = rest.drop(k)
        }
        out.result()
      }
      val (expStore, expClusters) = batchTwin(vs)
      val (gotStore, gotClusters) = runStream(batches, s"ndc_prop$trial")
      assert(gotStore == expStore, s"trial $trial store")
      assert(gotClusters == expClusters, s"trial $trial clusters")
    }
  }
}
