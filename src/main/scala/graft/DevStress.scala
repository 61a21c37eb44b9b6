package graft

/** Dev tool: run registry queries against an enlarged corpus to find
  * scale cliffs the sf0.1 bench can't see (e.g. the 30-bit simhash
  * band collapse — 58 s at 40 k docs — found this way in round 3).
  *
  * The default list reads BOTH documents.parquet and
  * embeddings.parquet — build both (8× with shifted ids; the
  * embedding copies create 8-clone identity clusters, a deliberate
  * output-bound stress for the near-dup paths):
  *
  *   # COPY (SELECT doc_id + c*1000000 AS doc_id, text, lang, source,
  *   #       n_chars FROM '<sf0.1>/documents.parquet',
  *   #       (SELECT unnest(range(8)) AS c))
  *   #   TO '/tmp/sfbig/documents.parquet' (FORMAT parquet)
  *   # COPY (SELECT vec_id + c*100000 AS vec_id, embedding, label
  *   #       FROM '<sf0.1>/embeddings.parquet',
  *   #       (SELECT unnest(range(8)) AS c))
  *   #   TO '/tmp/sfbig/embeddings.parquet' (FORMAT parquet)
  *   sbt 'runMain graft.DevStress /tmp/sfbig q1 q2 ...'
  *
  * A query that throws (e.g. a missing table) is reported and the
  * sweep continues — earlier timings are never lost to a later
  * failure.
  */
object DevStress {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("dedup_minhash_pairs", "dedup_simhash_pairs", "pipeline_curation",
        "dedup_exact_keep_first", "split_train_holdout",
        // round-4 additions with non-trivial scale arithmetic
        "dedup_embedding_lsh", "dedup_components", "dedup_incremental",
        "tx10_tfidf_top_terms", "tx12_bigram_lm_score", "tx13_passage_dedup",
        "sim7_label_centroids",
        // round-5: candidate-pair set scales with clone clusters
        "dedup_containment_pairs")
    val spark = Sessions.local("4", "graft-stress")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[stress] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    names.foreach { q =>
      try time(q) {
        val n = SparkEntry.queries(q)(spark, sfDir).count()
        println(s"[stress]   rows: $n")
      } catch {
        // NonFatal: a query failure is survivable, an OOM/LinkageError
        // means corrupted executor state — let those crash the sweep
        case scala.util.control.NonFatal(e) =>
          println(s"[stress] $q FAILED: " +
            Option(e.getMessage).getOrElse(e.getClass.getName).takeWhile(_ != '\n'))
      }
    }
    graft.queries.DedupQueries.releaseSignatureCache()
    graft.queries.SimilarityQueries.releaseCaches()
    spark.stop()
  }
}
