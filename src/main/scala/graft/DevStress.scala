package graft

/** Dev tool: run registry queries against an enlarged corpus to find
  * scale cliffs the sf0.1 bench can't see (e.g. the 30-bit simhash
  * band collapse — 58 s at 40 k docs — found this way in round 3).
  *
  *   # build an 8x documents corpus with planted exact-dup clones:
  *   #   COPY (SELECT doc_id + c*1000000 AS doc_id, text, lang, source,
  *   #         n_chars FROM '<sf0.1>/documents.parquet',
  *   #         (SELECT unnest(range(8)) AS c))
  *   #   TO '/tmp/sfbig/documents.parquet' (FORMAT parquet)
  *   sbt 'runMain graft.DevStress /tmp/sfbig q1 q2 ...'
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
        "sim7_label_centroids")
    val spark = Sessions.local("4", "graft-stress")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[stress] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    names.foreach { q =>
      time(q) {
        val n = SparkEntry.queries(q)(spark, sfDir).count()
        println(s"[stress]   rows: $n")
      }
    }
    graft.queries.DedupQueries.releaseSignatureCache()
    graft.queries.SimilarityQueries.releaseCaches()
    spark.stop()
  }
}
