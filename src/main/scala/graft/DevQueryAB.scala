package graft

/** Dev-only A/B timing for any registry queries (args = query names;
  * default compares the as-of formulations). Bench protocol per
  * query: one untimed warm-up, then N cold-data samples (clearCache
  * before each, noop sink).
  */
object DevQueryAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val n = sys.env.getOrElse("SPARK_GRAFT_AB_N", "5").toInt
    val names = if (args.nonEmpty) args.toSeq
      else Seq("j2_asof_last_click", "j2c_asof_native")
    val spark = Sessions.local(cpus, "graft-query-ab")

    def run(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    for (name <- names) {
      run(name) // warm-up
      val xs = (1 to n).map { _ => spark.catalog.clearCache(); run(name) }
      val sorted = xs.sorted
      println(f"[query-ab] $name%-28s n=${xs.length} min=${sorted.head}%.3f " +
        f"med=${sorted(xs.length / 2)}%.3f max=${sorted.last}%.3f " +
        f"samples=${xs.map(x => f"$x%.3f").mkString(",")}")
    }
    graft.queries.DedupQueries.releaseSignatureCache()
    graft.queries.SimilarityQueries.releaseCaches()
    graft.queries.ParityQueries.releaseCaches()
    spark.stop()
  }
}
