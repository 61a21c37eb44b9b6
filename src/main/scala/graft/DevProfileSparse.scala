package graft

/** Dev-only: stage attribution for dedup_sparse_cosine at a given SF
  * (which stage pays, and what a warm cached re-run costs).
  * Usage: runMain graft.DevProfileSparse [sfDir] [n]
  */
object DevProfileSparse {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = args.lift(1).map(_.toInt).getOrElse(4)
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      "dev-profile-sparse")
    val fn = SparkEntry.queries("dedup_sparse_cosine")
    for (i <- 1 to n) {
      val t0 = System.nanoTime()
      val c = fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[sparse] run $i: $dt%.3f s rows=$c")
    }
    spark.stop()
  }
}
