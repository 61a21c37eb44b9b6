package graft

/** Dev-only smoke for the streaming-ANN bench block (hot-swap + the
  * round-15 fused-curation pass) at a small SF — exercises the exact
  * code path the close-out bench runs, without the 18-minute full
  * bench or touching BENCH_TIMES (no mirror write in this path).
  */
object DevFusedSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"),
      "graft-dev-fused")
    try println(Bench.streamingAnnBench(spark, sfDir))
    finally spark.stop()
  }
}
