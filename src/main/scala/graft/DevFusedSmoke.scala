package graft

/** Dev-only smoke for the streaming-ANN bench block (hot-swap + the
  * round-15 fused-curation pass) at a small SF — exercises the exact
  * code path the close-out bench runs, without the 18-minute full
  * bench or touching BENCH_TIMES (no mirror write in this path).
  */
object DevFusedSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val block = args.drop(1).headOption.getOrElse("ann")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"),
      "graft-dev-fused")
    try println(block match {
      case "ann"  => Bench.streamingAnnBench(spark, sfDir)
      case "docs" => Bench.docStreamingBench(spark, sfDir)
      case other  => sys.error(s"unknown block '$other' (ann|docs)")
    })
    finally spark.stop()
  }
}
