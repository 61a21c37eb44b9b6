package graft

/** Dev tool: run ONLY the census and/or docs streaming blocks with
  * the standard env knobs and print their JSON — the attribution
  * harness for the (round-8, now median-of-n) streaming tiers,
  * mirroring [[DevStatefulBlock]].
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *   sbt 'runMain graft.DevStreamBlock docs'        # docs only
  *   sbt 'runMain graft.DevStreamBlock census docs' # both
  */
object DevStreamBlock {
  def main(args: Array[String]): Unit = {
    val which = if (args.isEmpty) Seq("census", "docs") else args.toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local(cpus, "graft-stream-block")
    which.foreach {
      case "census" =>
        println(s"[stream-block] census ${Bench.streamingBench(spark)}")
      case "docs" =>
        println(s"[stream-block] docs ${Bench.docStreamingBench(spark, sfDir)}")
      case other => sys.error(s"unknown block '$other' (census|docs)")
    }
    spark.stop()
  }
}
