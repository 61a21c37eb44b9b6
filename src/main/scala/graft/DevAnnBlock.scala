package graft

/** Dev tool: run ONLY Bench.streamingAnnBench and print its JSON —
  * the smoke harness for the stateless stream-static ANN serving
  * tier, mirroring [[DevStreamBlock]].
  */
object DevAnnBlock {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      "graft-ann-block")
    println(s"[ann-block] ${Bench.streamingAnnBench(spark, sfDir)}")
    spark.stop()
  }
}
