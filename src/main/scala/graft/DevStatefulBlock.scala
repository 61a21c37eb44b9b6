package graft

/** Dev tool: run ONLY Bench.statefulStreamingBench with the standard
  * env knobs (SPARK_GRAFT_STATEFUL_ROWS/_FILES/_FILES_PER_BATCH) and
  * print its JSON — the smoke/attribution harness for the stateful
  * streaming tier, mirroring [[DevStressBlock]] for the batch tier.
  *
  *   SPARK_GRAFT_STATEFUL_ROWS=20000 SPARK_GRAFT_CPUS=16 \
  *   sbt 'runMain graft.DevStatefulBlock'
  */
object DevStatefulBlock {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = Sessions.local(cpus, "graft-stateful-block")
    val json = Bench.statefulStreamingBench(spark)
    println(s"[stateful-block] $json")
    spark.stop()
  }
}
