package graft

/** Dev tool: run ONLY Bench.stressBench (the stress-scale block) with
  * the standard env knobs (SPARK_GRAFT_STRESS_QUERIES/_N/_COPIES) and
  * print its JSON — the attribution harness for stress-tier swings:
  * re-run one query under different orderings/JVM states without
  * paying for the headline + streaming blocks each time.
  *
  *   SPARK_GRAFT_STRESS_QUERIES=dedup_simhash_pairs \
  *   SPARK_GRAFT_STRESS_N=5 SPARK_GRAFT_CPUS=32 \
  *   sbt 'runMain graft.DevStressBlock /root/testdata/sf0.1'
  */
object DevStressBlock {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local(cpus, "graft-stress-block")
    val json = Bench.stressBench(spark, sfDir)
    println(s"[stress-block] $json")
    spark.stop()
  }
}
