package graft

/** Dev-only: print the formatted physical plan of named registry
  * queries (plan audit — shuffle count, join strategies, no
  * accidental cartesian). Usage: runMain graft.DevExplain <sfDir> <names...>
  */
object DevExplain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"),
      "dev-explain")
    args.drop(1).foreach { name =>
      println(s"\n===== $name =====")
      val df = SparkEntry.queries(name)(spark, sfDir)
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
