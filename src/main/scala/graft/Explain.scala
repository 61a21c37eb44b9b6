package graft

/** Dev tool: print the formatted physical plan of one or more
  * registered queries (all of them by default) against a corpus dir.
  *
  *   sbt 'runMain graft.Explain sf0.01Dir query1 query2'
  *
  * Used for the per-round plan audits (pushdown present? exchanges
  * where expected? broadcast vs shuffle join?).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"), "graft-explain")
    names.foreach { n =>
      println(s"===== $n")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
