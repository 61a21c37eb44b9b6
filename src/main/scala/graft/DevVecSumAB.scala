package graft

/** Dev-only A/B quantifying the vec_sum_ll win: sim7 (posexplode →
  * per-(label,pos) sum — |vectors|·D shuffled rows) vs sim13 (native
  * TypedImperativeAggregate — vectors whole through the shuffle).
  * Same corpus, same bench protocol (warm-up + N cold-data samples,
  * clearCache before each, noop sink). The two queries differ only
  * in the aggregation shape (sim13 additionally quantizes, which is
  * per-row map work), so the delta is the explode's shuffle bill.
  */
object DevVecSumAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val n = sys.env.getOrElse("SPARK_GRAFT_AB_N", "5").toInt
    val spark = Sessions.local(cpus, "graft-vecsum-ab")

    def run(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def stats(label: String, xs: Seq[Double]): Unit = {
      val sorted = xs.sorted
      println(f"[vecsum-ab] $label%-24s n=${xs.length} min=${sorted.head}%.3f " +
        f"med=${sorted(xs.length / 2)}%.3f max=${sorted.last}%.3f " +
        f"samples=${xs.map(x => f"$x%.3f").mkString(",")}")
    }
    for (name <- Seq("sim7_label_centroids", "sim13_native_centroids")) {
      run(name) // warm-up
      stats(name, (1 to n).map { _ => spark.catalog.clearCache(); run(name) })
    }
    spark.stop()
  }
}
