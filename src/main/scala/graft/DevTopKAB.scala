package graft

import org.apache.spark.sql.functions._

/** Dev tool: A/B the native topk_ll aggregate against the window
  * row_number formulation on a COPIES×-enlarged events corpus
  * (the stress recipe) — median-of-3 per arm, clearCache per sample.
  */
object DevTopKAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val copies = sys.env.getOrElse("SPARK_GRAFT_STRESS_COPIES", "8").toInt
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      "graft-topk-ab")
    val base = graft.sources.Tables.table(spark, sfDir, "events")
      .crossJoin(spark.range(copies).select(col("id").as("__c")))
      .select((col("user_id") + col("__c") * 10000000L).as("user_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("v"),
        (col("event_id") + col("__c") * 10000000L).as("event_id"))
    def naive = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy(col("v").desc, col("event_id"))
      base.withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
        .select("user_id", "rk", "v", "event_id")
    }
    def agg = base.groupBy("user_id")
      .agg(call_function("topk_ll", col("v"), col("event_id"), lit(3)).as("tk"))
      .select(col("user_id"), posexplode(col("tk")).as(Seq("i", "p")))
      .select(col("user_id"), (col("i") + 1).as("rk"),
        col("p.v").as("v"), col("p.id").as("event_id"))
    def time(mk: => org.apache.spark.sql.DataFrame): Seq[Double] =
      (1 to 3).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
    time(naive); time(agg) // warm-up both plans
    val nT = time(naive); val aT = time(agg)
    println(f"[topk-ab] copies=$copies window=${nT.sorted.apply(1)}%.3f s (${nT.map(t => f"$t%.2f").mkString(",")}) topk_ll=${aT.sorted.apply(1)}%.3f s (${aT.map(t => f"$t%.2f").mkString(",")})")
    spark.stop()
  }
}
