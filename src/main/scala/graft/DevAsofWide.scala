package graft

import org.apache.spark.sql.functions._

/** Dev-only A/B substantiating the native as-of join's WIDTH claim:
  * the composition union-pads every right row with every left column
  * (and vice versa) before its shuffle, so shuffled bytes scale with
  * the COMBINED width; the native operator shuffles each side at its
  * own width. Both sides here carry `w` extra 64-char payload columns
  * — the narrow case (w=0) and a wide case (w=12) bracket the claim.
  */
object DevAsofWide {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val n = sys.env.getOrElse("SPARK_GRAFT_AB_N", "5").toInt
    val spark = Sessions.local(cpus, "graft-asof-wide")

    def widen(df: org.apache.spark.sql.DataFrame, w: Int, tag: String) =
      (1 to w).foldLeft(df)((d, i) =>
        d.withColumn(s"${tag}_pad$i", lpad(col("user_id").cast("string"), 64, "x")))

    for (w <- Seq(0, 12)) {
      val ev0 = graft.sources.Tables.table(spark, sfDir, "events")
        .select("event_id", "user_id", "ts", "value")
      val ev = widen(ev0, w, "l")
      val clicks = widen(
        graft.sources.Tables.table(spark, sfDir, "events")
          .filter(col("event_type") === "click")
          .select(col("user_id").as("r_user"), col("ts").as("r_ts"),
            col("value").as("click_value"))
          .withColumn("user_id", col("r_user")), w, "r")
        .drop("user_id")

      def run(name: String, df: => org.apache.spark.sql.DataFrame): Unit = {
        df.write.format("noop").mode("overwrite").save() // warm-up
        val xs = (1 to n).map { _ =>
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          df.write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }.sorted
        println(f"[asof-wide] w=$w%-3d $name%-12s min=${xs.head}%.3f " +
          f"med=${xs(n / 2)}%.3f max=${xs.last}%.3f")
      }

      run("native", graft.plans.NativeAsof.asofBackward(
        ev, clicks, "user_id", "r_user", "ts", "r_ts"))
      run("composition", graft.ops.AsofJoin.asofBackward(
        ev, clicks.withColumnRenamed("r_user", "user_id")
          .withColumnRenamed("r_ts", "ts"),
        Seq("user_id"), "ts", "ts",
        "click_value" +: (1 to w).map(i => s"r_pad$i")))
    }
    spark.stop()
  }
}
