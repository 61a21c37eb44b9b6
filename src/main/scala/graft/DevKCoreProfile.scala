package graft

import org.apache.spark.sql.functions._

/** Dev-only: per-stage timing of the g3_kcore build, to localize the
  * verify-sweep cost (round-7: 145-178 s at sf0.01, far out of band).
  */
object DevKCoreProfile {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = Sessions.local("4", "graft-kcore-profile")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val li = spark.read.parquet(s"$d/lineitem.parquet")
    val op = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val edges = op.as("a").join(op.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").cast("long").as("u"),
        col("b.pk").cast("long").as("v"))
      .agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2)
      .select("u", "v")
    time("edges count")(println("edges=" + edges.count()))
    val stats = time("peel build+run")(
      graft.ext.KCore.peelStats(edges, k = 3, rounds = 4))
    time("collect")(stats.orderBy("round").collect()
      .foreach(r => println("  " + r)))
    spark.stop()
  }
}
