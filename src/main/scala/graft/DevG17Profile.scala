package graft

import org.apache.spark.sql.functions._

/** Dev-only: per-stage timing of g17_core_decomposition's CHAINED
  * converged ladder (round-11 verdict ask 3: the 9.24 s verify cost is
  * the registry's #1, twice over, and nothing profiled where it goes
  * after the converged-semantics upgrade). Replicates the query's
  * exact shape with a per-round instrumented copy of
  * KCore.peelEdgesConverged: wall per round, edge count per round,
  * split by k — so "cascade depth", "per-round materialization cost"
  * and "edge-build cost" become separate numbers instead of one
  * opaque total.
  */
object DevG17Profile {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local(cpus, "graft-g17-profile")
    val tracked = new graft.queries.TrackedCache
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[g17] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    val total0 = System.nanoTime()
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
    // instrumented copy of KCore.peelEdgesConverged (same jobs, plus
    // a nanoTime around each round)
    def peelProfiled(src: org.apache.spark.sql.DataFrame, k: Int)
        : org.apache.spark.sql.DataFrame = {
      var (e, eRdd) = graft.ext.Dedup.checkpointed(src.select("u", "v"))
      var nEdges = eRdd.count()
      println(s"[g17]   k=$k start edges=$nEdges parts=${eRdd.getNumPartitions}")
      var r = 0
      var converged = false
      while (!converged) {
        r += 1
        val t0 = System.nanoTime()
        val deg = e.select(col("u").as("n"))
          .unionAll(e.select(col("v").as("n")))
          .groupBy("n").agg(count(lit(1)).as("dg"))
        val bad = deg.filter(col("dg") < k).select("n")
        val (next, nextRdd) = graft.ext.Dedup.checkpointed(
          e.join(bad.withColumnRenamed("n", "u"), Seq("u"), "left_anti")
            .join(bad.withColumnRenamed("n", "v"), Seq("v"), "left_anti")
            .select("u", "v"))
        val nNext = nextRdd.count()
        converged = nNext == nEdges
        eRdd.unpersist(blocking = false)
        println(f"[g17]   k=$k round=$r edges=$nNext parts=${nextRdd.getNumPartitions} ${(System.nanoTime() - t0) / 1e9}%.3f s${if (converged) " (fixpoint proof)" else ""}")
        e = next; eRdd = nextRdd; nEdges = nNext
      }
      tracked.track(eRdd)
      e
    }
    time("edge build + first checkpoint") {
      val n = edges.count(); println(s"[g17]   base edges=$n")
    }
    val surv = (2 to 5).foldLeft(
      (edges, List.empty[org.apache.spark.sql.DataFrame])) {
      case ((prev, acc), k) =>
        val e = time(s"peel k=$k total")(peelProfiled(prev, k))
        val nk = e.select(col("u").as("n"))
          .unionAll(e.select(col("v").as("n")))
          .distinct().withColumn("k", lit(k.toLong))
        (e, nk :: acc)
    }._2.reduce(_ unionAll _)
    val allNodes = edges.select(col("u").as("n"))
      .unionAll(edges.select(col("v").as("n"))).distinct()
    val core = surv.groupBy("n").agg(max("k").as("core"))
    time("final histogram") {
      allNodes.join(core, Seq("n"), "left")
        .select(coalesce(col("core"), lit(1L)).as("core"))
        .groupBy("core").agg(count(lit(1)).as("n_nodes"))
        .orderBy("core").collect().foreach(r => println("[g17]   " + r))
    }
    println(f"[g17] TOTAL ${(System.nanoTime() - total0) / 1e9}%.3f s")
    tracked.release()
    spark.stop()
  }
}
