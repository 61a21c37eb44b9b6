package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dev-only A/B: co-purchase pair-generation variants (round-15).
  *
  * The g-family edge construction (10 query sites) is
  *   distinct(ok, pk) → self-join on ok → groupBy (u, v) count
  * which costs 3 exchanges + 2 sorts, and at the stress tier's 8×
  * corpus the DevKCoreProfile split shows it is ~90 % of g3's wall
  * (edges 10.4 s vs peel ~1 s). Variants measured here, all
  * output-identical (asserted):
  *
  *  - `selfjoin`  — the incumbent shape
  *  - `hof`       — groupBy(ok) collect_set → sorted array → ordered
  *                  pairs via transform/slice/flatten (ONE shuffle;
  *                  HOFs are CodegenFallback, the open question is
  *                  whether interpreted array work beats the saved
  *                  exchange+sort+SMJ)
  *  - `posexp`    — groupBy(ok) collect_set → sorted array → two
  *                  posexplode legs + i<j filter (one shuffle, fully
  *                  codegen'd Generate, but K² rows before the filter)
  *
  *   sbt 'runMain graft.DevPairsAB /tmp/sfbig_rel 3'
  */
object DevPairsAB {

  private def opOf(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    graft.sources.Tables.table(spark, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))

  def selfjoin(op0: DataFrame): DataFrame = {
    val op = op0.distinct()
    op.as("a").join(op.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").cast("long").as("u"),
        col("b.pk").cast("long").as("v"))
      .agg(count(lit(1)).as("c"))
  }

  def orderedPairs(arr: Column): Column =
    flatten(transform(arr, (x, i) =>
      transform(slice(arr, i + lit(2), size(arr) - i - lit(1)),
        y => struct(x.as("u"), y.as("v")))))

  def hof(op0: DataFrame): DataFrame =
    op0.groupBy("ok")
      .agg(sort_array(collect_set(col("pk").cast("long"))).as("__s"))
      .select(explode(orderedPairs(col("__s"))).as("__p"))
      .groupBy(col("__p.u").as("u"), col("__p.v").as("v"))
      .agg(count(lit(1)).as("c"))

  def posexp(op0: DataFrame): DataFrame =
    op0.groupBy("ok")
      .agg(sort_array(collect_set(col("pk").cast("long"))).as("__s"))
      .select(posexplode(col("__s")).as(Seq("__i", "u")), col("__s"))
      .select(col("u"), posexplode(slice(col("__s"), col("__i") + lit(2),
        size(col("__s")) - col("__i") - lit(1))).as(Seq("__j", "v")))
      .groupBy("u", "v").agg(count(lit(1)).as("c"))

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sfbig_rel")
    val n = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"),
      "graft-pairs-ab")
    val variants: Seq[(String, DataFrame => DataFrame)] =
      Seq("selfjoin" -> selfjoin, "hof" -> hof, "posexp" -> posexp)
    // equality check once: same (u, v, c) sets
    val ref = selfjoin(opOf(spark, dir)).orderBy("u", "v")
      .collect().toSeq
    variants.drop(1).foreach { case (name, f) =>
      val got = f(opOf(spark, dir)).orderBy("u", "v").collect().toSeq
      require(got == ref, s"$name output differs from selfjoin")
      println(s"[pairs-ab] $name output identical (${ref.size} pairs)")
    }
    // interleaved samples, noop-materialized
    (1 to n).foreach { round =>
      variants.foreach { case (name, f) =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        f(opOf(spark, dir)).write.format("noop").mode("overwrite").save()
        println(f"[pairs-ab] round $round $name%-9s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
