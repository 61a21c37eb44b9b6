package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev-only attribution harness for the g3 vs g3b stress-tier
  * inversion (round-8 verdict item 2: the driver's 8× bench measured
  * frontier 24.2 s median vs pinned 19.1 s with a 16.0-43.8 s spread,
  * inverting the builder's 9.9 vs 11.3 s local measurement). The
  * r6-simhash protocol applied: controlled reproduction on the SAME
  * 8× corpus recipe, INTERLEAVED samples (A/B/A/B — sequential blocks
  * confound machine-state drift with the variant), per-round wall
  * times for both algorithms, and knob bisects for the two suspects
  * the verdict names (AQE broadcast of the removed set; per-round
  * degree-table checkpoint cadence).
  *
  * Variants measured (all output-identical — asserted each sample):
  *  - `pinned`   — KCore.peelStats (g3's operator)
  *  - `frontier` — KCore.peelStatsFrontier (g3b's operator)
  *  - `f_nodeg`  — frontier WITHOUT the per-round degree-table
  *                 localCheckpoint (degrees stay a lazy plan over the
  *                 checkpointed edges + lost decrements, re-cut every
  *                 SECOND round): isolates the checkpoint-cadence cost
  *  - `f_nobc`   — frontier with autoBroadcastJoinThreshold=-1 for
  *                 the peel (isolates the AQE-broadcast suspect)
  */
object DevG3bAttrib {

  /** The g3/g3b edge construction (support-thresholded co-purchase). */
  private def edgesOf(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val op = graft.sources.Tables.table(spark, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    op.as("a").join(op.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").cast("long").as("u"),
        col("b.pk").cast("long").as("v"))
      .agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2)
      .select("u", "v")
  }

  /** Frontier peel with the degree-table checkpoint made OPTIONAL
    * (every `degCadence` rounds instead of every round) — a measuring
    * copy of KCore.peelStatsFrontier, NOT a library variant; output
    * asserted equal to the library operators each run.
    */
  private def frontierVariant(edges: DataFrame, k: Int, rounds: Int,
      degCadence: Int): Seq[(Long, Long, Long, Long)] = {
    var (e, eRdd) = graft.ext.Dedup.checkpointed(edges.select("u", "v"))
    var deg = e.select(col("u").as("n")).unionAll(e.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("dg"))
    var degRdd: Option[org.apache.spark.rdd.RDD[_]] = None
    if (degCadence == 1) {
      val (d0, d0Rdd) = graft.ext.Dedup.checkpointed(deg)
      deg = d0; degRdd = Some(d0Rdd)
    }
    // blocks a LAZY deg plan still references (superseded edge sets):
    // releasable only once a later round checkpoints the degree table
    var deferred = List.empty[org.apache.spark.rdd.RDD[_]]
    val out = (1 to rounds).map { r =>
      val bad = deg.filter(col("dg") < k).select("n")
      val nRemoved = bad.count()
      val badU = bad.withColumnRenamed("n", "u")
      val badV = bad.withColumnRenamed("n", "v")
      val lostU = e.join(badV, Seq("v"), "left_semi")
        .join(badU, Seq("u"), "left_anti")
        .groupBy(col("u").as("n")).agg(count(lit(1)).as("lc"))
      val lostV = e.join(badU, Seq("u"), "left_semi")
        .join(badV, Seq("v"), "left_anti")
        .groupBy(col("v").as("n")).agg(count(lit(1)).as("lc"))
      val lost = lostU.unionAll(lostV).groupBy("n").agg(sum("lc").as("lost"))
      val (nextE, nextERdd) = graft.ext.Dedup.checkpointed(
        e.join(badU, Seq("u"), "left_anti")
          .join(badV, Seq("v"), "left_anti").select("u", "v"))
      val nextDegPlan = deg.join(bad, Seq("n"), "left_anti")
        .join(lost, Seq("n"), "left")
        .select(col("n"),
          (col("dg") - coalesce(col("lost"), lit(0L))).as("dg"))
        .filter(col("dg") > 0L)
      val cutDeg = r % degCadence == 0 || r == rounds
      if (cutDeg) {
        val (d, h) = graft.ext.Dedup.checkpointed(nextDegPlan)
        // the lazy chain is cut: everything it referenced can go
        (eRdd :: deferred).foreach(_.unpersist(blocking = false))
        deferred = Nil
        degRdd.foreach(_.unpersist(blocking = false))
        degRdd = Some(h)
        deg = d
      } else {
        // deg stays lazy over e and the old deg — defer the release
        deferred = eRdd :: deferred
        deg = nextDegPlan
      }
      val nEdges = nextE.count()
      val nNodes = deg.count()
      e = nextE; eRdd = nextERdd
      (r.toLong, nRemoved, nNodes, nEdges)
    }
    eRdd.unpersist(blocking = false)
    deferred.foreach(_.unpersist(blocking = false))
    degRdd.foreach(_.unpersist(blocking = false))
    out
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val copies = sys.env.getOrElse("SPARK_GRAFT_STRESS_COPIES", "8").toInt
    val n = sys.env.getOrElse("SPARK_GRAFT_AB_N", "5").toInt
    val spark = Sessions.local(cpus, "graft-g3b-attrib")

    // the stress tier's corpus recipe, lineitem only (all g3 needs)
    val base = java.nio.file.Files.createTempDirectory("graft_g3b_attrib")
    val dir = base.toString
    graft.sources.Tables.table(spark, sfDir, "lineitem")
      .crossJoin(spark.range(copies).select(col("id").as("__c")))
      .withColumn("l_orderkey", col("l_orderkey") + col("__c") * 10000000L)
      .drop("__c")
      .write.parquet(s"$dir/lineitem.parquet")

    val expected = graft.ext.KCore
      .peelStats(edgesOf(spark, dir), k = 3, rounds = 4)
      .orderBy("round").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

    def timed(label: String)(body: => Seq[(Long, Long, Long, Long)]): Double = {
      spark.catalog.clearCache()
      graft.queries.ParityQueries.releaseCaches()
      val t0 = System.nanoTime()
      val got = body
      val dt = (System.nanoTime() - t0) / 1e9
      assert(got == expected, s"$label diverged: $got vs $expected")
      dt
    }

    def collect(df: DataFrame): Seq[(Long, Long, Long, Long)] =
      df.orderBy("round").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

    val variants: Seq[(String, () => Seq[(Long, Long, Long, Long)])] = Seq(
      "pinned" -> (() =>
        collect(graft.ext.KCore.peelStats(edgesOf(spark, dir), 3, 4))),
      "frontier" -> (() =>
        collect(graft.ext.KCore.peelStatsFrontier(edgesOf(spark, dir), 3, 4))),
      "f_nodeg" -> (() => frontierVariant(edgesOf(spark, dir), 3, 4, degCadence = 2)),
      "f_nobc" -> (() => {
        val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try collect(graft.ext.KCore.peelStatsFrontier(edgesOf(spark, dir), 3, 4))
        finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      }))

    // warm-up each variant once (JIT), then INTERLEAVED samples
    variants.foreach { case (l, f) => timed(l)(f()) }
    val samples = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    for (i <- 1 to n; (l, f) <- variants) {
      val dt = timed(l)(f())
      samples(l) = samples(l) :+ dt
      System.err.println(f"[g3b-attrib] pass $i $l%-10s $dt%.2f s")
    }
    for ((l, _) <- variants) {
      val xs = samples(l); val s = xs.sorted
      println(f"[g3b-attrib] $l%-10s n=${xs.length} med=${s(xs.length / 2)}%.2f " +
        f"min=${s.head}%.2f max=${s.last}%.2f " +
        f"samples=${xs.map(x => f"$x%.2f").mkString(",")}")
    }
    locally {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(base)
      val paths = try walk.iterator().asScala.toSeq finally walk.close()
      paths.reverseIterator.foreach(p => { java.nio.file.Files.deleteIfExists(p); () })
    }
    spark.stop()
  }
}
