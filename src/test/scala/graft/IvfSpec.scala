package graft

import org.apache.spark.sql.functions._

import graft.ext.IvfIndex

/** IVF index semantics: assignment is a true argmin, probing covers
  * the nearest cells, and IVF top-k recalls the brute-force neighbors
  * on clustered data (the regime IVF exists for).
  */
class IvfSpec extends SparkSpec {
  import spark.implicits._

  // 4 well-separated clusters of 12 vectors each in 8-d
  private lazy val clustered = {
    val rnd = new scala.util.Random(5)
    val centers = Seq.tabulate(4)(c => Array.tabulate(8)(j => if (j == c * 2) 10f else 0f))
    (0 until 48).map { i =>
      val c = centers(i % 4)
      (i.toLong, c.map(x => x + (rnd.nextGaussian() * 0.3).toFloat))
    }.toDF("vec_id", "embedding")
  }

  test("assign maps each vector to a cell shared with its cluster-mates") {
    val centroids = IvfIndex.fit(clustered, "embedding", nlist = 4, seed = 1L)
    assert(centroids.length == 4 && centroids.head.length == 8)
    val cells = clustered
      .withColumn("cell", IvfIndex.assign(col("embedding"), centroids))
      .withColumn("cluster", col("vec_id") % 4)
      .groupBy("cluster").agg(countDistinct("cell").as("ncells"))
      .collect().map(_.getLong(1))
    // well-separated clusters: every true cluster lands in ONE cell
    assert(cells.forall(_ == 1L), cells.mkString(","))
  }

  test("probeCells returns nprobe distinct nearest cells") {
    val centroids = IvfIndex.fit(clustered, "embedding", nlist = 4, seed = 1L)
    val cells = clustered.limit(1)
      .select(IvfIndex.probeCells(col("embedding"), centroids, 3))
      .head().getSeq[Int](0)
    assert(cells.length == 3 && cells.distinct.length == 3)
  }

  test("persisted cell-partitioned index prunes to the probed cells (scan-level)") {
    // the deployment claim in IvfIndex's scaladoc: persist assignments
    // partitioned by cell, and a probe reads ONLY its nprobe cells'
    // partitions — the parquet scan must show PartitionFilters, the
    // disk-level analogue of compare-within-cell
    val centroids = IvfIndex.fit(clustered, "embedding", nlist = 4, seed = 1L)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_idx").toString
    clustered.withColumn("cell", IvfIndex.assign(col("embedding"), centroids))
      .write.partitionBy("cell").mode("overwrite").parquet(dir)

    val probeCells = clustered.limit(1)
      .select(IvfIndex.probeCells(col("embedding"), centroids, 2))
      .head().getSeq[Int](0)
    val pruned = spark.read.parquet(dir).filter(col("cell").isin(probeCells: _*))
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("cell"), scan)
    // and the read really is cell-local: only the probed cells' rows
    val cells = pruned.select("cell").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(cells == probeCells.toSet)
  }

  test("pinned IvfModel strings are round-trip-exact and well-formed") {
    // the cross-engine bit-exactness of sim5 RESTS on this property:
    // each stored string must be the shortest round-trip decimal of
    // its double, so Scala's parser and DuckDB's parser recover the
    // identical IEEE value from the same text
    val m = graft.ext.IvfModel
    assert(m.centroidStrings.length == m.nlist)
    assert(m.centroidStrings.forall(_.length == 64))
    m.centroidStrings.flatten.foreach { s =>
      val d = s.toDouble
      assert(java.lang.Double.isFinite(d), s)
      assert(d.toString == s, s"not round-trip-canonical: $s")
    }
  }

  test("IVF top-k matches brute force on clustered data (nprobe=2)") {
    val centroids = IvfIndex.fit(clustered, "embedding", nlist = 4, seed = 1L)
    val probes = clustered.filter(col("vec_id") < 4)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
    val ivf = IvfIndex.topK(clustered, probes, centroids, k = 3, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(3)) -> r.getLong(1)).toMap
    val brute = graft.ext.Similarity.bruteForceTopK(clustered, probes, 3)
      .collect().map(r => (r.getLong(0), r.getLong(3)) -> r.getLong(1)).toMap
    val agree = brute.count { case (key, id) => ivf.get(key).contains(id) }
    assert(agree >= (brute.size * 0.9).toInt, s"$agree/${brute.size} agree")
  }
}
