package graft

import org.apache.spark.sql.functions._

import graft.ext.Lloyd

/** Lloyd k-means training semantics: quantization floors negatives
  * correctly, assignment is a brute-force argmin with smaller-cell
  * ties, floor-div matches mathematical floor for negative sums,
  * empty cells keep their previous centroid, and a full fit on
  * separated clusters recovers the clusters.
  */
class LloydSpec extends SparkSpec {
  import spark.implicits._

  test("quantized floors toward -inf (not toward zero)") {
    val df = Seq((0L, Array(-0.00011f, 0.00019f, -1.0f)))
      .toDF("vec_id", "embedding")
    val q = Lloyd.quantized(df).head().getSeq[Long](1)
    // -0.00011*10000 = -1.1 → -2 under floor (trunc would give -1)
    assert(q == Seq(-2L, 1L, -10000L), q)
  }

  test("floorDiv matches math floor for negative sums") {
    val rows = Seq((-7L, 2L), (7L, 2L), (-8L, 2L), (-1L, 3L))
      .toDF("s", "n")
      .select(Lloyd.floorDiv(col("s"), col("n")).as("fd"))
      .collect().map(_.getLong(0)).toSeq
    assert(rows == Seq(-4L, 3L, -4L, -1L), rows)
  }

  test("assignCell is the argmin with smaller-cell tie-break") {
    val cents = Seq(Seq(0L, 0L), Seq(10L, 0L), Seq(0L, 10L))
    val df = Seq(
      (0L, Seq(1L, 1L)),   // nearest cell 0
      (1L, Seq(9L, 0L)),   // nearest cell 1
      (2L, Seq(5L, 0L)),   // tie cells 0/1 → 0
      (3L, Seq(5L, 10L))   // tie cells 1? dists: c0=125, c1=125, c2=25 → 2
    ).toDF("vec_id", "qv")
    val got = df.select(col("vec_id"), Lloyd.assignCell(col("qv"), cents).as("c"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(0L -> 0, 1L -> 1, 2L -> 0, 3L -> 2), got)
  }

  test("update keeps the previous centroid for an emptied cell") {
    // all points sit at (0,0); far centroid at (1000, 1000) loses
    // every member and must survive the update unchanged
    val df = Seq((0L, Array(0f, 0f)), (1L, Array(0.0001f, 0f)))
      .toDF("vec_id", "embedding")
    val qdf = Lloyd.quantized(df)
    val cents = Lloyd.update(qdf, Seq(Seq(0L, 0L), Seq(1000L, 1000L)))
    assert(cents(0) == Seq(0L, 0L), cents(0))
    assert(cents(1) == Seq(1000L, 1000L), cents(1))
  }

  test("fit on separated clusters recovers them") {
    val rnd = new scala.util.Random(11)
    val centers = Seq(Array(10f, 0f, 0f), Array(0f, 10f, 0f),
      Array(0f, 0f, 10f))
    // vec_ids 0,1,2 land in distinct clusters so the smallest-id
    // seeds start one-per-cluster
    val df = (0 until 60).map { i =>
      val c = centers(i % 3)
      (i.toLong, c.map(x => x + (rnd.nextGaussian() * 0.2).toFloat))
    }.toDF("vec_id", "embedding")
    val (qdf, cents) = Lloyd.fit(df, k = 3, rounds = 3)
    val purity = qdf
      .withColumn("cell", Lloyd.assignCell(col("qv"), cents))
      .withColumn("cluster", col("vec_id") % 3)
      .groupBy("cluster").agg(countDistinct("cell").as("ncells"))
      .collect().map(_.getLong(1))
    assert(purity.forall(_ == 1L), purity.mkString(","))
    // and the three cells are distinct
    val cells = qdf.withColumn("cell", Lloyd.assignCell(col("qv"), cents))
      .select("cell").distinct().count()
    assert(cells == 3L)
  }
}
