package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** topk_ll (native per-group top-k TypedImperativeAggregate) — the
  * correctness oracle is the window formulation it exists to replace,
  * on shapes that exercise every path: ties (id tie-break), groups
  * smaller than k, null values/ids, and forced partial-buffer merges.
  */
class TopKAggSpec extends SparkSpec {

  private def topkFlat(df: org.apache.spark.sql.DataFrame, k: Int) = df
    .groupBy("g")
    .agg(call_function("topk_ll", col("v"), col("id"), lit(k)).as("tk"))
    .select(col("g"), posexplode(col("tk")).as(Seq("i", "p")))
    .select(col("g"), (col("i") + 1).as("rk"),
      col("p.v").as("v"), col("p.id").as("id"))

  private def windowFlat(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id"))
    df.filter(col("v").isNotNull && col("id").isNotNull)
      .withColumn("rk", row_number().over(w) - 1)
      .filter(col("rk") < k)
      .select(col("g"), (col("rk") + 1).as("rk"), col("v"), col("id"))
  }

  test("equals the window top-k on random data with heavy ties") {
    val spark0 = spark
    import spark0.implicits._
    val rnd = new scala.util.Random(3)
    val df = (1 to 2000)
      .map(i => (rnd.nextInt(7), rnd.nextInt(20).toLong, i.toLong))
      .toDF("g", "v", "id").repartition(13) // forces partial merges
    for (k <- Seq(1, 3, 10)) {
      val got = topkFlat(df, k).collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
      val want = windowFlat(df, k).collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
      assert(got == want, s"k=$k diverged")
    }
  }

  test("groups smaller than k yield their full sorted contents") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq((1, 5L, 10L), (1, 9L, 11L), (2, -3L, 12L))
      .toDF("g", "v", "id")
    val got = topkFlat(df, 5).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set((1, 1, 9L, 11L), (1, 2, 5L, 10L), (2, 1, -3L, 12L)))
  }

  test("null values and ids are skipped; all-null group is empty") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq((1, Some(5L), Some(10L)), (1, None, Some(11L)),
        (1, Some(7L), None), (2, None, None))
      .toDF("g", "v", "id")
    val rows = topkFlat(df, 3).collect()
      .map(r => (r.getInt(0), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == Seq((1, 5L, 10L)))
  }

  test("value ties break to the smaller id (the pinned total order)") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq((1, 7L, 30L), (1, 7L, 10L), (1, 7L, 20L))
      .toDF("g", "v", "id")
    val ids = topkFlat(df, 2).orderBy("rk").collect().map(_.getLong(3))
    assert(ids.toSeq == Seq(10L, 20L))
  }
}
