package graft

import org.apache.spark.sql.functions._

/** vec_sum_ll contract: must equal the posexplode reference on random
  * data THROUGH the partial-merge path (repartitioned input forces
  * map-side buffers to merge), skip nulls, return null for all-null
  * groups, and refuse length mismatches.
  */
class VecSumAggSpec extends SparkSpec {
  import spark.implicits._

  test("matches posexplode+sum reference across partial merges") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 400).map { i =>
      (i % 7, Array.fill(16)(rnd.nextInt(2000000).toLong - 1000000L))
    }
    val df = rows.toDF("g", "v").repartition(5)
    val got = df.groupBy("g")
      .agg(call_function("vec_sum_ll", col("v")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1).toVector).toMap
    val exp = rows.groupBy(_._1).map { case (g, vs) =>
      g -> vs.map(_._2).reduce((a, b) => a.zip(b).map { case (x, y) => x + y })
        .toVector
    }
    assert(got == exp)
  }

  test("skips null rows; all-null group yields null") {
    val df = Seq(
      (1, Option(Array(1L, 2L))), (1, None), (1, Option(Array(10L, 20L))),
      (2, None))
      .toDF("g", "v")
    val out = df.groupBy("g")
      .agg(call_function("vec_sum_ll", col("v")).as("s"))
      .collect().map(r => r.getInt(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Long](1).toVector)).toMap
    assert(out(1) == Vector(11L, 22L))
    assert(out(2) == null)
  }

  test("length mismatch within a group throws") {
    val df = Seq((1, Array(1L, 2L)), (1, Array(1L, 2L, 3L))).toDF("g", "v")
    val e = intercept[Exception] {
      df.groupBy("g").agg(call_function("vec_sum_ll", col("v"))).collect()
    }
    assert(e.getMessage.contains("vec_sum_ll") ||
      Option(e.getCause).exists(_.getMessage.contains("vec_sum_ll")))
  }
}
