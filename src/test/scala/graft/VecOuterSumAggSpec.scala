package graft

import org.apache.spark.sql.functions._

/** vec_outer_sum_ll contract (round-15, sim21's Gram accumulator):
  * must be bit-identical to the HOF semantic reference — the per-row
  * `transform(sequence(0, D²−1), k -> v[k/D+1] * v[k%D+1])` array fed
  * to vec_sum_ll, the formulation sim21 shipped before the native
  * aggregate — THROUGH the partial-merge path (repartitioned input
  * forces map-side buffers to merge, exercising the triangle-packed
  * merge + eval mirror), skip nulls, return null for all-null groups,
  * and refuse length mismatches.
  */
class VecOuterSumAggSpec extends SparkSpec {
  import spark.implicits._

  private val D = 16

  private def hofReference = {
    val arr = col("v")
    transform(sequence(lit(0), lit(D * D - 1)), k =>
      element_at(arr, (call_function("div", k, lit(D)) + 1).cast("int")) *
        element_at(arr, ((k % D) + 1).cast("int")))
  }

  test("matches the HOF outer-product reference across partial merges") {
    val rnd = new scala.util.Random(21)
    val rows = (1 to 300).map { i =>
      (i % 5, Array.fill(D)(rnd.nextInt(20000).toLong - 10000L))
    }
    val df = rows.toDF("g", "v").repartition(7)
    val got = df.groupBy("g")
      .agg(call_function("vec_outer_sum_ll", col("v")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1).toVector).toMap
    val ref = rows.toDF("g", "v").repartition(7)
      .select(col("g"), hofReference.as("op"))
      .groupBy("g").agg(call_function("vec_sum_ll", col("op")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1).toVector).toMap
    assert(got == ref)
    // and the symmetry/size invariants hold
    got.values.foreach { m =>
      assert(m.size == D * D)
      for (i <- 0 until D; j <- 0 until D)
        assert(m(i * D + j) == m(j * D + i))
    }
  }

  test("skips null rows; all-null group yields null") {
    val df = Seq(
      (1, Option(Array(1L, 2L))), (1, None), (1, Option(Array(10L, 20L))),
      (2, None))
      .toDF("g", "v")
    val out = df.groupBy("g")
      .agg(call_function("vec_outer_sum_ll", col("v")).as("s"))
      .collect().map(r => r.getInt(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Long](1).toVector)).toMap
    // 1*1, 1*2 / 2*1, 2*2  +  10*10, 10*20 / 20*10, 20*20
    assert(out(1) == Vector(101L, 202L, 202L, 404L))
    assert(out(2) == null)
  }

  test("length mismatch within a group throws") {
    val df = Seq((1, Array(1L, 2L)), (1, Array(1L, 2L, 3L))).toDF("g", "v")
    val e = intercept[Exception] {
      df.groupBy("g").agg(call_function("vec_outer_sum_ll", col("v")).as("s"))
        .collect()
    }
    assert(e.getMessage != null)
  }
}
