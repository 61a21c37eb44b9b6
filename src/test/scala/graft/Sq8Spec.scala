package graft

import org.apache.spark.sql.functions._

/** The SQ8 pair (sq8_pack → binary codes, vec_dot_sq8 → exact long
  * dot) must agree with a plain-Scala reference on random codes, clamp
  * out-of-range inputs instead of wrapping, and run inside whole-stage
  * codegen — the properties sim23's recall gauge stands on.
  */
class Sq8Spec extends SparkSpec {
  import spark.implicits._

  test("pack+dot == Scala reference on random signed codes") {
    val rnd = new scala.util.Random(21)
    val rows = Seq.fill(200)((
      Array.fill(64)((rnd.nextInt(255) - 127).toLong),
      Array.fill(64)((rnd.nextInt(255) - 127).toLong)))
    val expect = rows.map { case (a, b) =>
      a.zip(b).map { case (x, y) => x * y }.sum
    }
    val got = rows.toDF("a", "b")
      .select(call_function("vec_dot_sq8",
        call_function("sq8_pack", col("a")),
        call_function("sq8_pack", col("b"))).as("d"))
      .collect().map(_.getLong(0))
    assert(got.toSeq == expect, got.take(3).mkString(","))
  }

  test("pack clamps to [-128, 127] instead of wrapping") {
    val got = Seq((Array(1000L, -1000L, 127L, -128L), Array(1L, 1L, 1L, 1L)))
      .toDF("a", "b")
      .select(call_function("vec_dot_sq8",
        call_function("sq8_pack", col("a")),
        call_function("sq8_pack", col("b"))))
      .head().getLong(0)
    // 127 + (-128) + 127 + (-128) — a wrapping cast would give
    // 1000.toByte = -24 and -1000.toByte = 24 instead
    assert(got == 127L - 128L + 127L - 128L, got)
  }

  test("dot is null on length mismatch, null-intolerant on null input") {
    val df = Seq((Array(1L, 2L), Array(1L, 2L, 3L))).toDF("a", "b")
      .select(call_function("sq8_pack", col("a")).as("qa"),
        call_function("sq8_pack", col("b")).as("qb"))
    assert(df.select(call_function("vec_dot_sq8", col("qa"), col("qb")))
      .head().isNullAt(0))
    assert(df.select(call_function("vec_dot_sq8",
        lit(null).cast("binary"), col("qb"))).head().isNullAt(0))
  }

  test("pack and dot participate in whole-stage codegen") {
    val df = spark.range(8)
      .select(
        array((col("id") + 1).cast("long"), (col("id") - 7).cast("long")).as("a"),
        array((col("id") * 2).cast("long"), (col("id") * -3).cast("long")).as("b"))
      .select(call_function("vec_dot_sq8",
        call_function("sq8_pack", col("a")),
        call_function("sq8_pack", col("b"))).as("d"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("*") && l.contains("vec_dot_sq8")), plan)
    assert(plan.linesIterator.exists(l =>
      l.contains("*") && l.contains("sq8_pack")), plan)
    val got = df.collect().map(_.getLong(0))
    val expect = (0 until 8).map(i =>
      (i + 1).toLong * (i * 2) + (i - 7).toLong * (i * -3))
    assert(got.toSeq == expect)
  }
}
