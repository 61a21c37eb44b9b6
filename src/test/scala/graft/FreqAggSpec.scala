package graft

import org.apache.spark.sql.functions._

/** freq_ll (native Misra-Gries heavy-hitters TypedImperativeAggregate)
  * — what IS deterministic about MG is the n/(k+1) superset guarantee
  * and the per-item error bound, not the surviving counter set, so
  * the spec checks exactly those contracts under forced partial
  * merges, plus the exact-when-domain-fits and null-skip paths.
  */
class FreqAggSpec extends SparkSpec {

  private def summary(df: org.apache.spark.sql.DataFrame, k: Int) = df
    .agg(call_function("freq_ll", col("item"), lit(k)).as("hh"))
    .select(explode(col("hh")).as("e"))
    .select(col("e.item").as("item"), col("e.est").as("est"))

  test("every item above n/(k+1) survives, ests within the error bound") {
    val spark0 = spark
    import spark0.implicits._
    val rnd = new scala.util.Random(11)
    // zipf-ish: item j drawn with weight ~ 1/(j+1)
    val data = (1 to 20000).map { _ =>
      val u = rnd.nextDouble()
      val j = math.min((1.0 / (u + 0.02) - 1.0).toInt, 400)
      j.toLong
    }
    for (k <- Seq(8, 32)) {
      val df = data.toDF("item").repartition(17) // forces partial merges
      val got = summary(df, k).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got.size <= k, s"k=$k kept ${got.size} counters")
      val truth = data.groupBy(identity).map { case (i, xs) => i -> xs.size.toLong }
      val n = data.size.toLong
      val bound = n / (k + 1)
      truth.foreach { case (item, c) =>
        if (c > bound)
          assert(got.contains(item), s"k=$k dropped heavy hitter $item ($c > $bound)")
      }
      got.foreach { case (item, est) =>
        val t = truth.getOrElse(item, 0L)
        assert(est <= t && est >= t - bound,
          s"k=$k item $item est $est outside [${t - bound}, $t]")
      }
    }
  }

  test("domain smaller than k is exact under forced merges") {
    val spark0 = spark
    import spark0.implicits._
    val data = (1 to 5000).map(i => (i % 7).toLong)
    val got = summary(data.toDF("item").repartition(13), 16).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = data.groupBy(identity).map { case (i, xs) => i -> xs.size.toLong }
    assert(got == want)
  }

  test("eval orders entries (est desc, item asc)") {
    val spark0 = spark
    import spark0.implicits._
    val data = Seq.fill(30)(1L) ++ Seq.fill(30)(4L) ++ Seq.fill(10)(2L)
    val rows = data.toDF("item").coalesce(1)
      .agg(call_function("freq_ll", col("item"), lit(8)).as("hh"))
      .select(col("hh")).collect()
    val arr = rows.head.getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(arr == Seq((1L, 30L), (4L, 30L), (2L, 10L)))
  }

  test("null items are skipped; all-null input yields an empty array") {
    val spark0 = spark
    import spark0.implicits._
    val got = Seq(Some(3L), None, Some(3L), None).toDF("item")
    assert(summary(got, 4).collect().map(r =>
      (r.getLong(0), r.getLong(1))).toSeq == Seq((3L, 2L)))
    val empty = Seq[Option[Long]](None, None).toDF("item")
    assert(summary(empty, 4).collect().isEmpty)
  }
}
