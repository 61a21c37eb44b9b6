package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.read.Dashboard

class DashboardSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val events = Seq(
    (1L, 10L, ts("2024-01-01 10:00:00"), 1.0),
    (2L, 10L, ts("2024-01-01 11:00:00"), 2.0),
    (3L, 20L, ts("2024-01-01 11:00:00"), 3.0),
    (4L, 20L, ts("2024-01-01 11:00:00"), 4.0), // tie on ts within group 20
    (5L, 30L, ts("2024-01-01 09:00:00"), 5.0),
  ).toDF("event_id", "user_id", "ts", "value")

  test("latestPerGroup picks one row per group, tie-broken by event_id desc") {
    val got = Dashboard.latestPerGroup(events, Seq("user_id"), "ts", "event_id")
      .select("user_id", "event_id").as[(Long, Long)].collect().toMap
    assert(got == Map(10L -> 2L, 20L -> 4L, 30L -> 5L))
  }

  test("argmaxJoinBack keeps ALL rows tied at the group max (pd.merge shape)") {
    val got = Dashboard.argmaxJoinBack(events, "user_id", "ts")
      .select("event_id").as[Long].collect().toSet
    assert(got == Set(2L, 3L, 4L, 5L))
  }

  test("latest returns the single global max row") {
    val got = Dashboard.latest(events, "ts", "event_id")
      .select("event_id").as[Long].collect().toSeq
    assert(got == Seq(4L))
  }

  test("topK orders by measure desc with key tie-break and limits") {
    val df = Seq(("a", 1), ("a", 1), ("b", 1), ("b", 1), ("c", 1)).toDF("k", "v")
    val got = Dashboard.topK(df, Seq("k"), count(lit(1)), 2)
      .select("k").as[String].collect().toSeq
    assert(got == Seq("a", "b")) // a and b tie at 2; alphabetical tie-break
  }

  test("percentOfGroup sums to 100 within each partition") {
    val g = Seq(("m", "x", 1L), ("m", "y", 3L), ("f", "x", 2L))
      .toDF("gender", "cat", "count")
    val got = g.withColumn("pct", Dashboard.percentOfGroup(g, "gender"))
      .groupBy("gender").agg(sum("pct").as("tot"))
      .select("tot").as[Double].collect()
    assert(got.forall(t => math.abs(t - 100.0) < 1e-9))
  }

  test("timeRange keeps trailing window; None keeps everything") {
    val asOf = lit(ts("2024-01-01 11:00:00"))
    val got = Dashboard.timeRange(events, "ts", asOf, Some(60)).count()
    assert(got == 4) // 10:00 row is exactly on the >= boundary
    assert(Dashboard.timeRange(events, "ts", asOf, None).count() == 5)
  }

  test("filterToTopK keeps only rows of the top-k keys") {
    val df = Seq("a", "a", "a", "b", "b", "c").toDF("k")
    val got = Dashboard.filterToTopK(df, "k", count(lit(1)), 2)
      .select("k").as[String].collect()
    assert(got.toSet == Set("a", "b") && got.length == 5)
  }
}
