package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions.col

import graft.ops.RangeJoin

/** Bucketed point-in-interval join semantics: start-inclusive,
  * end-exclusive, per-key isolation, inner drop for uncovered points,
  * and correctness across bucket boundaries (interval spanning
  * multiple buckets; point and interval start in different buckets).
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def t(m: Int) = Timestamp.valueOf(f"2024-01-01 ${10 + m / 60}%02d:${m % 60}%02d:00")

  test("containment semantics across bucket boundaries") {
    val points = Seq(
      ("u1", t(0), 1L),   // == start → included
      ("u1", t(59), 2L),  // inside, later bucket than start (60s buckets)
      ("u1", t(90), 3L),  // == end → excluded
      ("u1", t(200), 4L), // outside all intervals → dropped
      ("u2", t(10), 5L))  // other key, interval only on u1 → dropped
      .toDF("k", "ts", "pid")
    val intervals = Seq(("u1", t(0), t(90), "s1")).toDF("k", "s", "e", "sid")

    val out = RangeJoin.pointInInterval(points, intervals,
        Seq("k"), "ts", "s", "e", bucketSeconds = 60L)
      .select("pid", "sid").collect().map(r => (r.getLong(0), r.getString(1))).sorted
    assert(out.toSeq == Seq((1L, "s1"), (2L, "s1")))
  }

  test("inverted/empty intervals produce no matches (no descending sequence)") {
    // unguarded, sequence(floor(start), floor(end-1µs)) counts DOWN for
    // end <= start and emits spurious bucket rows
    val points = Seq(("u1", t(30), 1L)).toDF("k", "ts", "pid")
    val intervals = Seq(
      ("u1", t(90), t(0), "inverted"), // end << start
      ("u1", t(30), t(30), "empty"))   // end == start
      .toDF("k", "s", "e", "sid")
    val out = RangeJoin.pointInInterval(points, intervals,
      Seq("k"), "ts", "s", "e", bucketSeconds = 60L)
    assert(out.isEmpty, out.collect().mkString(","))
  }

  test("property: matches brute-force containment join on random intervals") {
    val rnd = new scala.util.Random(37)
    val points = Seq.tabulate(200)(i =>
      (s"u${rnd.nextInt(5)}", t(rnd.nextInt(120)), i.toLong)).toDF("k", "ts", "pid")
    val intervals = Seq.tabulate(60) { i =>
      val s = rnd.nextInt(120)
      (s"u${rnd.nextInt(5)}", t(s), t(s + 1 + rnd.nextInt(40)), s"iv$i")
    }.toDF("k", "s", "e", "sid")

    // bucket width deliberately NOT aligned to interval lengths
    val got = RangeJoin.pointInInterval(points, intervals,
        Seq("k"), "ts", "s", "e", bucketSeconds = 420L)
      .select("pid", "sid").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val ref = points.as("p").join(intervals.as("i"),
        col("p.k") === col("i.k") && col("p.ts") >= col("i.s") && col("p.ts") < col("i.e"))
      .select("pid", "sid").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == ref, s"diff: ${(got diff ref) ++ (ref diff got)}")
  }

  test("a point matches exactly one interval (no bucket-duplicate rows)") {
    val points = Seq(("u1", t(30), 1L)).toDF("k", "ts", "pid")
    // interval spans 4 buckets at 60s width; the point must appear once
    val intervals = Seq(("u1", t(0), t(240), "wide")).toDF("k", "s", "e", "sid")
    val out = RangeJoin.pointInInterval(points, intervals,
      Seq("k"), "ts", "s", "e", bucketSeconds = 60L)
    assert(out.count() == 1)
  }
}
