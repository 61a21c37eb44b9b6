package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.AsofJoin

/** As-of join semantics on hand-checkable data: backward-inclusive
  * match, per-key isolation, null when nothing precedes, latest wins
  * among multiple candidates.
  */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def t(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("backward-inclusive per-key as-of semantics") {
    val left = Seq(
      ("u1", t(0), 100L), // before any right row → null
      ("u1", t(5), 101L), // exactly at right ts 5 → inclusive match
      ("u1", t(9), 102L), // between 5 and 10 → still 5
      ("u1", t(12), 103L), // after 10 → 10 (latest wins)
      ("u2", t(12), 104L)) // other key: only u2's right rows count
      .toDF("k", "ts", "event_id")
    val right = Seq(
      ("u1", t(5), 5.0), ("u1", t(10), 10.0), ("u2", t(3), 3.0))
      .toDF("k", "ts", "v")

    val out = AsofJoin.asofBackward(left, right, Seq("k"), "ts", "ts", Seq("v"))
      .orderBy("event_id")
      .collect()
      .map(r => r.getLong(2) -> Option(r.get(3)).map(_.asInstanceOf[Double]))
    assert(out.toSeq == Seq(
      100L -> None, 101L -> Some(5.0), 102L -> Some(5.0),
      103L -> Some(10.0), 104L -> Some(3.0)))
  }

  test("a matched right row with NULL payload wins (not carried over)") {
    // DuckDB ASOF JOIN returns the matched row's NULL — filling the raw
    // payload with last(ignoreNulls) would skip it and wrongly carry the
    // older row's 5.0 forward
    val left = Seq(("u1", t(12), 1L)).toDF("k", "ts", "event_id")
    val right = Seq(
      ("u1", t(5), Some(5.0)),
      ("u1", t(10), None: Option[Double])) // the true as-of match, NULL payload
      .toDF("k", "ts", "v")
    val out = AsofJoin.asofBackward(left, right, Seq("k"), "ts", "ts", Seq("v"))
      .head()
    assert(out.isNullAt(out.fieldIndex("asof_v")),
      s"expected matched-row NULL, got $out")
  }

  test("property: matches brute-force argmax(right.ts <= left.ts) on random data") {
    val rnd = new scala.util.Random(31)
    val left = Seq.tabulate(300)(i =>
      (s"u${rnd.nextInt(8)}", t(rnd.nextInt(60)), i.toLong)).toDF("k", "ts", "event_id")
    // distinct (key, ts) on the right — the documented uniqueness contract
    val rightRows = rnd.shuffle(
      (for (u <- 0 until 8; m <- 0 until 60) yield (s"u$u", t(m))).toList)
      .take(150).map { case (k, ts) => (k, ts, rnd.nextDouble()) }
    val right = rightRows.toDF("k", "ts", "v")

    val got = AsofJoin.asofBackward(left, right, Seq("k"), "ts", "ts", Seq("v"))
      .collect().map(r => r.getLong(2) -> Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
    // brute force: latest right row at-or-before, per key
    val byKey = rightRows.groupBy(_._1)
    val leftRows = left.collect().map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2)))
    leftRows.foreach { case (k, ts, id) =>
      val expect = byKey.getOrElse(k, Nil)
        .filter(!_._2.after(ts))
        .sortBy(_._2.getTime)
        .lastOption.map(_._3)
      assert(got(id) == expect, s"key=$k ts=$ts id=$id")
    }
  }

  test("property: bucketed variant == asofBackward on random data incl. a 50%-hot key") {
    val rnd = new scala.util.Random(37)
    // u0 takes ~half of all traffic on both sides — the funnel case the
    // bucketed variant exists for
    def key(): String = if (rnd.nextBoolean()) "u0" else s"u${1 + rnd.nextInt(7)}"
    val left = Seq.tabulate(400)(i => (key(), t(rnd.nextInt(59)), i.toLong))
      .toDF("k", "ts", "event_id")
    val rightRows = rnd.shuffle(
      (for (u <- 0 until 8; m <- 0 until 59) yield (s"u$u", t(m))).toList)
      .take(200).map { case (k, ts) => (k, ts, rnd.nextDouble()) }
    val right = rightRows.toDF("k", "ts", "v")

    def collect(df: org.apache.spark.sql.DataFrame) =
      df.collect()
        .map(r => r.getLong(2) -> Option(r.get(3)).map(_.asInstanceOf[Double]))
        .toMap
    val plain = collect(
      AsofJoin.asofBackward(left, right, Seq("k"), "ts", "ts", Seq("v")))
    // 10-minute buckets: the hour of data spans several buckets, so
    // both in-bucket matches and cross-bucket seed carries are hit;
    // also an extreme width (one bucket) must degenerate to the plain op
    for (bucketSeconds <- Seq(600L, 7L, 86400L)) {
      val bucketed = collect(AsofJoin.asofBackwardBucketed(
        left, right, Seq("k"), "ts", "ts", Seq("v"), bucketSeconds))
      assert(bucketed == plain, s"bucketSeconds=$bucketSeconds diverged")
    }
  }

  test("bucketed variant matches a NULL-payload right row like the plain op") {
    val left = Seq(("u1", t(12), 1L)).toDF("k", "ts", "event_id")
    val right = Seq(
      ("u1", t(5), Some(5.0)),
      ("u1", t(10), None: Option[Double]))
      .toDF("k", "ts", "v")
    // bucket width 60 s: t(10) lands in an earlier bucket than t(12), so
    // the NULL-payload match must survive the seed-carry path too
    val out = AsofJoin.asofBackwardBucketed(
      left, right, Seq("k"), "ts", "ts", Seq("v"), bucketSeconds = 60L).head()
    assert(out.isNullAt(out.fieldIndex("asof_v")),
      s"expected matched-row NULL via carry, got $out")
  }

  test("all left columns survive and payload is prefixed") {
    val left = Seq(("u1", t(1), "payload")).toDF("k", "ts", "data")
    val right = Seq(("u1", t(0), 7.0)).toDF("k", "ts", "v")
    val out = AsofJoin.asofBackward(left, right, Seq("k"), "ts", "ts", Seq("v"))
    assert(out.columns.toSeq == Seq("k", "ts", "data", "asof_v", "asof_matched"))
    val r = out.head()
    assert(r.getString(2) == "payload" && r.getDouble(3) == 7.0)
  }

  test("asof_matched distinguishes matched-with-NULL from unmatched (both variants)") {
    // two left rows: one precedes every right row (unmatched), one
    // matches a right row whose payload is NULL — payload null-ness
    // cannot tell them apart, the flag must
    val left = Seq(("u1", t(0), 1L), ("u1", t(12), 2L)).toDF("k", "ts", "event_id")
    val right = Seq(("u1", t(10), None: Option[Double])).toDF("k", "ts", "v")
    for (variant <- Seq(
        AsofJoin.asofBackward(left, right, Seq("k"), "ts", "ts", Seq("v")),
        AsofJoin.asofBackwardBucketed(left, right, Seq("k"), "ts", "ts", Seq("v"), 60L))) {
      val byId = variant.collect()
        .map(r => r.getLong(2) -> r.getBoolean(r.fieldIndex("asof_matched"))).toMap
      assert(byId == Map(1L -> false, 2L -> true), byId.toString)
    }
  }
}
