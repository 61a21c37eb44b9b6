package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

import org.apache.spark.sql.functions._

import graft.ops.Scd2

/** SCD2 operator properties over GENERATED change logs (the fixture
  * queries pin one corpus; these pin the algebra):
  * 1. merge ≡ rebuild — for ANY log and ANY append-only cut,
  *    Scd2.merge(changePoints(log ≤ cut), log > cut) equals
  *    Scd2.build(full log) row-for-row, version numbers included
  *    (the contract scd2_merge's oracle checks on one corpus);
  * 2. PIT stamp never leaks — every fact gets exactly the value of
  *    the latest change point at-or-before its ts (hist-before-fact
  *    tie rule), NULL when none exists, verified against a
  *    plain-Scala replay.
  */
class Scd2PropertySpec extends SparkSpec {
  import spark.implicits._

  private val K = Seq("key", "value", "ts", "seq")

  // (key, value, ts, seq) logs: few keys, tiny value/ts domains so
  // collapses, same-ts ties, and single-version keys all occur
  private val logGen: Gen[List[(Long, String, Int, Long)]] = for {
    n <- Gen.choose(1, 60)
    rows <- Gen.listOfN(n, for {
      k <- Gen.choose(0L, 4L)
      v <- Gen.oneOf("a", "b", "c")
      ts <- Gen.choose(0, 15)
    } yield (k, v, ts))
  } yield rows.zipWithIndex.map { case ((k, v, ts), i) => (k, v, ts, i.toLong) }

  private def runProp(prop: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(r.passed, r.status.toString)
  }

  test("merge over any append-only cut equals the full rebuild") {
    val prop = Prop.forAllNoShrink(logGen, Gen.choose(0, 16)) { (rows, cut) =>
      val log = rows.toDF(K: _*)
      val full = Scd2.build(log, K(0), K(1), K(2), K(3))
        .collect().map(_.toSeq).toSet
      val merged = Scd2.merge(
          Scd2.changePoints(log.filter(col("ts") < cut), K(0), K(1), K(2), K(3)),
          log.filter(col("ts") >= cut), K(0), K(1), K(2), K(3))
        .collect().map(_.toSeq).toSet
      full == merged
    }
    runProp(prop)
  }

  test("PIT stamp equals the plain-Scala as-of replay (no leakage)") {
    val factGen = Gen.listOfN(25, for {
      k <- Gen.choose(0L, 5L) // includes keys with no history
      ts <- Gen.choose(-1, 16)
    } yield (k, ts))
    val prop = Prop.forAllNoShrink(logGen, factGen) { (rows, factsRaw) =>
      val facts = factsRaw.zipWithIndex
        .map { case ((k, ts), i) => (k, ts, 1000L + i) }
      val hist = Scd2.changePoints(rows.toDF(K: _*), K(0), K(1), K(2), K(3))
      val got = Scd2.pitStamp(hist, facts.toDF("key", "ts", "seq"),
          K(0), K(1), K(2), K(3), asOfCol = "as_of")
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)) ->
          Option(r.getString(3))).toMap
      // plain-Scala replay of the change-point collapse + as-of pick
      val cps = rows.groupBy(_._1).flatMap { case (k, rs) =>
        val sorted = rs.sortBy(r => (r._3, r._4))
        sorted.foldLeft(List.empty[(Long, String, Int, Long)]) {
          case (acc, r) =>
            if (acc.headOption.exists(_._2 == r._2)) acc else r :: acc
        }.reverse.map(r => (k, r._2, r._3, r._4))
      }.toSeq
      facts.forall { case (k, fts, seq) =>
        val expect = cps.filter(c => c._1 == k && c._3 <= fts)
          .sortBy(c => (c._3, c._4)).lastOption.map(_._2)
        got((k, fts, seq)) == expect
      }
    }
    runProp(prop)
  }
}
