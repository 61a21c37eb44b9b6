package graft

import scala.util.Random

import org.scalacheck.{Gen, Prop, Test => SCTest}

import org.apache.spark.sql.functions._

import graft.ops.Derive
import graft.stream.Simulator

/** Property tests (SURVEY §5.4):
  * 1. snapshot re-aggregation invariant — for ANY partition of rows into
  *    micro-batches, summing per-batch grouped counts equals the direct
  *    count over the union (the associativity the dashboard relies on,
  *    dashboard.py:274,310,346);
  * 2. simulator anomaly injection rate ≈ 5%.
  */
class ReaggPropertySpec extends SparkSpec {
  import spark.implicits._

  private val seedRows = Simulator.generateSeed(300)

  test("per-batch counts re-aggregate to the direct count for any batching") {
    val gen = for {
      n <- Gen.choose(1, 120)
      cuts <- Gen.listOfN(4, Gen.choose(0, n))
    } yield (n, cuts.sorted)

    val prop = Prop.forAllNoShrink(gen) { case (n, cuts) =>
      val rows = seedRows.take(n)
      val bounds = (0 +: cuts :+ n).distinct.sorted
      val batches = bounds.zip(bounds.tail).map { case (a, b) => rows.slice(a, b) }
        .filter(_.nonEmpty)

      val perBatch = batches.map { b =>
        Derive.enrich(b.toDF()).groupBy("age_group").count()
      }
      val summed = perBatch.reduce(_ union _)
        .groupBy("age_group").agg(sum("count").as("c"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

      val direct = Derive.enrich(rows.toDF()).groupBy("age_group").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

      summed == direct
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(result.passed, result.status.toString)
  }

  test("anomaly injection rate is ~5% over many ticks") {
    val cfg = Simulator.Config()
    val rng = new Random(123)
    var total = 0
    var anomalous = 0
    (0 until 400).foreach { _ =>
      val batch = Simulator.sampleBatch(seedRows, rng, cfg)
      total += batch.length
      // boundary seed rows never use the injected values {90,95,100,5,3,1}
      // except hours 5/3/1 can occur naturally — count only the high tail
      anomalous += batch.count(r => Seq(90, 95, 100).contains(r.hours_per_week.get))
    }
    val rate = anomalous.toDouble / total
    // injected rate is 5% over six values, half of which are 90/95/100
    assert(rate > 0.005 && rate < 0.06, s"rate=$rate")
  }
}
