package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.stream.StatefulOps
import graft.stream.StatefulOps.KeyedEvent

/** flatMapGroupsWithState semantics: state accumulates across
  * micro-batches per key, and event-time timeout evicts inactive keys
  * (emitting a final expired row) once the watermark passes.
  */
class StatefulOpsSpec extends SparkSpec {
  import spark.implicits._

  private def t(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("running stats accumulate across batches and expire on inactivity") {
    val input = MemoryStream[KeyedEvent](spark)
    val out = StatefulOps.runningUserStats(
      input.toDS(), watermarkDelay = "1 minute",
      inactivityTimeoutMs = 10 * 60 * 1000)

    val query = out.writeStream
      .format("memory").queryName("stateful_stats")
      .outputMode("update")
      .start()

    // batch 1: u1 twice, u2 once
    input.addData(Seq(
      KeyedEvent(1L, t(0), 10.0), KeyedEvent(1L, t(1), 20.0),
      KeyedEvent(2L, t(1), 5.0)))
    query.processAllAvailable()
    // batch 2: u1 again → state carried (count 3)
    input.addData(Seq(KeyedEvent(1L, t(2), 30.0)))
    query.processAllAvailable()
    // batch 3: far-future event pushes the watermark past u1/u2
    // timeouts (last activity + 10 min) → both expire
    input.addData(Seq(KeyedEvent(3L, t(40), 1.0)))
    query.processAllAvailable()
    query.stop()

    val rows = spark.table("stateful_stats")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))

    val live = rows.filter(!_._4)
    // u1's running updates: (2, avg 15) after batch 1, (3, avg 20) after batch 2
    assert(live.contains((1L, 2L, 15.0, false)))
    assert(live.contains((1L, 3L, 20.0, false)))
    assert(live.contains((2L, 1L, 5.0, false)))

    val expired = rows.filter(_._4)
    assert(expired.toSet == Set((1L, 3L, 20.0, true), (2L, 1L, 5.0, true)))
  }

  test("sharded Misra-Gries tracks planted heavy hitters within the MG bound") {
    import graft.stream.StatefulOps.TokenEvent
    val k = 10
    val nShards = 4
    // planted: two heavy tokens (120 and 80 occurrences) in a sea of
    // 400 singletons, split across two batches to prove state carries
    val heavy = Seq.fill(60)("hot_a") ++ Seq.fill(40)("hot_b")
    val noise1 = (0 until 200).map(i => s"noise_$i")
    val noise2 = (200 until 400).map(i => s"noise_$i")

    val input = MemoryStream[TokenEvent](spark)
    val out = StatefulOps.heavyHitters(
      input.toDS(), k = k, nShards = nShards, watermarkDelay = "1 minute")
    val query = out.writeStream
      .format("memory").queryName("mg_hitters")
      .outputMode("update")
      .start()

    input.addData((heavy ++ noise1).map(TokenEvent(_, t(0))))
    query.processAllAvailable()
    input.addData((heavy ++ noise2).map(TokenEvent(_, t(1))))
    query.processAllAvailable()
    query.stop()

    val rows = spark.table("mg_hitters")
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // latest snapshot per (shard, token): the row with max processed
    val latest = rows.groupBy(r => (r._1, r._2))
      .map { case (_, rs) => rs.maxBy(_._4) }.toSeq

    val trueCounts = Map("hot_a" -> 120L, "hot_b" -> 80L)
    for ((tok, truth) <- trueCounts) {
      val row = latest.find(_._2 == tok)
      assert(row.isDefined, s"$tok missing from final MG counters")
      val (_, _, est, processed) = row.get
      // MG guarantee for the token's shard: true - n_shard/k <= est <= true
      assert(est <= truth, s"$tok overestimated: $est > $truth")
      assert(est >= truth - processed / k,
        s"$tok underestimated beyond bound: $est < $truth - $processed/$k")
    }
    // state boundedness: no shard ever carries more than k counters
    rows.groupBy(r => (r._1, r._4)).foreach { case ((shard, _), rs) =>
      assert(rs.map(_._2).distinct.size <= k, s"shard $shard exceeded k counters")
    }
  }
}
