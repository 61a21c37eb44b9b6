package graft.stream

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom cross-batch state via `flatMapGroupsWithState` — the
  * extension-surface stateful operator (kept OFF the census parity
  * path, which is stateless-per-batch by contract, SURVEY T8).
  *
  * Running per-key stats over an unbounded keyed stream with
  * event-time timeout: state lives exactly as long as the key is
  * active within the watermark horizon, then is evicted — the bounded-
  * state discipline every stateful operator needs at 100 TB/day
  * (same reasoning as streaming dedup's watermarked state).
  */
object StatefulOps {

  final case class KeyedEvent(user_id: Long, ts: Timestamp, value: Double)

  final case class UserState(count: Long, sum: Double, lastTs: Long)

  final case class UserUpdate(
      user_id: Long, events_seen: Long, avg_value: Double, expired: Boolean)

  /** Running (count, avg) per user. Emits an update per key per batch;
    * emits a final `expired=true` row when the watermark passes
    * `inactivityTimeout` past the key's last event and its state is
    * dropped.
    */
  def runningUserStats(events: Dataset[KeyedEvent],
      watermarkDelay: String, inactivityTimeoutMs: Long): Dataset[UserUpdate] = {
    implicit val stateEnc = Encoders.product[UserState]
    implicit val outEnc = Encoders.product[UserUpdate]

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[UserState, UserUpdate](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[KeyedEvent], state: GroupState[UserState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(UserUpdate(userId, s.count, s.sum / s.count, expired = true))
          } else {
            val prev = state.getOption.getOrElse(UserState(0L, 0.0, Long.MinValue))
            val next = rows.foldLeft(prev) { (s, e) =>
              UserState(s.count + 1, s.sum + e.value, math.max(s.lastTs, e.ts.getTime))
            }
            state.update(next)
            // clamp to just past the CURRENT watermark: a batch whose
            // max event advances the watermark beyond this key's
            // lastTs + timeout would otherwise make this call throw
            // ("timeout cannot be earlier than watermark") — a
            // batch-composition race, not a semantic choice; the key
            // then times out on the next watermark move, which is the
            // earliest the contract allows (the StreamingNearDup
            // clamp, hit live in the round-9 bench)
            state.setTimeoutTimestamp(math.max(
              next.lastTs + inactivityTimeoutMs,
              state.getCurrentWatermarkMs() + 1))
            Iterator.single(UserUpdate(userId, next.count, next.sum / next.count, expired = false))
          }
      }
  }

  // -------------------------------------------------------------------
  // Streaming heavy hitters: sharded Misra-Gries.
  // -------------------------------------------------------------------

  final case class TokenEvent(token: String, ts: Timestamp)

  final case class MgState(counters: Map[String, Long], processed: Long)

  /** One row per surviving counter per shard per batch (Update mode):
    * `est_count` carries the MG guarantee
    * true − processed/k ≤ est_count ≤ true for this shard's substream.
    */
  final case class MgUpdate(shard: Int, token: String, est_count: Long,
      processed: Long)

  /** Streaming heavy hitters over an unbounded token stream via
    * SHARDED Misra-Gries: tokens hash-partition into `nShards` groups
    * and each shard's `flatMapGroupsWithState` state holds at most
    * `k` counters with the classic MG overflow rule (new token with
    * counters full → decrement ALL, drop zeros). Sharding preserves
    * the MG guarantee exactly — a token's occurrences all land in ONE
    * shard, so its estimate obeys
    * true − n_shard/k ≤ est ≤ true
    * with n_shard the shard's processed count (emitted alongside, so
    * a consumer can compute its own error bar per row).
    *
    * This is the operator the windowed aggregations cannot be: exact
    * streaming GROUP BY token needs state ∝ |vocabulary| (unbounded on
    * a 100 TB/day feed); MG pins state at nShards·k counters FOREVER,
    * which is also why the state needs no timeout — boundedness comes
    * from the algorithm, not eviction. The shard count is the
    * parallelism lever: shards spread the state-store load like any
    * keyed stream, and k·nShards total counters track heavy hitters
    * whose global frequency exceeds n/(k·nShards) in the worst
    * single-shard skew, n/k per shard typically.
    */
  def heavyHitters(tokens: Dataset[TokenEvent], k: Int, nShards: Int,
      watermarkDelay: String): Dataset[MgUpdate] = {
    implicit val stateEnc = Encoders.product[MgState]
    implicit val outEnc = Encoders.product[MgUpdate]

    tokens
      .withWatermark("ts", watermarkDelay)
      .groupByKey(e => math.floorMod(e.token.hashCode, nShards))(Encoders.scalaInt)
      .flatMapGroupsWithState[MgState, MgUpdate](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (shard: Int, rows: Iterator[TokenEvent], state: GroupState[MgState]) =>
          val prev = state.getOption.getOrElse(MgState(Map.empty, 0L))
          var m = prev.counters
          var processed = prev.processed
          rows.foreach { e =>
            processed += 1
            m.get(e.token) match {
              case Some(c) => m = m.updated(e.token, c + 1)
              case None if m.size < k => m = m.updated(e.token, 1L)
              case None =>
                m = m.iterator
                  .map { case (t, c) => (t, c - 1) }
                  .filter(_._2 > 0)
                  .toMap
            }
          }
          state.update(MgState(m, processed))
          m.iterator.map { case (t, c) => MgUpdate(shard, t, c, processed) }
      }
  }

  // -------------------------------------------------------------------
  // Streaming interval UNION (covered time + islands) per user — the
  // streaming twin of the batch j16_interval_union query.
  // -------------------------------------------------------------------

  final case class IntervalEvent(user_id: Long, ts: Timestamp, dur_ms: Long)

  /** `pending` holds only islands the watermark hasn't sealed yet
    * (merged, disjoint, sorted by start — flattened as [s1,e1,s2,e2,…]
    * since GroupState wants a product); `covered_ms`/`n_islands` are
    * the finalized prefix. State is bounded by the watermark horizon:
    * an island whose end < watermark can never merge with anything
    * that can still arrive (Spark drops sub-watermark rows before the
    * operator — the numRowsDroppedByWatermark metric — so every row
    * the operator sees has ts ≥ the batch-start watermark), so it
    * finalizes and leaves the state.
    */
  final case class CovState(pending: Seq[Long], covered_ms: Long,
      n_islands: Long)

  final case class CovUpdate(user_id: Long, covered_ms: Long,
      n_islands: Long, pending_islands: Long, expired: Boolean)

  /** Per-user union of [ts, ts+dur) activity intervals over an
    * unbounded stream — total covered time and island count, the
    * batch j16 semantics with O(horizon) state instead of a full
    * re-sort: merge each arriving interval into the pending disjoint
    * set, seal every island the watermark has passed, emit running
    * totals per batch and a final `expired=true` row on inactivity
    * timeout. Arrivals below the watermark never reach the operator
    * (Spark's stateful late-row drop — surfaced by the engine's own
    * numRowsDroppedByWatermark metric, which is where a pipeline
    * monitors loss), so sealed islands are provably immutable. At
    * 100 TB/day the state per user is the merged islands inside the
    * watermark horizon only — for session-like data a handful of
    * longs, never the stream's history.
    */
  def intervalCoverage(events: Dataset[IntervalEvent],
      watermarkDelay: String, inactivityTimeoutMs: Long): Dataset[CovUpdate] = {
    implicit val stateEnc = Encoders.product[CovState]
    implicit val outEnc = Encoders.product[CovUpdate]

    def merge(pending: Seq[(Long, Long)], iv: (Long, Long)): Seq[(Long, Long)] = {
      val (before, rest) = pending.partition(_._2 < iv._1)
      val (overlap, after) = rest.partition(_._1 <= iv._2)
      val merged =
        if (overlap.isEmpty) iv
        else (math.min(iv._1, overlap.map(_._1).min),
          math.max(iv._2, overlap.map(_._2).max))
      before ++ (merged +: after)
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[CovState, CovUpdate](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[IntervalEvent], state: GroupState[CovState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            val pend = s.pending.grouped(2).map(p => (p(0), p(1))).toSeq
            Iterator.single(CovUpdate(userId,
              s.covered_ms + pend.map(p => p._2 - p._1).sum,
              s.n_islands + pend.size, 0L, expired = true))
          } else {
            val prev = state.getOption.getOrElse(CovState(Seq.empty, 0L, 0L))
            var pending = prev.pending.grouped(2).map(p => (p(0), p(1))).toSeq
            var lastTs = Long.MinValue
            rows.foreach { e =>
              val s0 = e.ts.getTime
              lastTs = math.max(lastTs, s0)
              pending = merge(pending, (s0, s0 + e.dur_ms))
            }
            val wm = state.getCurrentWatermarkMs()
            val (done, open) = pending.partition(_._2 < wm)
            val next = CovState(open.flatMap(p => Seq(p._1, p._2)),
              prev.covered_ms + done.map(p => p._2 - p._1).sum,
              prev.n_islands + done.size)
            state.update(next)
            state.setTimeoutTimestamp(math.max(
              (if (lastTs == Long.MinValue) wm else lastTs) + inactivityTimeoutMs,
              wm + 1))
            Iterator.single(CovUpdate(userId,
              next.covered_ms + open.map(p => p._2 - p._1).sum,
              next.n_islands + open.size, open.size.toLong,
              expired = false))
          }
      }
  }
}
