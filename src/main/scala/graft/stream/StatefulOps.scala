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
}
