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
            state.setTimeoutTimestamp(next.lastTs + inactivityTimeoutMs)
            Iterator.single(UserUpdate(userId, next.count, next.sum / next.count, expired = false))
          }
      }
  }
}
