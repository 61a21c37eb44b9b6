package graft.stream

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming EXACT distinct counting with bounded per-key state — the
  * stateful counterpart of the batch bitmap rollup (a48): the same
  * "exact like count(DISTINCT), additive like a sketch" property,
  * maintained incrementally across micro-batches.
  *
  * Why not `dropDuplicates` + count: distinct-user state as raw keys
  * grows with cardinality (one state row per user seen), and
  * watermark-bounded dedup (E29) deliberately FORGETS — correct for
  * dedup, wrong for an all-time distinct. Here the state for a
  * (group, bucket) key is a FIXED 4 KB bitmap of its 32768-wide id
  * slice: memory is `#groups × ⌈id-range/32768⌉ × 4 KB` however long
  * the stream runs and however many events arrive — the constant-
  * state property that makes an all-time exact distinct operable at
  * stream scale. Buckets shard the id space, so the state store
  * distributes them across executors like any keyed state, and the
  * per-bucket counts re-aggregate downstream (or at read time) by
  * plain SUM — bitmaps never leave their key.
  *
  * Each micro-batch emits the updated exact count per (group,
  * bucket); Σ over buckets of a group = exact all-time distinct ids,
  * provable against batch count(DISTINCT) (StreamingDistinctSpec).
  */
object StreamingDistinct {

  /** Bits per bucket: 32768 = 512 longs = 4 KB per state entry. */
  val BucketBits = 32768L

  final case class BucketCount(group: String, bucket: Long, distinct: Long)

  /** (group, id) stream → per-(group, bucket) exact distinct counts,
    * updated every micro-batch. Ids must be non-negative.
    */
  def bucketCounts(events: Dataset[(String, Long)]): Dataset[BucketCount] = {
    import events.sparkSession.implicits._
    events
      .map { case (g, id) =>
        // fail fast with an actionable message: a negative id would
        // make pos negative and crash inside the state function with
        // an opaque executor ArrayIndexOutOfBoundsException (r9 ADVICE)
        require(id >= 0, s"StreamingDistinct requires non-negative ids, got $id (group=$g)")
        (g, id / BucketBits, id % BucketBits)
      }
      .groupByKey { case (g, bkt, _) => (g, bkt) }
      .mapGroupsWithState[Array[Byte], BucketCount](
        GroupStateTimeout.NoTimeout) {
        case ((g, bkt), rows, state: GroupState[Array[Byte]]) =>
          val bits = state.getOption
            .getOrElse(new Array[Byte]((BucketBits / 8).toInt))
          rows.foreach { case (_, _, pos) =>
            val p = pos.toInt
            bits(p >> 3) = (bits(p >> 3) | (1 << (p & 7))).toByte
          }
          state.update(bits)
          var n = 0L
          var i = 0
          while (i < bits.length) {
            n += java.lang.Integer.bitCount(bits(i) & 0xFF)
            i += 1
          }
          BucketCount(g, bkt, n)
      }
  }
}
