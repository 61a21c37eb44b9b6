package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins — the remaining Structured Streaming join
  * surface beyond the reference (which is processing-time only,
  * SURVEY T8) and beyond the batch as-of/range joins in `graft.ops`.
  *
  * The canonical use is event attribution: attach to each left event
  * (impression) the right events (clicks) on the same key that arrive
  * within a bounded interval after it. The two things that make this
  * viable on an unbounded 100 TB/day stream:
  *
  *  - watermarks on BOTH inputs — without them Spark must buffer every
  *    row ever seen on each side;
  *  - the INTERVAL condition in the join predicate — it bounds how far
  *    apart matching rows can be in event time, which is what lets the
  *    state store evict a row once the other side's watermark passes
  *    its match horizon (`ts + within + delay`).
  *
  * Outer variants emit the unmatched row with nulls only once the
  * watermark proves no future match can arrive — correctness and state
  * eviction come from the same mechanism.
  */
object StreamJoins {

  /** Interval join: right rows with `rightTs` in
    * `[leftTs, leftTs + within]` on key equality. Works identically on
    * batch frames (watermarks are ignored there), which is how the
    * semantics are unit-checked. Column names must be disjoint across
    * the two sides (standard streaming-join requirement for
    * unambiguous output).
    *
    * @param joinType "inner" or "leftOuter" ("rightOuter"/"fullOuter"
    *   follow the same watermark rules)
    */
  def intervalJoin(
      left: DataFrame, leftKey: String, leftTs: String,
      right: DataFrame, rightKey: String, rightTs: String,
      within: String, watermarkDelay: String,
      joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark(leftTs, watermarkDelay)
    val r = right.withWatermark(rightTs, watermarkDelay)
    l.join(r,
      expr(s"$leftKey = $rightKey AND $rightTs >= $leftTs " +
        s"AND $rightTs <= $leftTs + interval '$within'"),
      joinType)
  }

  /** Stream-static enrichment join: attach a small static dimension
    * frame to a stream by key — the lookup/enrichment op of every
    * ingest flow (per-source quotas, language metadata, allowlists).
    * The static side is explicitly broadcast, so each micro-batch
    * plans a broadcast-hash join: the stream side never shuffles and
    * the join holds NO streaming state (nothing to watermark — the
    * static side is fully known every batch, and is re-resolved per
    * batch, which is also how a catalog-backed dimension picks up
    * slowly-changing updates between batches).
    */
  def enrichWithDim(stream: DataFrame, dim: DataFrame, keys: Seq[String],
      joinType: String = "inner"): DataFrame =
    stream.join(broadcast(dim), keys, joinType)
}
