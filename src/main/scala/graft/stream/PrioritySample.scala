package graft.stream

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming twin of the batch priority sampler (est_weighted_sample)
  * and its Horvitz-Thompson total (est_priority_ht) — the
  * resumable-ingest story the batch sampler's scaladoc promises
  * (round-12 verdict ask 6, the j16/intervalCoverage twin pattern).
  *
  * Priority sampling (Duffield-Lund-Thorup) is REPLACEABLE state by
  * construction: the key u/w = (h+1)/(P·w) is a pure per-row function
  * (no RNG state), so the weighted-sample-without-replacement of any
  * stream prefix is exactly "the k smallest keys seen so far" — a
  * bounded top-k reservoir, not a scan. This operator keeps the k+1
  * smallest (key, doc_id) entries per SHARD (k sample candidates plus
  * the τ witness) in flatMapGroupsWithState, so:
  *
  *  - state is a constant (k+1)·nShards entries at ANY stream length
  *    (the bounded-state discipline every stateful op needs at
  *    100 TB/day);
  *  - the global sample is exact: the global k+1 smallest keys are
  *    contained in the union of per-shard k+1 smallest (the standard
  *    distributed top-k argument), so [[mergeSample]] over the
  *    (k+1)·nShards final rows reproduces the batch sample
  *    bit-for-bit — same Weyl mix, same single IEEE division, same
  *    9 dp rounding, same (key, doc_id) tie-break;
  *  - the HT total needs one more long per shard (Σw of everything
  *    seen), merged by addition — so the streaming side carries the
  *    whole est_priority_ht read: τ from the merged (k+1)-th key
  *    (0 when ≤ k docs qualify, the batch n ≤ k guard), each term
  *    max(w, τ) pinned to a ×100 integer before the k-row sum.
  *
  * Restart/resume is the state store's checkpoint (same recovery
  * contract CheckpointRecoverySpec proves for the census path);
  * re-ingesting a prefix is idempotent only per-row — exactly-once
  * row delivery is the source's contract, as with every count-like
  * stateful operator here.
  *
  * 100 TB shape: shards spread the reservoir across executors; the
  * per-batch emission is k+1 rows per ACTIVE shard (constant), and
  * the merge is a driver-side fold over (k+1)·nShards rows — the
  * sample is maintained incrementally instead of re-scanning the
  * corpus per refresh, which is the whole point of a priority sample
  * over a 100 TB crawl.
  */
object PrioritySample {

  /** Modulus + stride shared verbatim with est_weighted_sample /
    * est_priority_ht (TextQueries) — the wrap-safe Weyl mix.
    */
  val P = 1000000007L
  val Stride = 2654435761L
  val Offset = 104729L

  final case class DocArrival(doc_id: Long, ts: Timestamp, w: Long)

  final case class Entry(key: Double, doc_id: Long, w: Long)

  /** Per-shard reservoir: the k+1 smallest entries, plus the exact
    * token total and row count of everything the shard has seen.
    */
  final case class ShardState(entries: Seq[Entry], w_total: Long,
      processed: Long)

  final case class SampleUpdate(shard: Int, key: Double, doc_id: Long,
      w: Long, rank: Long, shard_w_total: Long, shard_processed: Long)

  /** The batch queries' key, replayed exactly: one correctly-rounded
    * IEEE division of exact longs, rounded to 9 dp HALF_UP (Spark's
    * Round semantics for doubles) — bit-identical to the plan-side
    * computation, which is what makes stream ≡ batch testable by
    * equality rather than tolerance.
    */
  def priorityKey(docId: Long, w: Long): Double = {
    val h = ((docId % P) * Stride + Offset) % P
    BigDecimal((h + 1).toDouble / w.toDouble)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  /** Maintain the per-shard k+1 smallest priority keys over an
    * unbounded document stream. Emits each shard's full reservoir
    * every batch the shard receives rows (Update mode — the latest
    * emission per shard is its current state; `shard_processed` is
    * monotone, so "rows at max shard_processed per shard" selects it).
    * Rows with w ≤ 0 are ignored, matching the batch `w > 0` filter.
    */
  def sample(docs: Dataset[DocArrival], k: Int,
      nShards: Int): Dataset[SampleUpdate] = {
    implicit val stateEnc = Encoders.product[ShardState]
    implicit val outEnc = Encoders.product[SampleUpdate]
    docs
      .groupByKey(e => math.floorMod(e.doc_id, nShards.toLong).toInt)(
        Encoders.scalaInt)
      .flatMapGroupsWithState[ShardState, SampleUpdate](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (shard: Int, rows: Iterator[DocArrival], state) =>
          val prev = state.getOption.getOrElse(ShardState(Seq.empty, 0L, 0L))
          var wTotal = prev.w_total
          var processed = prev.processed
          var entries = prev.entries
          rows.foreach { e =>
            if (e.w > 0L) {
              processed += 1
              wTotal += e.w
              entries = entries :+ Entry(priorityKey(e.doc_id, e.w), e.doc_id, e.w)
            }
          }
          val kept = entries.sortBy(e => (e.key, e.doc_id)).take(k + 1)
          state.update(ShardState(kept, wTotal, processed))
          kept.zipWithIndex.iterator.map { case (e, i) =>
            SampleUpdate(shard, e.key, e.doc_id, e.w, (i + 1).toLong,
              wTotal, processed)
          }
      }
  }

  /** Global sample from the shards' FINAL reservoirs: the k smallest
    * (key, doc_id) of the union — exactly est_weighted_sample's rows.
    * Driver-side over ≤ (k+1)·nShards entries (constant).
    */
  def mergeSample(finalRows: Seq[SampleUpdate], k: Int): Seq[Entry] =
    finalRows.map(u => Entry(u.key, u.doc_id, u.w))
      .sortBy(e => (e.key, e.doc_id)).take(k)

  /** The est_priority_ht read from the same final reservoirs:
    * (n_sample, true_tokens, est2) with τ_w = P/key_{k+1} (0 when the
    * qualifying corpus has ≤ k docs — the batch guard), every max(w,
    * τ) term rounded to a ×100 integer BEFORE the sum. `true_tokens`
    * is the exact Σw over the whole stream (per-shard longs, merged
    * by addition).
    */
  def htTotal(finalRows: Seq[SampleUpdate], k: Int): (Long, Long, Long) = {
    val union = finalRows.map(u => Entry(u.key, u.doc_id, u.w))
      .sortBy(e => (e.key, e.doc_id))
    val trueTokens = finalRows.groupBy(_.shard)
      .map { case (_, xs) => xs.head.shard_w_total }.sum
    val sample = union.take(k)
    val tauW =
      if (union.length < k + 1) 0.0
      else P.toDouble / union(k).key
    val est2 = sample.map(e =>
      math.round(math.max(e.w.toDouble, tauW) * 100)).sum
    (sample.length.toLong, trueTokens, est2)
  }

  /** The final reservoir per shard from a memory-sink table of
    * [[SampleUpdate]] rows: each shard's rows at its maximum
    * `shard_processed` (Update mode re-emits the full reservoir per
    * batch; processed is monotone per shard).
    */
  def latestPerShard(all: Seq[SampleUpdate]): Seq[SampleUpdate] =
    all.groupBy(_.shard).flatMap { case (_, xs) =>
      val last = xs.map(_.shard_processed).max
      xs.filter(_.shard_processed == last)
    }.toSeq
}
