package graft.stream

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ext.NearDup
import graft.ext.TextAnalysis

/** Streaming NEAR-duplicate detection — the banded-MinHash candidate
  * machinery of `dedup_minhash_pairs` made cross-batch stateful, so a
  * crawl ingest flags incoming documents that near-duplicate something
  * seen in an EARLIER micro-batch (streaming exact dedup,
  * [[graft.ext.Dedup.streamingExactDedup]], catches only byte-identical
  * fingerprints; the near-dup class — boilerplate re-crawls, templated
  * rewrites — needs signature collision).
  *
  * Shape: per document compute the k-minimum MinHash signature (pure
  * Column ops, map-side), explode it into `numBands` band buckets, and
  * run one `flatMapGroupsWithState` keyed by the band-bucket value.
  * State per key is the FIRST doc id that hit the bucket (one long —
  * the minimum viable near-dup memory); every later arrival in the
  * same bucket within the watermark horizon emits a collision row
  * `(doc_id, first_doc, band)`. Event-time timeout evicts buckets
  * `stateTtl` past their last hit, so state is bounded by the number
  * of DISTINCT band buckets active inside the horizon — the same
  * watermark-bounds-state discipline as every other stateful op here.
  *
  * Collision rows are CANDIDATES exactly as in the batch query (a
  * banded match implies high estimated Jaccard per the banding
  * threshold curve); a pair sharing b bands emits b rows, and the
  * downstream consumer (foreachBatch sink, alerting, quarantine
  * table) distincts on (doc_id, first_doc) or re-checks exactly —
  * the batch re-rank — as policy requires. At 100 TB/day the per-row
  * cost is the signature (one pass over tokens) plus `numBands`
  * state lookups on uniformly-hashed keys.
  */
object StreamingNearDup {

  final case class BandHit(bucket: String, doc_id: Long, ts: Timestamp)
  final case class BucketState(first_doc: Long, lastMs: Long)
  final case class Collision(doc_id: Long, first_doc: Long, bucket: String)

  /** Band-bucket rows for a documents frame with `text` + event-time
    * columns: one row per (document, band), bucket = "band:h1:h2"
    * over the k-min signature (r = 2 rows/band, the batch query's
    * banding scheme).
    */
  def bandRows(docs: DataFrame, tsCol: String,
      shingleK: Int = 3, minhashK: Int = 16, bandR: Int = 2): DataFrame = {
    val numBands = minhashK / bandR
    val hs = array_sort(NearDup.shingleHashSet(TextAnalysis.tokens(col("text")), shingleK))
    val ms = NearDup.minhashSigs(hs, minhashK)
    val bandArr = array((0 until numBands).map { j =>
      concat_ws(":", lit(j),
        get(ms, lit(j * bandR)), get(ms, lit(j * bandR + 1)))
    }: _*)
    docs.select(col("doc_id"), col(tsCol).as("ts"), explode(bandArr).as("bucket"))
  }

  /** Cross-batch collision stream over [[bandRows]] output. */
  def collisions(bands: Dataset[BandHit], watermarkDelay: String,
      stateTtlMs: Long): Dataset[Collision] = {
    implicit val stateEnc = Encoders.product[BucketState]
    implicit val outEnc = Encoders.product[Collision]
    bands
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.bucket)(Encoders.STRING)
      .flatMapGroupsWithState[BucketState, Collision](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (bucket: String, rows: Iterator[BandHit], state: GroupState[BucketState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else if (rows.isEmpty) Iterator.empty
          else {
            // deterministic within-batch order: smallest doc_id first,
            // so the batch-1 "first arrival" is reproducible
            val batch = rows.toVector.sortBy(_.doc_id)
            var s = state.getOption.getOrElse(
              BucketState(batch.head.doc_id, Long.MinValue))
            val out = batch.flatMap { r =>
              val hit =
                if (r.doc_id != s.first_doc) Some(Collision(r.doc_id, s.first_doc, bucket))
                else None
              s = s.copy(lastMs = math.max(s.lastMs, r.ts.getTime))
              hit
            }
            state.update(s)
            // TTL past the last hit, clamped ahead of the watermark: a
            // bucket whose lastMs + TTL already fell behind (possible
            // when one micro-batch spans hours of event time) is
            // "already expired" — evict at the next trigger rather
            // than throw on a timeout in the past.
            state.setTimeoutTimestamp(math.max(s.lastMs + stateTtlMs,
              state.getCurrentWatermarkMs() + 1))
            out.iterator
          }
      }
  }

  /** Full flow: documents stream → signatures → band buckets →
    * stateful collision detection.
    */
  def detect(docs: DataFrame, tsCol: String, watermarkDelay: String,
      stateTtlMs: Long = 3600000L): Dataset[Collision] = {
    val spark = docs.sparkSession
    import spark.implicits._
    collisions(bandRows(docs, tsCol).as[BandHit], watermarkDelay, stateTtlMs)
  }
}
