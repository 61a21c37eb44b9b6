package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.{Dedup, TextAnalysis}

/** Streaming training-data ingestion: the LLM-pipeline operators
  * composed into one Structured Streaming flow — what a 100 TB crawl
  * ingest actually looks like with this library:
  *
  *   raw documents stream
  *     → text features (tokens / quality / lang-ID / fingerprint —
  *       pure Column ops, map-side)
  *     → quality gate (filter, pushed before any state)
  *     → watermark-bounded streaming exact dedup (keep first arrival
  *       per fingerprint; state evicted past the horizon)
  *
  * Everything before the dedup is stateless projection/filter; the
  * only stateful operator is the dedup, whose memory is bounded by
  * the watermark — the shape that survives an unbounded stream.
  */
object DocumentPipeline {

  final case class Config(
      minQuality: Double = 0.2,
      watermarkDelay: String = "10 minutes")

  /** Stateless enrichment: token stats, quality, lang-ID, fingerprint.
    *
    * Parts shape (see [[TextAnalysis.langIdParts]]): the first
    * projection materializes the small derived parts — token count,
    * distinct count, ONE `token_freqs` pass over the 16 marker words —
    * and the scorers are plain arithmetic over the bound columns.
    * The composed scorers would inline the freqs expression into every
    * argmax reference (~40 token-array passes per row on the streaming
    * hot path). The quality-gate predicate in [[ingest]], when pushed
    * below this projection, re-inlines the quality arithmetic at the
    * scan (~3 token passes for the gate) — unavoidable without a
    * barrier, and still an order of magnitude under the composed form.
    */
  def enrich(docs: DataFrame): DataFrame =
    docs
      .withColumn("__toks", TextAnalysis.tokens(col("text")))
      .withColumn("__ntok", size(col("__toks")))
      .withColumn("__ndis", size(array_distinct(col("__toks"))))
      .withColumn("__freqs",
        TextAnalysis.wordFreqs(col("__toks"), TextAnalysis.allMarkerWords))
      .drop("__toks")
      .withColumn("n_tokens", col("__ntok"))
      .withColumn("quality", TextAnalysis.qualityScoreParts(col("__ntok"),
        col("__ndis"), TextAnalysis.stopHitsFromFreqs(col("__freqs"))))
      .withColumn("lang_pred", TextAnalysis.langIdParts(col("__freqs")))
      .withColumn("fingerprint", TextAnalysis.fingerprint(col("text")))
      .drop("__ntok", "__ndis", "__freqs")

  /** Enrich + quality gate — ONE definition of the gated composition,
    * shared by [[ingest]] and Bench's stage-attribution knob so the
    * measured "gate" stage is exactly what production ingest runs.
    *
    * The observe() is the barrier that keeps the gate out of the scan:
    * a pushed-down quality predicate re-inlines ~3 tokenizations per
    * row at the source (PushPredicateThroughNonJoin substitutes
    * aliases with no cost model), but CollectMetrics is not a node
    * predicates push through, so the filter evaluates against the
    * materialized parts instead. Measured at sf0.1 (50 k rows,
    * 5 batches, docs bench): enrich+gate p50 462 → ~270 ms (enrich
    * alone is 283), full ingest 468 → ~350 ms. The metric itself is
    * the per-batch pre-gate row count, visible in streaming progress.
    */
  def enrichGated(docs: DataFrame, config: Config = Config()): DataFrame =
    enrich(docs)
      .observe("graft_enrich", count(lit(1)).as("n_enriched"))
      .filter(col("quality") >= config.minQuality)

  /** Full ingest flow over a (streaming or batch) documents frame with
    * an event-time column `tsCol`.
    */
  def ingest(docs: DataFrame, tsCol: String,
      config: Config = Config()): DataFrame =
    Dedup.streamingExactDedup(enrichGated(docs, config), col("fingerprint"),
      tsCol, config.watermarkDelay)
}
