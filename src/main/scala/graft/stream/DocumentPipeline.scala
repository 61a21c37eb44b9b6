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

  /** Stateless enrichment: token stats, quality, lang-ID, fingerprint. */
  def enrich(docs: DataFrame): DataFrame =
    docs
      .withColumn("n_tokens", TextAnalysis.tokenCount(col("text")))
      .withColumn("quality", TextAnalysis.qualityScore(col("text")))
      .withColumn("lang_pred", TextAnalysis.langId(col("text")))
      .withColumn("fingerprint", TextAnalysis.fingerprint(col("text")))

  /** Full ingest flow over a (streaming or batch) documents frame with
    * an event-time column `tsCol`.
    */
  def ingest(docs: DataFrame, tsCol: String,
      config: Config = Config()): DataFrame = {
    val enriched = enrich(docs)
      .filter(col("quality") >= config.minQuality)
    Dedup.streamingExactDedup(enriched, col("fingerprint"), tsCol,
      config.watermarkDelay)
  }
}
