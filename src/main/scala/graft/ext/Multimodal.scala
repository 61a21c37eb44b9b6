package graft.ext

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A media file: opaque bytes + typed metadata. The schema treats
  * image/audio/video content as a `binary` column exactly as a 100 TB
  * multimodal lake would — decode happens inside the engine, never by
  * shipping bytes to the driver.
  */
final case class MediaFile(
    media_id: Long,
    kind: String,
    content: Array[Byte],
    meta: Map[String, String])

/** Extracted per-file features (see [[Multimodal.extractFeatures]]). */
final case class MediaFeatures(
    media_id: Long,
    kind: String,
    n_bytes: Long,
    sha1_hex: String,
    width: Int,
    height: Int,
    byte_histogram: Array[Double])

/** Multimodal-column plumbing: binary content + typed metadata, with
  * decode / feature-extraction running distributed via
  * `Dataset.mapPartitions` over the typed rows — the Scala analogue of
  * a batched pandas-UDF stage: one decoder instantiation per
  * partition, iterator-streamed rows, nothing driver-side.
  *
  * ==Stub boundary==
  * This container has no image/audio codecs, so [[decodeDimensions]]
  * is a clearly-marked DETERMINISTIC STUB (dimensions derived from the
  * leading bytes). Swapping in a real decoder (e.g. `javax.imageio`)
  * changes ONLY that function; the engine-side contract — schema,
  * partition-local batching, feature row shape — is real and tested.
  */
object Multimodal {

  /** Fixture builder: the corpus has no binary table, so the media
    * table is derived from `documents` (utf-8 bytes as content). The
    * plumbing downstream is agnostic to where the bytes came from.
    */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      concat(lit("text/"), col("lang")).as("kind"),
      col("text").cast("binary").as("content"),
      map(lit("source"), col("source"), lit("lang"), col("lang")).as("meta"))

  /** STUB decoder — stands in for an image/audio codec (none in this
    * container). Deterministic: "dimensions" are derived from the
    * first two content bytes, so tests and reruns are stable.
    */
  def decodeDimensions(content: Array[Byte]): (Int, Int) = {
    val w = if (content.isEmpty) 0 else (content(0) & 0xff) + 1
    val h = if (content.length < 2) 0 else (content(1) & 0xff) + 1
    (w, h)
  }

  /** 16-bin normalized byte-value histogram — a real, lib-free feature
    * (the stand-in for embedding/spectrogram extraction).
    */
  def byteHistogram(content: Array[Byte]): Array[Double] = {
    val bins = new Array[Double](16)
    if (content.isEmpty) bins
    else {
      content.foreach(b => bins((b & 0xff) / 16) += 1.0)
      bins.map(_ / content.length)
    }
  }

  /** Distributed feature extraction. `mapPartitions` so per-partition
    * setup (here the digest; in a real decoder, codec contexts) is
    * paid once per partition, not per row — the batched-UDF execution
    * shape.
    */
  def extractFeatures(media: Dataset[MediaFile]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val digest = MessageDigest.getInstance("SHA-1")
      rows.map { m =>
        digest.reset()
        val sha = digest.digest(m.content).map(b => f"$b%02x").mkString
        val (w, h) = decodeDimensions(m.content)
        MediaFeatures(m.media_id, m.kind, m.content.length.toLong, sha, w, h,
          byteHistogram(m.content))
      }
    }
  }

  /** Typed media dataset from the documents fixture. */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaFile] = {
    import spark.implicits._
    fromDocuments(docs).as[MediaFile]
  }
}
