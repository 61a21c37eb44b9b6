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

  /** STUB resize — stands in for an image scaler (no codecs in this
    * container): deterministic byte subsampling to `targetBytes`
    * (every ceil(n/target)-th byte). A real implementation swaps the
    * body; the distributed shape (mapPartitions over typed rows,
    * metadata updated alongside content) is what the engine owns.
    */
  def resizeStub(content: Array[Byte], targetBytes: Int): Array[Byte] =
    if (content.length <= targetBytes) content
    else {
      val step = math.ceil(content.length.toDouble / targetBytes).toInt
      content.indices.collect { case i if i % step == 0 => content(i) }.toArray
    }

  /** STUB frame sampling — stands in for video frame extraction:
    * content is treated as `nFrames` equal-length frames; every
    * `stride`-th frame index is selected and its byte slice returned.
    * The index arithmetic and slice plumbing are real; only the
    * "decode" (slicing instead of an actual demuxer) is fake.
    */
  def frameSample(content: Array[Byte], nFrames: Int, stride: Int): Seq[(Int, Array[Byte])] = {
    if (nFrames <= 0 || content.isEmpty) Seq.empty
    else {
      val frameLen = math.max(1, content.length / nFrames)
      (0 until nFrames by stride).map { idx =>
        val from = idx * frameLen
        val until = math.min(content.length, from + frameLen)
        idx -> content.slice(from, math.max(from, until))
      }
    }
  }

  /** Distributed resize + frame-sample pass (one fused mapPartitions,
    * the per-partition-setup batch shape as extractFeatures).
    */
  def transcode(media: Dataset[MediaFile], targetBytes: Int,
      nFrames: Int, stride: Int): Dataset[(Long, Int, Int, Int)] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val resized = resizeStub(m.content, targetBytes)
        val frames = frameSample(m.content, nFrames, stride)
        (m.media_id, resized.length, frames.length, frames.map(_._2.length).sum)
      }
    }
  }
}
