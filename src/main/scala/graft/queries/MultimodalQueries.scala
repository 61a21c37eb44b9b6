package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.Multimodal

/** Multimodal-column query surface (brief item: binary content +
  * typed metadata). The media fixture derives from `documents` (utf-8
  * bytes); the plumbing is byte-agnostic.
  */
object MultimodalQueries {

  private def media(s: SparkSession, d: String): DataFrame =
    Multimodal.fromDocuments(graft.sources.Tables.table(s, d, "documents"))

  val all: Seq[QueryDef] = Seq(

    // ----- binary-column metadata: byte length + content prefix,
    // grouped by media kind (oracle: DuckDB blob functions)
    QueryDef(
      "m1_binary_meta",
      (s, d) => media(s, d)
        .select(col("media_id"), col("kind"),
          octet_length(col("content")).cast("long").as("n_bytes"),
          lower(hex(substring(col("content"), 1, 4))).as("prefix_hex"))
        .filter(col("media_id") < 50)
        .orderBy("media_id"),
      // prefix is BYTE-sliced on both sides (substr(hex(blob),1,8) =
      // first 4 bytes) — a character-sliced oracle would diverge on
      // any multibyte text
      Some("""SELECT doc_id AS media_id, 'text/' || lang AS kind,
             |CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             |lower(substr(hex(encode(text)), 1, 8)) AS prefix_hex
             |FROM documents WHERE doc_id < 50 ORDER BY media_id""".stripMargin)),

    // ----- distributed decode/feature extraction via mapPartitions.
    // Every 5th row is a REAL synthetic PNG decoded with javax.imageio
    // (true width/height); text rows use the deterministic stub dims
    // (audio/video codecs stay stubbed — absent in this container).
    // Histogram math / PNG encoder bytes are not SQL-mirrorable →
    // rows-only check + MultimodalSpec.
    QueryDef(
      "m2_media_features",
      (s, d) => {
        val feats = Multimodal.extractFeatures(
          Multimodal.mediaWithImages(s, graft.sources.Tables.table(s, d, "documents")))
        feats.toDF()
          .select(col("media_id"), col("kind"), col("n_bytes"),
            col("sha1_hex"), col("width"), col("height"),
            round(element_at(col("byte_histogram"), 7), 6).as("hist_bin6"))
          .orderBy("media_id")
      },
      None),
  )
}
