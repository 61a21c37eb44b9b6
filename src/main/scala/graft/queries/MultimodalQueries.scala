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
    // Every 5th row is a REAL synthetic image (format cycling through
    // the four JDK codecs) decoded with javax.imageio; text rows use
    // the deterministic stub dims (audio/video codecs stay stubbed —
    // absent in this container). Hash-verified end-to-end: the oracle
    // re-derives image dimensions from the fixture generator's
    // arithmetic (so decode(encode(w,h)) == (w,h) is checked
    // cross-engine, per codec) and text stub dims from the first two
    // utf-8 BYTES via hex arithmetic. Encoder byte counts aren't
    // portable → images report n_bytes = -1 on both sides; sha1/
    // histogram stay covered by MultimodalSpec (not SQL-mirrorable).
    QueryDef(
      "m2_media_features",
      (s, d) => {
        val feats = Multimodal.extractFeatures(
          Multimodal.mediaWithImages(s, graft.sources.Tables.table(s, d, "documents")))
        feats.toDF()
          .select(col("media_id"), col("kind"),
            when(col("kind").startsWith("image/"), lit(-1L))
              .otherwise(col("n_bytes")).as("n_bytes"),
            col("width"), col("height"))
          .orderBy("media_id")
      },
      // hex-nibble byte extraction: DuckDB has no blob[i] → int, so
      // byte k of encode(text) is parsed from hex chars 2k+1, 2k+2
      Some("""WITH hx AS (
             |  SELECT doc_id, lang, hex(encode(text)) AS h,
             |    octet_length(encode(text)) AS nb
             |  FROM documents),
             |b AS (
             |  SELECT doc_id, lang, nb,
             |    (strpos('0123456789ABCDEF', h[1]) - 1) * 16
             |      + strpos('0123456789ABCDEF', h[2]) - 1 AS byte0,
             |    (strpos('0123456789ABCDEF', h[3]) - 1) * 16
             |      + strpos('0123456789ABCDEF', h[4]) - 1 AS byte1
             |  FROM hx)
             |SELECT doc_id AS media_id,
             |  CASE WHEN doc_id % 5 = 0
             |    THEN 'image/' || ['png','jpeg','bmp','gif'][CAST((doc_id // 5) % 4 AS INT) + 1]
             |    ELSE 'text/' || lang END AS kind,
             |  CAST(CASE WHEN doc_id % 5 = 0 THEN -1 ELSE nb END AS BIGINT) AS n_bytes,
             |  CAST(CASE WHEN doc_id % 5 = 0 THEN 3 + doc_id % 14
             |    WHEN nb = 0 THEN 0 ELSE byte0 + 1 END AS INT) AS width,
             |  CAST(CASE WHEN doc_id % 5 = 0 THEN 5 + doc_id % 9
             |    WHEN nb < 2 THEN 0 ELSE byte1 + 1 END AS INT) AS height
             |FROM b ORDER BY media_id""".stripMargin)),

    // ----- REAL audio decode (round-5 verdict item 8, upgraded): the
    // JDK's javax.sound.sampled parses RIFF/WAVE pure-JVM, so the
    // audio boundary is no longer a stub. Every 3rd doc becomes a
    // deterministic synthetic WAV (rate/channels/frames derived from
    // the id, samples from integer arithmetic); the engine decodes the
    // BYTES (format + PCM) distributed via mapPartitions. The oracle
    // re-derives every feature from the generator arithmetic — so
    // decode(encode(rate, ch, frames, samples)) == identity is checked
    // cross-engine, with energy = Σ sample² an exact integer sum
    // regenerated per sample by a lateral generate_series.
    QueryDef(
      "m4_audio_features",
      (s, d) => Multimodal.extractAudioFeatures(
          Multimodal.mediaWithAudio(s, graft.sources.Tables.table(s, d, "documents")))
        .toDF()
        .orderBy("media_id"),
      Some("""WITH a AS (
             |  SELECT doc_id AS media_id,
             |    [8000,16000,22050,44100][CAST(doc_id % 4 AS INT) + 1] AS sample_rate,
             |    CAST(1 + doc_id % 2 AS INT) AS channels,
             |    200 + doc_id % 800 AS n_frames
             |  FROM documents WHERE doc_id % 3 = 0),
             |s AS (
             |  SELECT media_id, sample_rate, channels, n_frames,
             |    unnest(range(0, n_frames * channels)) AS j
             |  FROM a)
             |SELECT media_id,
             |  CAST(sample_rate AS INT) AS sample_rate,
             |  channels,
             |  CAST(n_frames AS BIGINT) AS n_frames,
             |  CAST(n_frames * 1000 // sample_rate AS BIGINT) AS duration_ms,
             |  CAST(sum(
             |    (((media_id * 1103515 + j * 40503) & 32767) - 16384)
             |    * (((media_id * 1103515 + j * 40503) & 32767) - 16384)) AS BIGINT) AS energy
             |FROM s
             |GROUP BY 1, 2, 3, 4, 5
             |ORDER BY media_id""".stripMargin)),

    // ----- pixel-level dedup across CONTAINERS: the same picture
    // arrives as .png for one media_id and .bmp for another —
    // different bytes, so m1's byte/sha dedup is structurally blind
    // to it. The engine decodes the pixels for REAL (JDK ImageIO,
    // lossless codecs only — the scaladoc on losslessImageFormats
    // explains why JPEG/GIF can't be pixel-mirrored), computes
    // integer pixel fingerprints (gray-sum + position-weighted
    // gray-hash, exact longs), and groups identical (w, h, sum, hash)
    // into duplicate classes; n_formats ≥ 2 rows are the cross-codec
    // catches. The oracle never decodes an image — it re-derives every
    // pixel from the generator arithmetic via a lateral range(w)×
    // range(h), so decode(encode(pixels)) == identity is checked
    // cross-engine per pixel. Scale: decode is mapPartitions at the
    // codec boundary (the batched-UDF shape), the dedup is one
    // uniform-key groupBy on the fingerprint — the m1 exact-dedup
    // physics one level below the container.
    QueryDef(
      "m5_image_pixel_dedup",
      (s, d) => {
        val feats = Multimodal.extractPixelFeatures(
          Multimodal.mediaWithLosslessImages(s, graft.sources.Tables.table(s, d, "documents")))
        feats.toDF()
          .groupBy("width", "height", "pix_sum", "pix_hash")
          .agg(count(lit(1)).as("n_copies"),
            countDistinct(col("kind")).as("n_formats"),
            min("media_id").as("first_media_id"))
          .filter(col("n_copies") >= 2)
          .orderBy("first_media_id")
      },
      Some("""WITH imgs AS (
             |  SELECT doc_id AS media_id, doc_id % 45 AS seed,
             |    ['png','bmp'][CAST((doc_id // 5) % 2 AS INT) + 1] AS fmt
             |  FROM documents WHERE doc_id % 5 = 0),
             |geo AS (
             |  SELECT media_id, seed, fmt,
             |    CAST(3 + seed % 14 AS INT) AS w, CAST(5 + seed % 9 AS INT) AS h
             |  FROM imgs),
             |px AS (
             |  SELECT media_id, fmt, w, h, x.x, y.y,
             |    (seed * 1103515245 + x.x * 12345 + y.y * 1013904223) & 16777215 AS v
             |  FROM geo,
             |    LATERAL (SELECT unnest(range(0, w)) AS x) x,
             |    LATERAL (SELECT unnest(range(0, h)) AS y) y),
             |f AS (
             |  SELECT media_id, fmt, w, h,
             |    CAST(sum((((v >> 16) & 255) + ((v >> 8) & 255) + (v & 255)) // 3) AS BIGINT) AS pix_sum,
             |    CAST(sum(((((v >> 16) & 255) + ((v >> 8) & 255) + (v & 255)) // 3)
             |      * (1 + y * w + x)) AS BIGINT) AS pix_hash
             |  FROM px GROUP BY 1, 2, 3, 4)
             |SELECT w AS width, h AS height, pix_sum, pix_hash,
             |  count(*) AS n_copies,
             |  CAST(count(DISTINCT fmt) AS BIGINT) AS n_formats,
             |  CAST(min(media_id) AS BIGINT) AS first_media_id
             |FROM f GROUP BY 1, 2, 3, 4
             |HAVING count(*) >= 2
             |ORDER BY first_media_id""".stripMargin)),

    // ----- VIDEO, closing the last modality (round-6 verdict item 6):
    // every 7th doc becomes a REAL RIFF/AVI (syntheticAvi — headers +
    // movi + idx1, a well-formed file), demuxed by a pure-JVM RIFF
    // walker (demuxAvi — E105's WAV container family, one level up),
    // frame-sampled every 2nd frame, each frame decoded: DIB frames
    // by direct pixel-layout interpretation (lossless ⇒ the oracle
    // re-derives every pixel from generator arithmetic, m5's
    // discipline), MJPG frames by the REAL JDK ImageIO JPEG decoder
    // (m2's path) — lossy, so their pixel fingerprints carry the
    // documented −1 sentinel while (width, height) still come from
    // the actual decode and must match the generator's geometry.
    // Scale: demux+decode is mapPartitions at the codec boundary (the
    // batched-UDF shape); everything after is per-row arithmetic.
    QueryDef(
      "m6_video_frames",
      (s, d) => Multimodal.extractVideoFrames(
          Multimodal.mediaWithVideos(s, graft.sources.Tables.table(s, d, "documents")),
          stride = 2)
        .toDF()
        .orderBy("media_id", "frame_idx"),
      Some("""WITH v AS (
             |  SELECT doc_id AS media_id,
             |    CASE WHEN (doc_id // 7) % 2 = 0 THEN 'dib' ELSE 'mjpg' END AS codec,
             |    CAST(4 + doc_id % 9 AS INT) AS w,
             |    CAST(3 + doc_id % 6 AS INT) AS h,
             |    3 + doc_id % 5 AS n_frames
             |  FROM documents WHERE doc_id % 7 = 0),
             |fr AS (
             |  SELECT media_id, codec, w, h, CAST(f.f AS INT) AS frame_idx,
             |    media_id * 31 + f.f AS fseed
             |  FROM v, LATERAL (SELECT unnest(range(0, n_frames, 2)) AS f) f),
             |px AS (
             |  SELECT media_id, codec, frame_idx, w, h, x.x, y.y,
             |    (fseed * 1103515245 + x.x * 12345 + y.y * 1013904223) & 16777215 AS v
             |  FROM fr,
             |    LATERAL (SELECT unnest(range(0, w)) AS x) x,
             |    LATERAL (SELECT unnest(range(0, h)) AS y) y),
             |f AS (
             |  SELECT media_id, codec, frame_idx, w, h,
             |    CAST(sum((((v >> 16) & 255) + ((v >> 8) & 255) + (v & 255)) // 3) AS BIGINT) AS ps,
             |    CAST(sum(((((v >> 16) & 255) + ((v >> 8) & 255) + (v & 255)) // 3)
             |      * (1 + y * w + x)) AS BIGINT) AS ph
             |  FROM px GROUP BY 1, 2, 3, 4, 5)
             |SELECT media_id, frame_idx, codec, w AS width, h AS height,
             |  CASE WHEN codec = 'mjpg' THEN -1 ELSE ps END AS pix_sum,
             |  CASE WHEN codec = 'mjpg' THEN -1 ELSE ph END AS pix_hash
             |FROM f ORDER BY media_id, frame_idx""".stripMargin)),

    // ----- Frame-level audio DSP features (m4 is the per-FILE grain;
    // speech/music preprocessing — silence trimming, voice activity,
    // loudness normalization — consumes short WINDOWS): 256-frame
    // blocks with exact-long energy Σs² and PER-CHANNEL zero-crossing
    // counts (comparing interleaved neighbors would mix channels;
    // block-boundary crossings excluded so each block is a pure
    // function of its own samples; sign pinned as s < 0). The engine
    // decodes the REAL WAV bytes (javax.sound.sampled) and frames in
    // the typed flatMap; the oracle never decodes — it regenerates
    // every sample from the generator arithmetic via a lateral range
    // and replays the same blocking/crossing definitions, so
    // decode(encode(samples)) == identity is checked PER BLOCK.
    QueryDef(
      "m7_audio_frame_energy",
      (s, d) => Multimodal.extractAudioFrameFeatures(
          Multimodal.mediaWithAudio(s, graft.sources.Tables.table(s, d, "documents")))
        .toDF()
        .orderBy("media_id", "block"),
      Some("""WITH a AS (
             |  SELECT doc_id AS media_id,
             |    CAST(1 + doc_id % 2 AS BIGINT) AS channels,
             |    200 + doc_id % 800 AS n_frames
             |  FROM documents WHERE doc_id % 3 = 0),
             |s AS (
             |  SELECT media_id, channels,
             |    unnest(range(0, n_frames * channels)) AS j
             |  FROM a),
             |v AS (SELECT media_id, channels, j,
             |    (j // channels) AS f,
             |    (j // channels) // 256 AS k,
             |    ((media_id * 1103515 + j * 40503) & 32767) - 16384 AS sv,
             |    ((media_id * 1103515 + (j - channels) * 40503) & 32767) - 16384
             |      AS pv
             |  FROM s)
             |SELECT media_id, CAST(k AS BIGINT) AS block,
             |  CAST(count(*) // channels AS BIGINT) AS n_frames,
             |  CAST(sum(sv * sv) AS BIGINT) AS energy,
             |  CAST(sum(CASE WHEN f % 256 <> 0 AND (sv < 0) <> (pv < 0)
             |    THEN 1 ELSE 0 END) AS BIGINT) AS crossings
             |FROM v GROUP BY media_id, k, channels
             |ORDER BY media_id, block""".stripMargin)),

    // ----- PERCEPTUAL image dedup via difference hash (the near-dup
    // analog of m5's exact pixel dedup: a uniform brightness shift
    // changes every byte and every exact fingerprint, but pixel
    // GRADIENTS survive wherever no channel clamps — dHash keys on
    // the gradient SEQUENCE, so shifted re-exports land in the same
    // class as their originals). Fixture plants both duplicate kinds:
    // cross-codec clones (png/bmp, same seed) AND +8-brightness
    // variants; the engine decodes REAL bytes, the oracle regenerates
    // every pixel (shift + clamp replayed as least(ch+8, 255)) and
    // folds the same row-major bit polynomial — classes where
    // n_shifted ≥ 1 < n_copies are the catches m5 cannot make.
    // Clamp-flipped bits break a shifted variant's match — real,
    // deterministic, replayed identically by both engines.
    QueryDef(
      "m8_image_dhash",
      (s, d) => {
        val feats = Multimodal.extractDHash(
          Multimodal.mediaWithShiftedImages(s, graft.sources.Tables.table(s, d, "documents")))
        feats.toDF()
          .groupBy("width", "height", "dhash")
          .agg(count(lit(1)).as("n_copies"),
            countDistinct(col("kind")).as("n_formats"),
            sum(col("shifted").cast("long")).as("n_shifted"),
            min("media_id").as("first_media_id"))
          .filter(col("n_copies") >= 2)
          .orderBy("first_media_id")
      },
      Some {
        def gray(xExpr: String): String = {
          val v = s"((seed*1103515245 + ($xExpr)*12345 + (i // (w-1))*1013904223) & 16777215)"
          s"((least((($v >> 16) & 255) + shift, 255) + " +
            s"least((($v >> 8) & 255) + shift, 255) + " +
            s"least(($v & 255) + shift, 255)) // 3)"
        }
        s"""WITH imgs AS (
           |  SELECT doc_id AS media_id,
           |    ['png','bmp'][CAST((doc_id // 5) % 2 AS INT) + 1] AS fmt,
           |    doc_id % 45 AS seed,
           |    CASE WHEN (doc_id // 5) % 5 = 0 THEN 8 ELSE 0 END AS shift
           |  FROM documents WHERE doc_id % 5 = 0),
           |geo AS (SELECT media_id, fmt, seed, shift,
           |    3 + CAST(seed % 14 AS INT) AS w, 5 + CAST(seed % 9 AS INT) AS h
           |  FROM imgs),
           |dh AS (SELECT media_id, fmt, w, h, shift,
           |    list_reduce(list_prepend(CAST(0 AS BIGINT),
           |      list_transform(range(0, h * (w - 1)), i ->
           |        CASE WHEN ${gray("(i % (w-1)) + 1")} > ${gray("i % (w-1)")}
           |        THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END)),
           |      (acc, b) -> (acc * 2 + b) % 1000000007) AS dhash
           |  FROM geo)
           |SELECT w AS width, h AS height, dhash,
           |  count(*) AS n_copies,
           |  CAST(count(DISTINCT fmt) AS BIGINT) AS n_formats,
           |  CAST(sum(CASE WHEN shift > 0 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_shifted,
           |  CAST(min(media_id) AS BIGINT) AS first_media_id
           |FROM dh GROUP BY 1, 2, 3
           |HAVING count(*) >= 2
           |ORDER BY first_media_id""".stripMargin
      }),

    // ----- Scene-cut (keyframe) detection over demuxed DIB video
    // (the first video ANALYTICS op above m6's per-frame features:
    // consecutive-frame gray delta Σ|gray_f − gray_{f−1}|, exact
    // longs — within a scene the delta is exactly 0, at a boundary
    // it jumps; the scene fixture groups frames into 4-frame scenes
    // so the cut pattern f ≡ 0 (mod 4) is the verifiable ground
    // truth). Engine demuxes and decodes the REAL AVI bytes holding
    // frames pairwise; the oracle regenerates both frames of every
    // pair from the generator arithmetic (fs = seed·31 + f div 4)
    // and replays the same per-pixel |Δgray| sum — so
    // demux+decode+difference == identity is checked per pair.
    QueryDef(
      "m9_video_keyframes",
      (s, d) => Multimodal.extractFrameDeltas(
          Multimodal.mediaWithSceneVideos(s, graft.sources.Tables.table(s, d, "documents")))
        .toDF()
        .orderBy("media_id", "frame_idx"),
      Some {
        def gray(fsExpr: String): String = {
          val v = s"(($fsExpr) * 1103515245 + x.x * 12345 + y.y * 1013904223) & 16777215"
          s"(((($v) >> 16) & 255) + ((($v) >> 8) & 255) + (($v) & 255)) // 3"
        }
        s"""WITH v AS (
           |  SELECT doc_id AS media_id,
           |    4 + CAST(doc_id % 9 AS INT) AS w,
           |    3 + CAST(doc_id % 6 AS INT) AS h,
           |    8 + CAST(doc_id % 9 AS INT) AS nf
           |  FROM documents WHERE doc_id % 7 = 0),
           |fr AS (SELECT media_id, w, h, f.f AS f,
           |    media_id * 31 + f.f // 4 AS fsc,
           |    media_id * 31 + (f.f - 1) // 4 AS fsp
           |  FROM v, LATERAL (SELECT unnest(range(1, nf)) AS f) f),
           |px AS (SELECT media_id, f,
           |    abs((${gray("fsc")}) - (${gray("fsp")})) AS dg
           |  FROM fr,
           |    LATERAL (SELECT unnest(range(0, w)) AS x) x,
           |    LATERAL (SELECT unnest(range(0, h)) AS y) y),
           |d AS (SELECT media_id, f, CAST(sum(dg) AS BIGINT) AS delta
           |  FROM px GROUP BY 1, 2)
           |SELECT media_id, CAST(f AS INT) AS frame_idx, delta,
           |  CAST(CASE WHEN delta > 0 THEN 1 ELSE 0 END AS INT) AS is_cut
           |FROM d ORDER BY media_id, frame_idx""".stripMargin
      }),
    // ----- Generic byte-slice frame sampler, ORACLE-GATED (closing
    // SURVEY E24b's long-standing "spec-only" partial: the fallback
    // path for containers without a demuxer treats content as
    // nFrames equal byte slices and samples every stride-th — the
    // slicing arithmetic, empty-tail clamping, and distributed
    // mapPartitions shape are exactly what a real codec would plug
    // into, and THIS query hash-gates all of it cross-engine: the
    // DuckDB mirror re-slices the same utf-8 bytes in HEX space
    // (substr over blobs is not portable; substr over hex(blob) is
    // the m1 byte-safe idiom) and re-derives each frame's byte sum
    // nibble-by-nibble). nFrames = 10, stride = 3 → frames 0/3/6/9;
    // per frame (len, byte_sum) exact integers.
    QueryDef(
      "m10_byteslice_frames",
      (s, d) => {
        import s.implicits._
        val m = Multimodal
          .fromDocuments(graft.sources.Tables.table(s, d, "documents"))
          .filter(col("media_id") < 60)
          .select(col("media_id"), col("content"))
          .as[(Long, Array[Byte])]
        m.flatMap { case (id, c) =>
            Multimodal.frameSample(c, nFrames = 10, stride = 3)
              .map { case (idx, bytes) =>
                (id, idx.toLong, bytes.length.toLong,
                  bytes.foldLeft(0L)((a, b) => a + (b & 0xff)))
              }
          }
          .toDF("media_id", "frame_idx", "frame_len", "byte_sum")
          .orderBy("media_id", "frame_idx")
      },
      Some("""WITH m AS (SELECT doc_id AS media_id,
             |    upper(hex(encode(text))) AS hx,
             |    CAST(octet_length(encode(text)) AS BIGINT) AS n
             |  FROM documents WHERE doc_id < 60),
             |fr AS (SELECT media_id, hx, n, greatest(1, n // 10) AS flen,
             |    unnest([0, 3, 6, 9]) AS idx FROM m),
             |sl AS (SELECT media_id, CAST(idx AS BIGINT) AS frame_idx,
             |    greatest(0, least(n, idx * flen + flen) - idx * flen)
             |      AS take,
             |    string_split(substr(hx, 2 * idx * flen + 1,
             |      2 * greatest(0, least(n, idx * flen + flen)
             |        - idx * flen)), '') AS h
             |  FROM fr)
             |SELECT media_id, frame_idx, CAST(take AS BIGINT) AS frame_len,
             |  CAST(CASE WHEN take = 0 THEN 0 ELSE list_sum(
             |    [(strpos('0123456789ABCDEF', h[j]) - 1)
             |      * (CASE WHEN j % 2 = 1 THEN 16 ELSE 1 END)
             |     for j in range(1, len(h) + 1)]) END AS BIGINT) AS byte_sum
             |FROM sl ORDER BY media_id, frame_idx""".stripMargin)),

    // ----- Byte-ENTROPY profile of the media blobs — the
    // compressed-vs-raw detector every media-ingest gate runs first
    // (already-compressed payloads shouldn't be recompressed or
    // near-dup'd byte-wise; a "video" whose byte entropy sits at
    // text level is mislabeled — this corpus's fake media ARE text
    // bytes, and the ~4.2-nat reading says so, which is the gate
    // working): per-blob byte HISTOGRAM (≤256 rows/blob — the grid
    // collapse), Shannon entropy in the a25 algebraic form H =
    // ln n − (Σ c·ln c)/n so every log argument is an exact integer
    // (tx30's ln precedent, 6-dp pin), and the ≤256-term Σ c·ln c
    // folds over a byte-ORDERED packed list (the a62 discipline —
    // doubles never sum through a hash shuffle). Byte extraction is
    // the m10 idiom pair: typed flatMap over Array[Byte] on the
    // Spark side, hex-digit parsing in the mirror.
    QueryDef(
      "m11_byte_entropy",
      (s, d) => {
        import s.implicits._
        val m = Multimodal
          .fromDocuments(graft.sources.Tables.table(s, d, "documents"))
          .filter(col("media_id") < 60)
          .select(col("media_id"), col("content"))
          .as[(Long, Array[Byte])]
        val bytes = m.flatMap { case (id, c) =>
          c.map(b => (id, (b & 0xff).toLong))
        }.toDF("media_id", "byte")
        val hist = bytes.groupBy("media_id", "byte")
          .agg(count(lit(1)).as("c"))
        hist.groupBy("media_id")
          .agg(sum("c").as("n_bytes"), count(lit(1)).as("n_distinct"),
            aggregate(
              sort_array(collect_list(struct(col("byte"), col("c")))),
              lit(0.0d), (acc, e) => acc + e.getField("c").cast("double")
                * log(e.getField("c").cast("double"))).as("sl"))
          .select(col("media_id"), col("n_bytes"), col("n_distinct"),
            round(log(col("n_bytes").cast("double"))
              - col("sl") / col("n_bytes").cast("double"), 6)
              .as("entropy_nats"))
          .orderBy("media_id")
      },
      Some("""WITH m AS (SELECT doc_id AS media_id,
             |    upper(hex(encode(text))) AS hx,
             |    CAST(octet_length(encode(text)) AS BIGINT) AS n
             |  FROM documents WHERE doc_id < 60),
             |j AS (SELECT media_id, hx,
             |    unnest(generate_series(1, n)) AS j FROM m),
             |b AS (SELECT media_id,
             |    (strpos('0123456789ABCDEF', substr(hx, 2*j - 1, 1)) - 1)
             |      * 16
             |    + (strpos('0123456789ABCDEF', substr(hx, 2*j, 1)) - 1)
             |      AS byte
             |  FROM j),
             |h AS (SELECT media_id, byte, CAST(count(*) AS BIGINT) AS c
             |  FROM b GROUP BY 1, 2),
             |e AS (SELECT media_id, CAST(sum(c) AS BIGINT) AS n_bytes,
             |    CAST(count(*) AS BIGINT) AS n_distinct,
             |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
             |      list(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))
             |        ORDER BY byte)), (x, y) -> x + y) AS sl
             |  FROM h GROUP BY 1)
             |SELECT media_id, n_bytes, n_distinct,
             |  round(ln(CAST(n_bytes AS DOUBLE))
             |    - sl / CAST(n_bytes AS DOUBLE), 6) AS entropy_nats
             |FROM e ORDER BY media_id""".stripMargin)),

    // ----- Below-mean-energy RUN segmentation per clip — the
    // voice-activity-detection shape on m7's block energies: a
    // threshold detector flags blocks point-wise; the product a
    // trimming/segmenting pipeline needs is RUNS — contiguous
    // low-energy stretches (the candidate cut points / silence-ish
    // spans). Threshold = the clip's own mean block energy, compared
    // as the exact integer cross-product energy·n_blocks <
    // total_energy (no division); runs via the block − row_number
    // island key per clip (lock-clean). Decode happens ONCE in the
    // same mapPartitions boundary as m7; everything after is
    // metadata-sized (blocks, not samples). Output: per clip the
    // segment count, longest run, and total low blocks.
    QueryDef(
      "m12_energy_dips",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("media_id").orderBy("block")
        val fr = Multimodal.extractAudioFrameFeatures(
          Multimodal.mediaWithAudio(s,
            graft.sources.Tables.table(s, d, "documents"))).toDF()
        val tot = fr.groupBy("media_id")
          .agg(count(lit(1)).as("nb"), sum("energy").as("te"))
        fr.join(tot, Seq("media_id"))
          .filter(col("energy") * col("nb") < col("te"))
          .withColumn("isl", col("block") - row_number().over(w))
          .groupBy("media_id", "isl")
          .agg(count(lit(1)).as("len"))
          .groupBy("media_id")
          .agg(count(lit(1)).as("n_segments"), max("len").as("longest"),
            sum("len").as("low_blocks"))
          .orderBy("media_id")
      },
      Some("""WITH a AS (
             |  SELECT doc_id AS media_id,
             |    CAST(1 + doc_id % 2 AS BIGINT) AS channels,
             |    200 + doc_id % 800 AS n_frames
             |  FROM documents WHERE doc_id % 3 = 0),
             |s AS (
             |  SELECT media_id, channels,
             |    unnest(range(0, n_frames * channels)) AS j
             |  FROM a),
             |v AS (SELECT media_id, channels, j,
             |    (j // channels) // 256 AS k,
             |    ((media_id * 1103515 + j * 40503) & 32767) - 16384 AS sv
             |  FROM s),
             |blk AS (SELECT media_id, CAST(k AS BIGINT) AS block,
             |    CAST(sum(sv * sv) AS BIGINT) AS energy
             |  FROM v GROUP BY media_id, k, channels),
             |tot AS (SELECT media_id, count(*)::BIGINT AS nb,
             |    sum(energy)::BIGINT AS te FROM blk GROUP BY 1),
             |low AS (SELECT b.media_id, b.block
             |  FROM blk b JOIN tot USING (media_id)
             |  WHERE b.energy * tot.nb < tot.te),
             |isl AS (SELECT media_id, block,
             |    block - row_number() OVER (PARTITION BY media_id
             |      ORDER BY block) AS isl
             |  FROM low),
             |seg AS (SELECT media_id, isl, count(*)::BIGINT AS len
             |  FROM isl GROUP BY 1, 2)
             |SELECT media_id, count(*)::BIGINT AS n_segments,
             |  max(len)::BIGINT AS longest, sum(len)::BIGINT AS low_blocks
             |FROM seg GROUP BY 1 ORDER BY media_id""".stripMargin)),
  )
}

