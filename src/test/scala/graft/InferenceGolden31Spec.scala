package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Published-value micro-goldens, part 31 — the deterministic-
  * generator media tail (round-13 verdict ask 3's third named
  * family). The oracle mirrors re-derive these from the generator
  * ARITHMETIC, which shares its formulas with the fixture builder —
  * exactly the cross-derivation blind spot. Each anchor here is an
  * independent plain-Scala replay from the published definition,
  * driven through the REAL codec path on the engine side:
  *
  *  - m7: per-block energy Σs² and per-channel zero crossings
  *    replayed imperatively from the PCM sample definition (the
  *    engine decodes real RIFF/WAVE bytes; the replay never sees
  *    them) — including the 257-frame clip whose second block holds
  *    ONE frame, and the block-boundary crossing exclusion.
  *  - m12: threshold/island segmentation replayed imperatively over
  *    the same block energies; the single-block clip pins the strict
  *    inequality (a clip is never below its own mean).
  *  - m8: the dHash bit fold replayed from pixel arithmetic
  *    (clamped brightness shift included), plus the cross-codec
  *    theorem: lossless PNG and BMP encodes of the SAME pixels must
  *    decode to one dhash class.
  *  - m10: byte-slice frame sampling hand-derived on ASCII strings —
  *    slice boundaries, the max(1, n/10) frame length, and the
  *    empty-tail clamp at exact values.
  */
@graft.Golden
class InferenceGolden31Spec extends SparkSpec {

  private def fixture(name: String, ids: Seq[Long],
      text: Long => String = id => s"doc $id filler text"): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory(s"golden31_$name").toString
    ids.map(id => (id, text(id), "en", "web", text(id).length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def run(q: String, dir: String): Array[Row] =
    try SparkEntry.queries(q)(spark, dir).collect()
    finally spark.catalog.clearCache()

  // ----- the PCM sample definition (Multimodal.sampleValue) replayed
  private def sv(id: Long, j: Long): Long =
    ((id * 1103515L + j * 40503L) & 0x7fffL) - 16384L

  /** (media_id, block) -> (n_frames, energy, crossings) replayed
    * imperatively from the definition: 256-frame blocks, energy over
    * every interleaved sample, crossings per channel with the
    * block-boundary frame excluded, sign pinned as s < 0.
    */
  private def audioBlocksReplay(id: Long): Map[(Long, Long), (Long, Long, Long)] = {
    val channels = 1 + (id % 2).toInt
    val nFrames = 200 + (id % 800).toInt
    val out = scala.collection.mutable.Map.empty[(Long, Long), (Long, Long, Long)]
    for (j <- 0L until (nFrames.toLong * channels)) {
      val f = j / channels
      val k = f / 256L
      val s = sv(id, j)
      val crossing =
        if (f % 256L != 0L && (s < 0L) != (sv(id, j - channels) < 0L)) 1L else 0L
      val (nf, en, cr) = out.getOrElse((id, k), (0L, 0L, 0L))
      // n_frames counts interleaved samples / channels (exact because
      // every frame contributes `channels` samples to its own block)
      out((id, k)) = (nf + 1L, en + s * s, cr + crossing)
    }
    out.map { case (key, (nSamples, en, cr)) =>
      key -> (nSamples / channels, en, cr)
    }.toMap
  }

  test("m7_audio_frame_energy == the imperative PCM replay, including " +
      "the 257-frame clip whose last block holds exactly one frame") {
    // doc_id % 3 == 0 becomes audio; 57 → n_frames 257 (two blocks),
    // 3 → 203 frames stereo, 6 → 206 frames mono
    val out = run("m7_audio_frame_energy", fixture("m7", Seq(3L, 6L, 57L)))
      .map(r => (r.getAs[Long]("media_id"), r.getAs[Long]("block")) ->
        (r.getAs[Long]("n_frames"), r.getAs[Long]("energy"),
          r.getAs[Long]("crossings"))).toMap
    val expected = Seq(3L, 6L, 57L).flatMap(audioBlocksReplay).toMap
    assert(out == expected)
    // the boundary shape asserted explicitly: 57 has 257 frames
    assert(out((57L, 1L))._1 == 1L)
    assert(out((57L, 1L))._3 == 0L) // f=256 is a block boundary: no crossing
  }

  test("m12_energy_dips == the imperative threshold/island replay; a " +
      "single-block clip is never below its own mean (strict <)") {
    // 600 → 800 frames mono → blocks of 256/256/256/32; 3 → one block
    val out = run("m12_energy_dips", fixture("m12", Seq(3L, 600L)))
      .map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Long]("n_segments"), r.getAs[Long]("longest"),
          r.getAs[Long]("low_blocks"))).toMap
    def replay(id: Long): Option[(Long, Long, Long)] = {
      val blocks = audioBlocksReplay(id).toSeq
        .map { case ((_, k), (_, en, _)) => (k, en) }.sortBy(_._1)
      val nb = blocks.size.toLong
      val te = blocks.map(_._2).sum
      val low = blocks.collect { case (k, en) if en * nb < te => k }
      if (low.isEmpty) None
      else {
        val runs = low.zipWithIndex.groupBy { case (k, i) => k - i }
          .values.map(_.size.toLong).toSeq
        Some((runs.size.toLong, runs.max, low.size.toLong))
      }
    }
    assert(replay(3L).isEmpty && !out.contains(3L)) // the strict-< pin
    assert(replay(600L).isDefined)
    assert(out == Map(600L -> replay(600L).get))
  }

  // ----- dHash pixel replay (buildImage arithmetic + clamped shift)
  private def dhashReplay(seed: Long, w: Int, h: Int, shift: Int): Long = {
    val P = 1000000007L
    def gray(x: Int, y: Int): Int = {
      val v = seed * 1103515245L + x * 12345L + y * 1013904223L
      val r = math.min((((v >> 16) & 255) + shift).toInt, 255)
      val g = math.min((((v >> 8) & 255) + shift).toInt, 255)
      val b = math.min(((v & 255) + shift).toInt, 255)
      (r + g + b) / 3
    }
    var dh = 0L
    for (y <- 0 until h; x <- 0 until (w - 1))
      dh = (dh * 2 + (if (gray(x + 1, y) > gray(x, y)) 1L else 0L)) % P
    dh
  }

  test("m8_image_dhash == the pixel-arithmetic replay through the real " +
      "PNG/BMP decode; same-pixel cross-codec copies share one class") {
    // ids % 5 == 0 become images; seed = id % 45, fmt by (id/5) % 2,
    // shift 8 when (id/5) % 5 == 0:
    //   5   seed 5  bmp  unshifted
    //   50  seed 5  png  SHIFTED
    //   95  seed 5  bmp  unshifted (identical bytes to 5)
    //   140 seed 5  png  unshifted (same pixels, other codec)
    val ids = Seq(5L, 50L, 95L, 140L)
    val out = run("m8_image_dhash", fixture("m8", ids :+ 7L))
      .map(r => (r.getAs[Int]("width"), r.getAs[Int]("height"),
        r.getAs[Long]("dhash")) ->
        (r.getAs[Long]("n_copies"), r.getAs[Long]("n_formats"),
          r.getAs[Long]("n_shifted"), r.getAs[Long]("first_media_id"))).toMap
    // replay the expected grouping (n_copies >= 2 filter included)
    val feats = ids.map { id =>
      val seed = id % 45L
      val (w, h) = (3 + (seed % 14).toInt, 5 + (seed % 9).toInt)
      val fmt = if (((id / 5) % 2) == 0) "png" else "bmp"
      val shift = if ((id / 5) % 5 == 0) 8 else 0
      (id, fmt, w, h, dhashReplay(seed, w, h, shift), shift)
    }
    val expected = feats.groupBy { case (_, _, w, h, dh, _) => (w, h, dh) }
      .collect { case (key, g) if g.size >= 2 =>
        key -> (g.size.toLong, g.map(_._2).distinct.size.toLong,
          g.count(_._6 > 0).toLong, g.map(_._1).min)
      }
    assert(out == expected)
    // the cross-codec theorem: 5 (bmp), 95 (bmp), 140 (png) hold the
    // SAME pixels — they must land in one class spanning two formats
    val unshifted = feats.find(_._1 == 5L).get._5
    val cls = out((8, 10, unshifted))
    assert(cls._1 >= 3L && cls._2 == 2L && cls._4 == 5L)
  }

  test("m10_byteslice_frames: hand slices on ASCII — frame length " +
      "max(1, n/10), stride-3 indices, empty-tail frames at length 0") {
    val texts = Map[Long, String](
      1L -> "abcdefghijklmnopqrstuvwxy", // 25 bytes → flen 2
      2L -> "abc",                       // 3 bytes  → flen 1, tail empty
      4L -> "hello world!"               // 12 bytes → flen 1
    )
    val out = run("m10_byteslice_frames",
        fixture("m10", texts.keys.toSeq.sorted, texts))
      .map(r => (r.getAs[Long]("media_id"), r.getAs[Long]("frame_idx")) ->
        (r.getAs[Long]("frame_len"), r.getAs[Long]("byte_sum"))).toMap
    val expected = Map(
      (1L, 0L) -> ((2L, 195L)), // "ab"  97+98
      (1L, 3L) -> ((2L, 207L)), // "gh" 103+104
      (1L, 6L) -> ((2L, 219L)), // "mn" 109+110
      (1L, 9L) -> ((2L, 231L)), // "st" 115+116
      (2L, 0L) -> ((1L, 97L)),  // "a"
      (2L, 3L) -> ((0L, 0L)),   // beyond the 3 bytes: empty frame
      (2L, 6L) -> ((0L, 0L)),
      (2L, 9L) -> ((0L, 0L)),
      (4L, 0L) -> ((1L, 104L)), // 'h'
      (4L, 3L) -> ((1L, 108L)), // 'l'
      (4L, 6L) -> ((1L, 119L)), // 'w'
      (4L, 9L) -> ((1L, 108L))  // 'l'
    )
    assert(out == expected)
  }
}
