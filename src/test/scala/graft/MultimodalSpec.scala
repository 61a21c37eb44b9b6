package graft

import org.apache.spark.sql.functions._

import graft.ext.{MediaFile, Multimodal}
import graft.read.Dashboard
import graft.sink.{ParquetSnapshotSink, SinkReset}

/** Multimodal plumbing (schema, mapPartitions batch shape, stub
  * decoder determinism), the S6 sink-reset lifecycle, and the F7/A9
  * guard+pct read-side ops.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("fromDocuments builds binary content + typed metadata") {
    val docs = Seq((1L, "hello world", "en", "srcA", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val m = Multimodal.fromDocuments(docs)
    val r = m.head()
    assert(m.schema("content").dataType.typeName == "binary")
    assert(r.getAs[Long]("media_id") == 1L)
    assert(r.getAs[String]("kind") == "text/en")
    assert(new String(r.getAs[Array[Byte]]("content"), "UTF-8") == "hello world")
    assert(r.getAs[Map[String, String]]("meta") == Map("source" -> "srcA", "lang" -> "en"))
  }

  test("extractFeatures runs distributed and is deterministic") {
    val media = Seq(
      MediaFile(1L, "text/en", "hello world".getBytes("UTF-8"), Map.empty),
      MediaFile(2L, "text/en", Array.emptyByteArray, Map.empty)).toDS()
    val out = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    val f1 = out(0)
    assert(f1.n_bytes == 11L)
    // known sha1 of "hello world"
    assert(f1.sha1_hex == "2aae6c35c94fcfb415dbe95f408b9ce91ee846ed")
    // stub decoder: dims from the first two bytes ('h'=104, 'e'=101)
    assert((f1.width, f1.height) == (105, 102))
    assert(math.abs(f1.byte_histogram.sum - 1.0) < 1e-12)
    val f2 = out(1)
    assert(f2.n_bytes == 0L && (f2.width, f2.height) == ((0, 0)))
    assert(f2.byte_histogram.sum == 0.0)
  }

  test("image/png content is decoded for REAL via javax.imageio (3x5 PNG)") {
    val bytes = Multimodal.syntheticPng(seed = 99L, w = 3, h = 5)
    // PNG magic: real encoded bytes, not a fake
    assert((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P'.toByte)
    assert(Multimodal.decodeDimensions("image/png", bytes) == ((3, 5)))
    // unreadable image bytes → (0,0), never the text stub's byte-derived dims
    assert(Multimodal.decodeDimensions("image/png", "nonsense".getBytes) == ((0, 0)))
  }

  test("all four JDK codecs (png/jpeg/bmp/gif) encode and decode for REAL") {
    val magics = Map[String, Array[Byte] => Boolean](
      "png" -> (b => (b(0) & 0xff) == 0x89 && b(1) == 'P'.toByte),
      "jpeg" -> (b => (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8),
      "bmp" -> (b => b(0) == 'B'.toByte && b(1) == 'M'.toByte),
      "gif" -> (b => b(0) == 'G'.toByte && b(1) == 'I'.toByte && b(2) == 'F'.toByte))
    Multimodal.imageFormats.foreach { fmt =>
      val bytes = Multimodal.syntheticImage(seed = 7L, w = 9, h = 4, fmt)
      assert(magics(fmt)(bytes), s"$fmt bytes lack the format magic")
      // lossy or not, dimensions decode exactly for every codec
      assert(Multimodal.decodeDimensions(s"image/$fmt", bytes) == ((9, 4)), fmt)
    }
  }

  test("mediaWithImages: image rows decode true dimensions distributed, all codecs") {
    val docs = (0L until 20L).map(i => (i, s"doc $i body", "en", "srcA", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val feats = Multimodal.extractFeatures(Multimodal.mediaWithImages(spark, docs))
      .collect().sortBy(_.media_id)
    val imgs = feats.filter(_.kind.startsWith("image/"))
      .map(f => (f.media_id, f.kind, f.width, f.height))
    // ids 0/5/10/15 cycle png→jpeg→bmp→gif; dims (3 + id%14, 5 + id%9)
    assert(imgs.toSeq == Seq(
      (0L, "image/png", 3, 5), (5L, "image/jpeg", 8, 10),
      (10L, "image/bmp", 13, 6), (15L, "image/gif", 4, 11)))
    assert(feats.count(_.kind == "text/en") == 16)
  }

  test("lossless codecs round-trip PIXELS exactly (the m5 oracle premise)") {
    Multimodal.losslessImageFormats.foreach { fmt =>
      val (seed, w, h) = (13L, 7, 6)
      val bytes = Multimodal.syntheticImage(seed, w, h, fmt)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      for (y <- 0 until h; x <- 0 until w) {
        val expected = ((seed * 1103515245L + x * 12345L + y * 1013904223L) & 0xffffff).toInt
        assert((img.getRGB(x, y) & 0xffffff) == expected, s"$fmt pixel ($x,$y)")
      }
    }
  }

  test("extractPixelFeatures: cross-codec duplicates share the fingerprint") {
    val docs = (0L until 40L by 5L).map(i => (i, s"t$i", "en", "s", 2L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    // seedMod 15 (odd multiple of 5): seeds for ids 0,5,...,35 are
    // 0,5,10,0,5,10,0,5 while formats alternate png/bmp — every seed
    // group mixes containers (the property the scaladoc requires)
    val feats = Multimodal.extractPixelFeatures(
      Multimodal.mediaWithLosslessImages(spark, docs, seedMod = 15L)).collect()
    assert(feats.length == 8)
    val byFp = feats.groupBy(f => (f.width, f.height, f.pix_sum, f.pix_hash))
    assert(byFp.size == 3, byFp.keys.toSeq.toString)
    assert(byFp.values.map(_.length).toSeq.sorted == Seq(2, 3, 3))
    byFp.values.foreach { g =>
      assert(g.map(_.kind).distinct.sorted.toSeq == Seq("image/bmp", "image/png"),
        g.map(_.kind).toSeq.toString)
    }
  }

  test("WAV audio decodes for REAL via javax.sound.sampled (mono + stereo)") {
    // mono: format + frame count + per-sample energy round-trip the encoder
    val mono = Multimodal.syntheticWav(seed = 7L, sampleRate = 16000, channels = 1, nFrames = 300)
    val (r1, c1, f1, e1) = Multimodal.decodeAudio(mono)
    assert((r1, c1, f1) == ((16000, 1, 300L)))
    val expectMono = (0 until 300).map { j =>
      val s = Multimodal.audioSample(7L, j.toLong).toLong; s * s
    }.sum
    assert(e1 == expectMono)

    // stereo: interleaved samples, frame count is per-channel
    val stereo = Multimodal.syntheticWav(seed = 8L, sampleRate = 44100, channels = 2, nFrames = 250)
    val (r2, c2, f2, e2) = Multimodal.decodeAudio(stereo)
    assert((r2, c2, f2) == ((44100, 2, 250L)))
    val expectStereo = (0 until 500).map { j =>
      val s = Multimodal.audioSample(8L, j.toLong).toLong; s * s
    }.sum
    assert(e2 == expectStereo)

    // unreadable bytes report zeros, mirroring decodeDimensions
    assert(Multimodal.decodeAudio("not a wav".getBytes) == ((0, 0, 0L, 0L)))
  }

  test("mediaWithAudio: audio rows decode true format distributed") {
    val docs = graft.sources.Tables.table(spark, "/root/testdata/sf0.001", "documents")
    val feats = Multimodal.extractAudioFeatures(
      Multimodal.mediaWithAudio(spark, docs)).collect()
    assert(feats.nonEmpty)
    feats.foreach { a =>
      assert(a.media_id % 3 == 0)
      assert(a.sample_rate == Multimodal.audioRates((a.media_id % 4).toInt))
      assert(a.channels == 1 + (a.media_id % 2).toInt)
      assert(a.n_frames == 200 + a.media_id % 800)
      assert(a.duration_ms == a.n_frames * 1000L / a.sample_rate)
      assert(a.energy > 0)
    }
    assert(feats.exists(_.channels == 1) && feats.exists(_.channels == 2))
  }

  test("resizeStub and frameSample are deterministic with exact shapes") {
    val bytes = (0 until 100).map(_.toByte).toArray
    val resized = Multimodal.resizeStub(bytes, 25)
    assert(resized.length == 25 && resized(1) == 4.toByte) // every 4th byte
    assert(Multimodal.resizeStub(bytes, 200).sameElements(bytes))

    val frames = Multimodal.frameSample(bytes, nFrames = 10, stride = 3)
    assert(frames.map(_._1) == Seq(0, 3, 6, 9))
    assert(frames.forall(_._2.length == 10)) // 100 bytes / 10 frames
    assert(frames.head._2.head == 0.toByte && frames(1)._2.head == 30.toByte)
    assert(Multimodal.frameSample(Array.emptyByteArray, 10, 3).isEmpty)
  }

  test("transcode runs the fused resize+frame pass distributed") {
    val media = Seq(
      MediaFile(1L, "video/fake", (0 until 100).map(_.toByte).toArray, Map.empty))
      .toDS()
    val out = Multimodal.transcode(media, targetBytes = 25, nFrames = 10, stride = 3).head()
    assert(out == ((1L, 25, 4, 40)))
  }

  test("syntheticAvi/demuxAvi round-trip: DIB pixels exact, MJPG decodes for REAL") {
    // DIB: lossless — demuxed frame bytes must BE the generated rows,
    // and the pixel fingerprints must equal direct generator sums
    val dib = Multimodal.syntheticAvi(seed = 21L, w = 5, h = 4, nFrames = 4, codec = "DIB ")
    val (dw, dh, dcodec, dframes) = Multimodal.demuxAvi(dib)
    assert((dw, dh, dcodec, dframes.length) == ((5, 4, "DIB ", 4)))
    assert(dframes(2).sameElements(Multimodal.dibFrame(21L * 31 + 2, 5, 4)))
    // MJPG: every frame is a real JPEG the JDK decoder reads at the
    // generated geometry
    val mjpg = Multimodal.syntheticAvi(seed = 14L, w = 7, h = 3, nFrames = 3, codec = "MJPG")
    val (mw, mh, mcodec, mframes) = Multimodal.demuxAvi(mjpg)
    assert((mw, mh, mcodec, mframes.length) == ((7, 3, "MJPG", 3)))
    mframes.foreach { f =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(f))
      assert(img != null && img.getWidth == 7 && img.getHeight == 3)
    }
    // malformed bytes follow the (0,0,"",empty) error contract
    assert(Multimodal.demuxAvi("not an avi".getBytes) == ((0, 0, "", Seq.empty)))
  }

  test("extractVideoFrames: distributed demux, stride sampling, DIB fingerprints exact") {
    val docs = Seq(
      (0L, "t0", "en", "web"), (7L, "t7", "en", "web"), (14L, "t14", "de", "web"),
      (3L, "t3", "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
    val out = Multimodal.extractVideoFrames(
      Multimodal.mediaWithVideos(spark, docs), stride = 2).collect()
      .sortBy(f => (f.media_id, f.frame_idx))
    // ids 0, 7, 14 are videos (every 7th); id 0 and 14 are DIB
    // ((id/7)%2==0), 7 is MJPG; nFrames = 3+id%5 sampled at stride 2
    assert(out.map(_.media_id).distinct.toSeq == Seq(0L, 7L, 14L))
    val by = out.groupBy(_.media_id)
    assert(by(0L).map(_.frame_idx).toSeq == Seq(0, 2)) // 3 frames
    assert(by(7L).map(_.frame_idx).toSeq == Seq(0, 2, 4)) // 5 frames
    assert(by(0L).forall(f => f.codec == "dib" && f.width == 4 && f.height == 3))
    assert(by(7L).forall(f => f.codec == "mjpg" && f.width == 11 && f.height == 4
      && f.pix_sum == -1L && f.pix_hash == -1L))
    // DIB fingerprint equals the direct generator-arithmetic sum
    val f2 = by(0L).find(_.frame_idx == 2).get
    var sum = 0L; var hash = 0L
    for (y <- 0 until 3; x <- 0 until 4) {
      val v = (0L * 31 + 2) * 1103515245L + x * 12345L + y * 1013904223L
      val rgb = (v & 0xffffff).toInt
      val gray = (((rgb >> 16) & 255) + ((rgb >> 8) & 255) + (rgb & 255)) / 3
      sum += gray; hash += gray.toLong * (1L + y.toLong * 4 + x)
    }
    assert(f2.pix_sum == sum && f2.pix_hash == hash)
  }

  test("SinkReset truncates and recreates all 8 sink tables (S6)") {
    val root = java.nio.file.Files.createTempDirectory("graft_reset").toString
    val sink = new ParquetSnapshotSink(root)
    val df = Seq(("A", 1L)).toDF("k", "count").withColumn("timestamp", lit(1700000000.0))
    sink.write("age_group_distribution", df)
    sink.write("work_hours", df)
    assert(sink.read(spark, "age_group_distribution").count() == 1)

    val removed = SinkReset.reset(root)
    assert(removed.keySet == SinkReset.tables.toSet)
    assert(removed("age_group_distribution") > 0 && removed("work_hours") > 0)
    assert(removed("anomalies") == 0)
    SinkReset.tables.foreach { t =>
      assert(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(root, t)))
      assert(new java.io.File(s"$root/$t").list().isEmpty)
    }
  }

  test("withIncomePct derives pct when columns exist, is a no-op otherwise (F7+A9)") {
    val ok = Seq((3L, 1L)).toDF("count_high_income", "count_low_income")
    val got = Dashboard.withIncomePct(ok).head().getAs[Double]("pct_high_income")
    assert(got == 75.0)
    val missing = Seq((3L, 1L)).toDF("a", "b")
    assert(Dashboard.withIncomePct(missing).columns.toSeq == Seq("a", "b"))
  }
}
