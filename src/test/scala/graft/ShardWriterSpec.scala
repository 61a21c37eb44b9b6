package graft

import java.io.File
import java.nio.file.Files
import java.security.MessageDigest

import graft.ext.Shards

/** Proves the shard writer materializes EXACTLY the order that
  * `tx19_shard_manifest` fingerprints: reading the written files back
  * in lexicographic file-name order, per source, and md5-ing the
  * doc_id sequence reproduces the manifest hash byte-for-byte — and
  * the `maxRecordsPerFile` bound actually splits files.
  */
class ShardWriterSpec extends SparkSpec {

  private val SfDir = "/root/testdata/sf0.001"
  private val MaxPerFile = 16

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  test("read-back in file-name order reproduces the tx19 manifest per source") {
    val outDir = Files.createTempDirectory("graft-shards").toFile
    outDir.deleteOnExit()

    val docs = graft.sources.Tables.table(spark, SfDir, "documents")
    Shards.writeShards(docs, outDir.getAbsolutePath, MaxPerFile)

    val expected = SparkEntry.queries("tx19_shard_manifest")(spark, SfDir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getString(2)))
      .toMap
    assert(expected.nonEmpty)

    val sourceDirs = outDir.listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("source="))
    assert(sourceDirs.map(_.getName.stripPrefix("source=")).toSet ==
      expected.keySet)

    var sawSplit = false
    sourceDirs.foreach { dir =>
      val source = dir.getName.stripPrefix("source=")
      val files = dir.listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .sortBy(_.getName)
      assert(files.nonEmpty, source)
      if (files.length > 1) sawSplit = true

      // Each file read alone: one small file = one input partition, so
      // collect() preserves on-disk row order.
      val ids = files.flatMap { f =>
        val rows = spark.read.parquet(f.getAbsolutePath).collect()
        assert(rows.length <= MaxPerFile,
          s"$source/${f.getName}: ${rows.length} rows > bound $MaxPerFile")
        rows.map(_.getAs[Long]("doc_id"))
      }
      val (nDocs, manifest) = expected(source)
      assert(ids.length.toLong == nDocs, source)
      assert(md5hex(ids.mkString(",")) == manifest,
        s"$source: read-back order diverges from the manifest")
    }
    assert(sawSplit, "maxRecordsPerFile never split — bound untested")

    // cleanup (best-effort; temp dir)
    def rm(f: File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    rm(outDir)
  }
}
