package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional trailing names restrict the dump — dev iteration only,
    // the driver always passes exactly (sfDir, outDir)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.local(cpus, "graft-verify")
    new java.io.File(outDir).mkdirs()
    // per-query wall-clock (build + execute + write) so an
    // accidentally-quadratic oracle query or plan shows up in the
    // round artifacts before it doubles the verify sweep's duration
    val times = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    // untimed warm-up: session init + codegen + one parquet read, so
    // the FIRST swept query isn't charged ~20 s of JVM warm-up
    graft.sources.Tables.table(spark, sfDir, "region").count()
    val fns = SparkEntry.queries
    SparkEntry.orderedNames
      .filter(name => only.isEmpty || only(name))
      .foreach { name =>
        val fn = fns(name)
        val t0 = System.nanoTime()
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
        times(name) = (System.nanoTime() - t0) / 1e9
      }
    // registry sweep done — drop the shared dedup signature cache so a
    // long-lived session doesn't accumulate entries
    graft.queries.DedupQueries.releaseSignatureCache()
    graft.queries.SimilarityQueries.releaseCaches()
    graft.queries.ParityQueries.releaseCaches()
    graft.queries.EventQueries.releaseCaches()
    graft.queries.TextQueries.releaseCaches()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // per-query `sec`, written next to the dump AND mirrored to the
    // repo root (stable path the judge can read even if the driver's
    // outDir is ephemeral); sorted slowest-first in the mirror's
    // companion ranking for eyeballing
    val timesJson = times
      .map { case (k, v) => s"${q(k)}: ${"%.3f".format(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/verify_times.json"), timesJson)
    // mirror only on FULL sweeps — a dev subset run would otherwise
    // clobber the round artifact with a two-query fragment
    if (only.isEmpty)
      try Files.writeString(Paths.get("VERIFY_TIMES.json"), timesJson)
      catch { case scala.util.control.NonFatal(_) => () }
    spark.stop()
  }
}
