package graft

import java.nio.file.{Files, Paths}

/** Benchmark main — runs the headline queries on SPARK_GRAFT_SF_DIR,
  * prints one JSON line for the driver (BENCH_r{N}.json) AND writes the
  * same line to SPARK_GRAFT_BENCH_OUT (default `bench_result.json` in
  * the cwd) so the numbers survive sbt's log noise.
  *
  * Each query is forced with a `noop`-format write: the full plan
  * executes distributed (unlike `count()`, which lets Catalyst drop
  * projections) and nothing funnels to the driver.
  *
  * Failures are NOT swallowed (round-1 verdict): a query that throws is
  * reported with an `"err"` entry and a null time, never a rosy
  * near-zero duration.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_result.json")
    val spark = Sessions.local(cpus, "graft-bench")

    def run(name: String): Either[String, Double] =
      try {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
        Right((System.nanoTime() - t0) / 1e9)
      } catch {
        case e: Throwable =>
          Left(Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
      }

    val names = SparkEntry.benchQueries
    names.foreach(run) // warm-up: JIT/codegen cost lands outside the measured run
    // drop DATA caches the warm-up populated (e.g. the dedup signature
    // table) so measured times include every stage a cold run pays;
    // JVM/codegen warmth is retained, which is what warm-up is for
    spark.catalog.clearCache()
    val results = names.map(n => n -> run(n))

    def esc(s: String): String =
      s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      }
    val qs = results.map {
      case (k, Right(t)) => "\"" + k + "\":" + t
      case (k, Left(_))  => "\"" + k + "\":null"
    }.mkString("{", ",", "}")
    val errs = results.collect { case (k, Left(e)) => "\"" + k + "\":\"" + esc(e) + "\"" }
    val errJson = if (errs.isEmpty) "" else errs.mkString(""","errors":{""", ",", "}")
    val total = results.collect { case (_, Right(t)) => t }.sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs$errJson,"sf":"$sfDir","failed":${errs.size}}"""
    Files.writeString(Paths.get(outFile), line + "\n")
    println(line)
    spark.stop()
    if (errs.nonEmpty) sys.exit(1)
  }
}
