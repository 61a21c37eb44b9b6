package graft

import org.apache.spark.sql.SparkSession

/** One place that builds every graft SparkSession, so session-wide conf
  * is set once at build time instead of mutated mid-query by loaders
  * (round-1 verdict: `Tables.events` used to flip
  * `spark.sql.legacy.parquet.nanosAsLong` globally per read).
  *
  * Conf rationale:
  *  - `shuffle.partitions` sized to the core count, not the 200 default
  *    — at local[N] scale a 200-way shuffle is pure scheduling overhead,
  *    and on a real cluster this knob is workload-sized anyway.
  *  - AQE on: runtime broadcast-vs-shuffle decisions, skew-join
  *    splitting, and partition coalescing are the 100 TB safety net for
  *    every join in the library (see Dashboard.argmaxJoinBack).
  *  - `nanosAsLong`: the corpus stores `events.ts` as TIMESTAMP(NANOS),
  *    which Spark's vectorized parquet reader otherwise rejects;
  *    Tables.events converts the raw longs in-plan.
  */
object Sessions {

  def local(cpus: String, app: String): SparkSession = {
    val shufflePartitions =
      if (cpus == "*") Runtime.getRuntime.availableProcessors.toString else cpus
    val s = SparkSession.builder()
      // SPARK_MASTER lets the deployment entry points (CensusApp)
      // target a real cluster; everything else defaults to local[N]
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
      .appName(app)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // catalog tables (bucketed writes) land in tmp, not the repo cwd
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft_warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // getOrCreate() silently ignores every builder config — including
    // spark.sql.extensions — when a session already exists in this JVM;
    // re-register the native functions on whatever session came back so
    // similarity/dedup queries can never hit undefined-function errors
    graft.functions.GraftFunctions.ensureRegistered(s)
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
