package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{DedupQueries, EventQueries, MultimodalQueries, ParityQueries, QueryDef, SimilarityQueries, TextQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is registered here as a
  * named query over the test corpus, with equivalent DuckDB SQL in
  * [[oracleSql]] (the driver's correctness gate). Registries live in
  * `graft.queries.*`; this object only aggregates them.
  */
object SparkEntry {

  private def registry: Seq[QueryDef] =
    ParityQueries.all ++ TextQueries.all ++ SimilarityQueries.all ++
      DedupQueries.all ++ EventQueries.all ++ MultimodalQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registry.flatMap(q =>
      q.oracleFn.map(f => q.name -> f())
        .orElse(q.oracle.map(q.name -> _))).toMap

  /** Headline subset Bench runs at sf0.1 (full map runs in Verify). */
  def benchQueries: Seq[String] = registry.filter(_.bench).map(_.name)

  /** Registry-order names: Verify sweeps in THIS stable order so
    * per-query wall-clocks are comparable across rounds (the `queries`
    * Map's hash order is arbitrary — whichever query happened to run
    * first absorbed all the JVM/codegen warm-up and looked 20× its
    * real cost in VERIFY_TIMES).
    */
  def orderedNames: Seq[String] = registry.map(_.name)
}
