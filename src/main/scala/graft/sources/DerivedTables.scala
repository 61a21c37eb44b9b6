package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Derived TPC-H fixture columns — partsupp and commit/receipt dates —
  * as PURE DETERMINISTIC functions of the driver's read-only corpus
  * (TESTDATA.md), computed identically by Spark and by the DuckDB
  * oracle ([[DerivedTables.Sql]]): integer arithmetic on keys plus
  * date_add on the ship date, nothing engine-specific. This converts
  * the round-7 "fixture-infeasible" boundary on TPC-H Q2/9/11/12/16/
  * 20/21 (SURVEY E215) into a closed one without touching
  * `/root/testdata`.
  *
  * Derivation contracts (all non-negative before `%`, so Spark `%`
  * and DuckDB `%` agree; `div`/`//` likewise):
  *  - partsupp: 4 suppliers per part,
  *    ps_suppkey = (p_partkey + i·(S div 4)) % S for i ∈ 0..3 with
  *    S = |supplier| (distinct for S ≥ 4 since i·(S div 4) < S — the
  *    public TPC-H generator's stride idea in its simplest exact
  *    form); ps_availqty = 1 + (p_partkey·7 + i·13) % 9999;
  *    ps_supplycost_cents = 1 + (retail_cents·(47 + (p_partkey+3i) %
  *    51)) div 100 — 47-97% of retail, exact cents.
  *  - lineitem dates: l_commitdate = ship + ((31·okey + 7·line) % 61
  *    − 30) days (±30 of ship — both orders occur, which is what
  *    Q12's ship < commit sandwich and Q21's lateness need);
  *    l_receiptdate = ship + 1 + (17·okey + 11·line) % 30 days
  *    (strictly after ship).
  *
  * Scale: partsupp is a flat map over `part` (4 rows out per row in,
  * no shuffle — the |supplier| count is a 1-row broadcast);
  * lineitemExt is a zero-shuffle projection over `lineitem`.
  */
object DerivedTables {

  def partsupp(s: SparkSession, dir: String): DataFrame = {
    val part = Tables.table(s, dir, "part")
    val ns = Tables.table(s, dir, "supplier").agg(count(lit(1)).as("__s"))
    part.crossJoin(broadcast(ns))
      .select(col("p_partkey"), col("p_retailprice"), col("__s"),
        explode(sequence(lit(0L), lit(3L))).as("i"))
      .select(
        col("p_partkey").cast("long").as("ps_partkey"),
        ((col("p_partkey") +
          col("i") * call_function("div", col("__s"), lit(4L))) % col("__s"))
          .cast("long").as("ps_suppkey"),
        (lit(1L) + (col("p_partkey") * 7L + col("i") * 13L) % 9999L)
          .as("ps_availqty"),
        (lit(1L) + call_function("div",
          expr("CAST(round(p_retailprice*100) AS BIGINT)") *
            (lit(47L) + (col("p_partkey") + col("i") * 3L) % 51L),
          lit(100L))).as("ps_supplycost_cents"))
  }

  def lineitemExt(s: SparkSession, dir: String): DataFrame = {
    val ln = col("l_linenumber").cast("long")
    Tables.table(s, dir, "lineitem")
      .withColumn("l_commitdate", date_add(to_date(col("l_shipdate")),
        ((col("l_orderkey") * 31L + ln * 7L) % 61L - 30L).cast("int")))
      .withColumn("l_receiptdate", date_add(to_date(col("l_shipdate")),
        (lit(1L) + (col("l_orderkey") * 17L + ln * 11L) % 30L).cast("int")))
  }

  /** DuckDB mirrors — splice into a WITH clause; both expect the base
    * `part`/`supplier`/`lineitem` views the driver registers. Every
    * key multiply casts the key to BIGINT FIRST: DuckDB ERRORS on
    * INT32 overflow (no wrap), so `l_orderkey*31` in the base
    * column's native width dies at large scale factors while the
    * Spark side casts to long before multiplying (round-8 advice) —
    * the ::BIGINT keeps the derivation valid at any SF.
    */
  object Sql {

    /** Exposes `partsupp(ps_partkey, ps_suppkey, ps_availqty,
      * ps_supplycost_cents)` (and the helper `nsupp`).
      */
    val partsupp: String =
      """nsupp AS (SELECT CAST(count(*) AS BIGINT) AS s FROM supplier),
        |partsupp AS (
        |  SELECT CAST(p_partkey AS BIGINT) AS ps_partkey,
        |    CAST((p_partkey::BIGINT + i.i * ((SELECT s FROM nsupp) // 4))
        |      % (SELECT s FROM nsupp) AS BIGINT) AS ps_suppkey,
        |    CAST(1 + (p_partkey::BIGINT * 7 + i.i * 13) % 9999 AS BIGINT)
        |      AS ps_availqty,
        |    CAST(1 + (CAST(round(p_retailprice*100) AS BIGINT)
        |      * (47 + (p_partkey::BIGINT + i.i*3) % 51)) // 100 AS BIGINT)
        |      AS ps_supplycost_cents
        |  FROM part, (SELECT unnest([0,1,2,3]) AS i) i)""".stripMargin

    /** Exposes `lx` = lineitem + (l_commitdate, l_receiptdate) DATEs. */
    val lineitemExt: String =
      """lx AS (SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
        |    l_quantity, l_extendedprice, l_discount, l_returnflag,
        |    l_shipdate,
        |    CAST(l_shipdate AS DATE)
        |      + CAST((l_orderkey::BIGINT*31 + l_linenumber::BIGINT*7) % 61
        |          - 30 AS INTEGER)
        |      AS l_commitdate,
        |    CAST(l_shipdate AS DATE)
        |      + CAST(1 + (l_orderkey::BIGINT*17 + l_linenumber::BIGINT*11)
        |          % 30 AS INTEGER)
        |      AS l_receiptdate
        |  FROM lineitem)""".stripMargin
  }
}
