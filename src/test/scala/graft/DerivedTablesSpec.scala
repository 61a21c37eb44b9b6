package graft

import org.apache.spark.sql.functions._

import graft.sources.DerivedTables

/** Contracts of the derived TPC-H fixture (sources/DerivedTables) —
  * the integer derivations both engines replay must actually deliver
  * the structure the seven TPC-H shapes assume.
  */
class DerivedTablesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("partsupp: exactly 4 DISTINCT suppliers per part, keys in range") {
    val ps = DerivedTables.partsupp(spark, sf)
    val nSupp = graft.sources.Tables.table(spark, sf, "supplier").count()
    val perPart = ps.groupBy("ps_partkey")
      .agg(countDistinct("ps_suppkey").as("k"), count(lit(1)).as("n"))
    assert(perPart.filter(col("k") =!= 4 || col("n") =!= 4).count() == 0,
      "a part lost a distinct supplier — the stride broke")
    val bad = ps.filter(col("ps_suppkey") < 0 ||
      col("ps_suppkey") >= nSupp ||
      col("ps_availqty") < 1 || col("ps_availqty") > 9999 ||
      col("ps_supplycost_cents") < 1)
    assert(bad.count() == 0, "derived columns left their contract ranges")
  }

  test("partsupp: supplycost stays below retail (the profit margin Q9 books)") {
    val ps = DerivedTables.partsupp(spark, sf)
    val part = graft.sources.Tables.table(spark, sf, "part")
      .select(col("p_partkey").cast("long").as("ps_partkey"),
        expr("CAST(round(p_retailprice*100) AS BIGINT)").as("retail_cents"))
    val over = ps.join(part, Seq("ps_partkey"))
      .filter(col("ps_supplycost_cents") > col("retail_cents"))
    assert(over.count() == 0, "supplycost exceeded retail for some part")
  }

  test("lineitem dates: receipt strictly after ship; commit within ±30 days") {
    val lx = DerivedTables.lineitemExt(spark, sf)
      .select(to_date(col("l_shipdate")).as("ship"),
        col("l_commitdate"), col("l_receiptdate"))
    assert(lx.filter(col("l_receiptdate") <= col("ship")).count() == 0)
    assert(lx.filter(datediff(col("l_receiptdate"), col("ship")) > 30)
      .count() == 0)
    assert(lx.filter(abs(datediff(col("l_commitdate"), col("ship"))) > 30)
      .count() == 0)
    // both lateness orders occur — Q12's sandwich and Q21's waiting
    // predicate are only meaningful if the derivation produces both
    assert(lx.filter(col("l_receiptdate") > col("l_commitdate")).count() > 0)
    assert(lx.filter(col("l_receiptdate") <= col("l_commitdate")).count() > 0)
  }
}
