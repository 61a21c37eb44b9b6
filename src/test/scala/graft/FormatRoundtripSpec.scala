package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Source/sink format breadth: the engine's tables round-trip through
  * every text/columnar format the container ships (csv, json, orc,
  * parquet — avro has no connector jar here and is deliberately
  * absent), with exact row-set equality, and the columnar formats
  * keep predicate pushdown working (a format that silently reads
  * everything would still pass equality — the plan assert is the
  * point).
  */
class FormatRoundtripSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def slice = graft.sources.Tables.table(spark, sf, "orders")
    .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      expr("CAST(round(o_totalprice*100) AS BIGINT)").as("cents"))

  test("orders slice round-trips csv/json/orc/parquet with exact equality") {
    val base = Files.createTempDirectory("graft_fmt").toString
    try {
      val want = slice.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
        .toSet
      for (fmt <- Seq("csv", "json", "orc", "parquet")) {
        val dir = s"$base/$fmt"
        val w = slice.write.mode("overwrite")
        (if (fmt == "csv") w.option("header", "true") else w)
          .format(fmt).save(dir)
        val r = spark.read
        val back = (fmt match {
          case "csv" => r.option("header", "true").schema(slice.schema).csv(dir)
          case "json" => r.schema(slice.schema).json(dir)
          case other => r.format(other).load(dir)
        }).collect()
          .map(x => (x.getLong(0), x.getLong(1), x.getString(2), x.getLong(3)))
          .toSet
        assert(back == want, s"$fmt round-trip diverged " +
          s"(only-back=${(back -- want).take(3)} only-want=${(want -- back).take(3)})")
      }
    } finally {
      import scala.jdk.CollectionConverters._
      val walk = Files.walk(java.nio.file.Paths.get(base))
      try walk.iterator().asScala.toSeq.reverseIterator
        .foreach(p => { Files.deleteIfExists(p); () })
      finally walk.close()
    }
  }

  test("orc scans keep predicate pushdown (like the parquet path)") {
    val base = Files.createTempDirectory("graft_fmt_orc").toString
    try {
      slice.write.mode("overwrite").format("orc").save(base)
      val df = spark.read.format("orc").load(base)
        .filter(col("o_orderkey") < 100)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters") && plan.contains("o_orderkey"),
        s"orc scan lost its pushed filter:\n${plan.take(1500)}")
    } finally {
      import scala.jdk.CollectionConverters._
      val walk = Files.walk(java.nio.file.Paths.get(base))
      try walk.iterator().asScala.toSeq.reverseIterator
        .foreach(p => { Files.deleteIfExists(p); () })
      finally walk.close()
    }
  }
}
