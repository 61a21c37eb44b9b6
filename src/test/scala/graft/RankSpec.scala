package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Rank
import graft.queries.TrackedCache

/** ops/Rank — the distributed exact-rank / prefix-sum primitive that
  * replaced the round-7 unpartitioned-window family. Equality oracle:
  * the single-partition window it replaces, run on small generated
  * data where the funnel is harmless.
  */
class RankSpec extends SparkSpec {

  private def fresh = new TrackedCache

  test("globalPosition equals row_number over a unique composite key") {
    val spark0 = spark
    import spark0.implicits._
    val rnd = new scala.util.Random(7)
    val df = (1 to 500).map(i => (rnd.nextInt(50), i))
      .toDF("v", "id").repartition(7)
    val cache = fresh
    val got = Rank.globalPosition(df, Seq(col("v"), col("id")), "pos", cache(_))
      .select("v", "id", "pos").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
    val want = df.withColumn("pos",
        row_number().over(Window.orderBy(col("v"), col("id"))).cast("long"))
      .select("v", "id", "pos").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == want)
    cache.release()
  }

  test("globalPosition honors descending components") {
    val spark0 = spark
    import spark0.implicits._
    val df = (1 to 200).map(i => (i % 13, i)).toDF("v", "id").repartition(5)
    val cache = fresh
    val got = Rank.globalPosition(df, Seq(col("v").desc, col("id")), "pos",
        cache(_))
      .select("id", "pos").collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    val want = df.withColumn("pos",
        row_number().over(Window.orderBy(col("v").desc, col("id"))).cast("long"))
      .select("id", "pos").collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(got == want)
    cache.release()
  }

  test("globalPosition tie extents are exact even with arbitrary tie order") {
    val spark0 = spark
    import spark0.implicits._
    // heavy ties: 1000 rows over 9 distinct values — per-value min/max
    // position must match the closed form regardless of intra-tie order
    val df = (1 to 1000).map(i => i % 9).toDF("v").repartition(11)
    val cache = fresh
    val got = Rank.globalPosition(df, Seq(col("v")), "pos", cache(_))
      .groupBy("v").agg(min("pos").as("lo"), max("pos").as("hi"),
        count(lit(1)).as("t"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    var cum = 0L
    val counts = (1 to 1000).groupBy(_ % 9).view.mapValues(_.size.toLong).toMap
    got.foreach { case (v, lo, hi, t) =>
      assert(t == counts(v))
      assert(lo == cum + 1 && hi == cum + t, s"value $v block [$lo,$hi] t=$t")
      cum += t
    }
    cache.release()
  }

  test("runningTotals equals the unpartitioned cumulative window") {
    val spark0 = spark
    import spark0.implicits._
    val rnd = new scala.util.Random(11)
    val grid = (1 to 300).map(i => (i * 3, rnd.nextInt(100).toLong + 1L,
        rnd.nextInt(10).toLong))
      .toDF("k", "a", "b").repartition(6)
    val cache = fresh
    val got = Rank.runningTotals(grid, Seq(col("k")),
        Seq("a" -> "ca", "b" -> "cb"), cache(_))
      .select("k", "ca", "cb").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val w = Window.orderBy("k")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = grid
      .withColumn("ca", sum("a").over(w)).withColumn("cb", sum("b").over(w))
      .select("k", "ca", "cb").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
    cache.release()
  }

  test("runningTotals in descending order") {
    val spark0 = spark
    import spark0.implicits._
    val grid = (1 to 120).map(i => (i, i.toLong)).toDF("k", "a").repartition(4)
    val cache = fresh
    val got = Rank.runningTotals(grid, Seq(col("k").desc), Seq("a" -> "ca"),
        cache(_))
      .select("k", "ca").collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    // cum in desc order: ca(k) = Σ_{j ≥ k} j = (120·121/2) − (k−1)k/2
    (1 to 120).foreach { k =>
      assert(got(k) == 120L * 121 / 2 - (k.toLong - 1) * k / 2)
    }
    cache.release()
  }

  test("empty inputs keep their schema and return no rows") {
    val spark0 = spark
    import spark0.implicits._
    val empty = Seq.empty[(Int, Long)].toDF("k", "a")
    val cache = fresh
    val p = Rank.globalPosition(empty, Seq(col("k")), "pos", cache(_))
    assert(p.columns.toSeq == Seq("k", "a", "pos") && p.count() == 0)
    val rt = Rank.runningTotals(empty, Seq(col("k")), Seq("a" -> "ca"), cache(_))
    assert(rt.columns.toSeq == Seq("k", "a", "ca") && rt.count() == 0)
    cache.release()
  }
}
