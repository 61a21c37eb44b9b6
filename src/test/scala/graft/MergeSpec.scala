package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Merge

/** MERGE contract: (1) agrees with a plain-Scala map-based
  * application on random feeds covering all five clause paths;
  * (2) the diff→merge round trip — applying the CDC classification
  * of (old, new) onto old rebuilds new exactly.
  */
class MergeSpec extends SparkSpec {
  import spark.implicits._

  test("matches a plain-Scala application across all clause paths") {
    val rnd = new scala.util.Random(42)
    val target = (1L to 200L).map(k => (k, rnd.nextInt(5).toString, rnd.nextInt(1000).toLong))
    // feed: updates on some existing keys, deletes on others (incl. a
    // delete of a MISSING key — must be a no-op), inserts on fresh keys
    val feed = Seq.newBuilder[(Long, String, Long, String)]
    target.foreach { case (k, _, _) =>
      if (k % 7 == 0) feed += ((k, "u", k * 10, "U"))
      else if (k % 11 == 0) feed += ((k, "x", 0L, "D"))
    }
    feed += ((999L, "x", 0L, "D"))          // delete of missing key: no-op
    feed += ((500L, "i", 5L, "I"))          // plain insert
    feed += ((501L, "i2", 6L, "U"))         // source-only U: upsert-inserts
    val feedSeq = feed.result()

    val got = Merge.upsert(
        target.toDF("k", "s", "v"), feedSeq.toDF("k", "s", "v", "op"), "k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

    val m = scala.collection.mutable.Map(target.map(t => t._1 -> t).toSeq: _*)
    feedSeq.foreach {
      case (k, _, _, "D") => m.remove(k)
      case (k, s, v, _)   => m(k) = (k, s, v)
    }
    assert(got == m.values.toSet)
  }

  test("merge(old, diff(old, new)) rebuilds new exactly") {
    val rnd = new scala.util.Random(7)
    val oldRows = (1L to 300L).map(k => (k, rnd.nextInt(3).toString, rnd.nextInt(100).toLong))
    // new snapshot: drop k%9==0, change k%4==0, add 400-420
    val newRows = oldRows.filter(_._1 % 9 != 0).map {
      case (k, s, v) if k % 4 == 0 => (k, s, v + 1000L)
      case r => r
    } ++ (400L to 420L).map(k => (k, "new", k))

    val o = oldRows.toDF("k", "s", "v")
    val n = newRows.toDF("k", "s", "v")
    // CDC classification via full-outer compare (diff_snapshots shape)
    val diff = o.as("o").join(n.as("n"), Seq("k"), "full_outer")
      .select(col("k"),
        coalesce(col("n.s"), lit("")).as("s"),
        coalesce(col("n.v"), lit(0L)).as("v"),
        when(col("o.s").isNull, "I")
          .when(col("n.s").isNull, "D")
          .when(col("o.s") =!= col("n.s") || col("o.v") =!= col("n.v"), "U")
          .as("op"))
      .filter(col("op").isNotNull)

    val rebuilt = Merge.upsert(o, diff, "k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(rebuilt == newRows.toSet)
  }
}
