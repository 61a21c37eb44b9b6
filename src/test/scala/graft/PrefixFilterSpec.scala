package graft

import org.apache.spark.sql.functions._

/** Independent re-derivations for the round-7 dedup/series operators
  * whose oracles mirror the same algorithm: prefix filtering is
  * checked against a literal all-pairs sweep (completeness is the
  * property the pigeonhole lemma promises), the EWMA against the
  * textbook recursion, the packing fold against a sequential
  * simulation.
  */
class PrefixFilterSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("dedup_prefix_filter equals the all-pairs exact Jaccard >= 0.8 join") {
    // ground truth: brute-force over every doc pair's shingle-hash set
    val sets = graft.sources.Tables.table(spark, sf, "documents")
      .select(col("doc_id"),
        graft.ext.NearDup.shingleHashSet(
          graft.ext.TextAnalysis.tokens(col("text")), 3).as("hs"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet)
      .filter(_._2.nonEmpty)
      .sortBy(_._1)
    val expected = (for {
      i <- sets.indices.iterator
      j <- (i + 1) until sets.length
      inter = (sets(i)._2 & sets(j)._2).size
      uni = sets(i)._2.size + sets(j)._2.size - inter
      if inter * 5 >= uni * 4
    } yield (sets(i)._1, sets(j)._1)).toSet
    val got = SparkEntry.queries("dedup_prefix_filter")(spark, sf)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)
    assert(got.nonEmpty, "fixture has no J>=0.8 pairs to find")
    graft.queries.DedupQueries.releaseSignatureCache()
  }

  test("t_ewma_burst prev-EWMA matches the textbook recursion") {
    val out = SparkEntry.queries("t_ewma_burst")(spark, sf)
      .select(col("hour").cast("long").as("hsec"), col("cnt"), col("ewma_prev"))
      .collect()
      .map(r => (r.getLong(0) / 3600, r.getLong(1), r.getDouble(2)))
    // rebuild the full hourly series and run s = 0.5*(x + s) directly
    val hourly = graft.sources.Tables.table(spark, sf, "events")
      .groupBy((unix_timestamp(date_trunc("hour", col("ts"))) / 3600)
        .cast("long").as("hr"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val ewma = scala.collection.mutable.Map.empty[Long, Double]
    var s = hourly.head._2.toDouble
    hourly.tail.foreach { case (hr, cnt) =>
      ewma(hr) = s // prev-EWMA at this hour
      s = 0.5 * (cnt.toDouble + s)
    }
    assert(out.nonEmpty)
    out.foreach { case (hr, cnt, pe) =>
      val exp = ewma(hr)
      assert(math.abs(pe - exp) < 1e-6, s"hour $hr: $pe != $exp")
      assert(cnt * 4.0 > 5.0 * exp || cnt * 5.0 < 4.0 * exp,
        s"hour $hr flagged but inside band")
    }
  }

  test("layout_compaction bin counts match a sequential next-fit simulation") {
    val out = SparkEntry.queries("layout_compaction")(spark, sf)
      .collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("n_bins")).toMap
    val docs = graft.sources.Tables.table(spark, sf, "documents")
      .select("source", "doc_id", "n_chars")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val cap = 50000L
    docs.groupBy(_._1).foreach { case (src, items) =>
      // size desc, id asc — the query's pinned order
      var bins = 1L
      var fill = 0L
      items.sortBy(x => (-x._3, x._2)).foreach { case (_, _, sz) =>
        if (fill + sz > cap) { bins += 1; fill = sz } else fill += sz
      }
      assert(out(src) == bins, s"$src: ${out(src)} != $bins")
    }
  }
}
