package graft

import org.apache.spark.sql.functions._

/** Independent checks for the round-7 selection/repair queries whose
  * DuckDB oracles mirror the same algorithm (a shared-algorithm bug
  * would hash-match): skyline dominance is re-derived brute-force,
  * gap-fill is checked against the interpolation DEFINITION.
  */
class SkylineSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("tx31_skyline equals the brute-force dominance skyline") {
    // same dims as the query, derived independently of its plan
    val base = graft.sources.Tables.table(spark, sf, "documents")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("d1"),
        expr("(CAST(size(array_distinct(split(text, ' '))) AS BIGINT) " +
          "* 1000000) div CAST(size(split(text, ' ')) AS BIGINT)").as("d2"))
      .filter(col("d1") > 0L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def dominated(p: (Long, Long, Long)): Boolean = base.exists { q =>
      q._2 >= p._2 && q._3 >= p._3 && (q._2 > p._2 || q._3 > p._3)
    }
    val expected = base.filterNot(dominated).map(_._1).toSet
    val got = SparkEntry.queries("tx31_skyline")(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("t_gap_fill: observed rows exact, filled rows linear between anchors") {
    val rows = SparkEntry.queries("t_gap_fill")(spark, sf)
      .select(col("hour").cast("long").as("hsec"), col("cnt_filled"),
        col("observed"))
      .collect()
      .map(r => (r.getLong(0) / 3600, r.getLong(1), r.getBoolean(2)))
      .sortBy(_._1)
    // spine is a dense hour range anchored on observed edges
    assert(rows.head._3 && rows.last._3)
    assert(rows.sliding(2).forall { case Array(a, b) => b._1 == a._1 + 1 })
    // every filled value matches floor-interpolation between the
    // nearest observed anchors (re-derived from the output itself)
    val obs = rows.filter(_._3)
    rows.filterNot(_._3).foreach { case (h, v, _) =>
      val (ph, pv, _) = obs.filter(_._1 < h).maxBy(_._1)
      val (nh, nv, _) = obs.filter(_._1 > h).minBy(_._1)
      val expected = pv + ((nv - pv) * (h - ph)) / (nh - ph)
      assert(v == expected, s"hour $h: $v != $expected")
    }
    assert(rows.exists(!_._3), "fixture has no gaps to interpolate")
  }

  test("sample_weighted_priority: top-k is monotone-consistent and size-biased") {
    val out = SparkEntry.queries("sample_weighted_priority")(spark, sf).collect()
    assert(out.length == 50)
    val minSelected = out.map(_.getAs[Long]("priority")).min
    // re-derive every doc's priority; no unselected doc may beat the cut
    val all = graft.sources.Tables.table(spark, sf, "documents")
      .select(col("doc_id"), col("n_chars"),
        graft.ext.NearDup.charHash(col("doc_id").cast("string")).as("h"))
      .withColumn("priority", expr("(n_chars * 1048576) div ((h % 1048576) + 1)"))
      .collect()
      .map(r => (r.getLong(0), r.getAs[Long]("priority")))
    val selected = out.map(_.getAs[Long]("doc_id")).toSet
    all.filterNot(p => selected(p._1)).foreach { case (id, pr) =>
      assert(pr <= minSelected, s"doc $id priority $pr beats cut $minSelected")
    }
    // size bias: the sample's mean weight exceeds the corpus mean
    val sampleMean = out.map(_.getAs[Long]("w")).sum.toDouble / out.length
    val corpusMean = graft.sources.Tables.table(spark, sf, "documents")
      .agg(avg("n_chars")).head().getDouble(0)
    assert(sampleMean > corpusMean)
  }
}
