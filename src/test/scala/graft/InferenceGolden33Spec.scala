package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Published-value micro-goldens, part 33 — the hand-rolled
  * metric/correction tail. Anchors:
  *
  *  - a61 (Benjamini–Hochberg 1995): the ENTIRE chain — randomization
  *    p per segment pair (the pinned hash reassignments), tie-broken
  *    BH ranks, k* = max{r : p_(r) ≤ α·r/m} as 5c ≤ 4r, reject ranks
  *    ≤ k* — replayed independently in plain Scala on a hand corpus;
  *    identical-distribution pairs must read p = 1 exactly.
  *  - t_forecast_skill (Theil's U2 shape): both ends by hand — a
  *    24-periodic non-constant series has zero seasonal-naive error
  *    (skill 0), an anti-phase series is persistence-dominated
  *    (skill 24 on the constructed grid).
  *  - sim17 (Järvelin–Kekäläinen NDCG): the ceiling theorem (system
  *    ranking ≡ ideal ⇒ ndcg = mrr = 1, n_hits = 5 — the identical-
  *    vector corpus forces it through the REAL IVF path), and the
  *    short-corpus miss case with the hand integer DCG 9885074 over
  *    the published ideal 10271927.
  *  - sim25 (Davies–Bouldin 1979): the index replayed imperatively —
  *    assignment argmin, RMS scatter, centroid distances, worst-ratio
  *    max, K-term mean — against the same pinned Lloyd fit.
  *  - tx38 (Ayer 1955 / PAV): the closed-form max-min isotonic fit
  *    equals the SEQUENTIAL pool-adjacent-violators stack algorithm,
  *    replayed on the sf0.01 reliability bins (which contain a real
  *    violator pool: buckets 8-9 at this corpus).
  */
@graft.Golden
class InferenceGolden33Spec extends SparkSpec {

  private def fixture(name: String, tables: (String, DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"golden33_$name").toString
    tables.foreach { case (t, df) =>
      df.coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  private def run(q: String, dir: String): Array[Row] =
    try SparkEntry.queries(q)(spark, dir).collect()
    finally {
      graft.queries.ParityQueries.releaseCaches()
      graft.queries.EventQueries.releaseCaches()
      graft.queries.TextQueries.releaseCaches()
      graft.queries.SimilarityQueries.releaseCaches()
      spark.catalog.clearCache()
    }

  private def r6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  // ===================================================================
  // a61: full independent BH replay
  // ===================================================================

  private val Segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE",
    "HOUSEHOLD", "MACHINERY")
  private def sid(s: String): Long = (Segs.indexOf(s) + 1).toLong

  /** Plain-Scala replay of the whole a61 chain over (ok, seg, cents)
    * rows. Throws if any permutation empties a side (the fixture must
    * avoid the 0/0 regime where engine NaN semantics could differ).
    */
  private def bhReplay(rows: Seq[(Long, String, Long)])
      : Seq[(String, String, Long, Long, Double, Long, Double, Long, Long)] = {
    val segs = rows.map(_._2).distinct.sorted
    val pairs = for (pa <- segs; pb <- segs if pa < pb)
      yield (pa, pb, sid(pa) * 6L + sid(pb))
    val pv = pairs.map { case (pa, pb, pid) =>
      val px = rows.collect { case (ok, seg, v) if seg == pa || seg == pb =>
        (ok, v, if (seg == pa) 1L else 0L)
      }
      val na = px.count(_._3 == 1L).toLong
      val nb = px.count(_._3 == 0L).toLong
      def gapOf(grp: (Long, Long, Long) => Long): Double = {
        val a = px.filter(t => grp(t._1, t._2, t._3) == 1L)
        val b = px.filter(t => grp(t._1, t._2, t._3) == 0L)
        require(a.nonEmpty && b.nonEmpty, s"degenerate permutation in fixture ($pa,$pb)")
        math.abs(a.map(_._2).sum.toDouble / a.size.toDouble
          - b.map(_._2).sum.toDouble / b.size.toDouble)
      }
      val tObs = gapOf((_, _, g) => g)
      val c = 1L + (1L to 39L).count { k =>
        val tk = gapOf((ok, _, _) =>
          if ((ok * 2654435761L + k * 40503L + pid * 97L) % 1000000007L
            % (na + nb) < na) 1L else 0L)
        tk >= tObs
      }.toLong
      (pa, pb, na, nb, tObs, c)
    }
    val ranked = pv.map { case t @ (pa, pb, _, _, _, c) =>
      val r = pv.count { case (pa2, pb2, _, _, _, c2) =>
        c2 < c || (c2 == c && (pa2 < pa || (pa2 == pa && pb2 <= pb)))
      }.toLong
      (t, r)
    }
    val ks = ranked.collect { case ((_, _, _, _, _, c), r) if c * 5L <= r * 4L => r }
      .reduceOption(math.max(_: Long, _: Long)).getOrElse(0L)
    ranked.map { case ((pa, pb, na, nb, tObs, c), r) =>
      (pa, pb, na, nb, r6(tObs / 100.0), c, r6(c.toDouble / 40.0), r,
        if (r <= ks) 1L else 0L)
    }.sortBy { case (pa, pb, _, _, _, _, _, r, _) => (r, pa, pb) }
  }

  test("a61_bh_fdr == the independent plain-Scala BH replay on a hand " +
      "corpus; identical-distribution pairs read p = 1 exactly") {
    import spark.implicits._
    // 5 segments x 8 orders; BUILDING at $900, everyone else $100 —
    // the 4 BUILDING pairs separate, the 6 identical pairs have
    // t_obs = 0 so EVERY permutation ties it: c = 40, p = 1
    val rows: Seq[(Long, String, Long)] = for {
      (seg, si) <- Segs.zipWithIndex
      j <- 0 until 8
    } yield ((si * 8 + j + 1).toLong, seg,
      if (seg == "BUILDING") 90000L else 10000L)
    val cust = Segs.zipWithIndex
      .map { case (seg, i) => ((i + 1).toLong, seg) }
      .toDF("c_custkey", "c_mktsegment")
    val ords = rows.map { case (ok, seg, v) =>
      (ok, sid(seg), v.toDouble / 100.0)
    }.toDF("o_orderkey", "o_custkey", "o_totalprice")
    val out = run("a61_bh_fdr", fixture("bh", "customer" -> cust, "orders" -> ords))
      .map(r => (r.getAs[String]("pa"), r.getAs[String]("pb"),
        r.getAs[Long]("na"), r.getAs[Long]("nb"), r.getAs[Double]("gap"),
        r.getAs[Long]("p_cnt"), r.getAs[Double]("p_emp"),
        r.getAs[Long]("bh_rank"), r.getAs[Long]("rejected"))).toSeq
    val expected = bhReplay(rows)
    assert(out == expected)
    // the identical pairs are exactly the 6 non-BUILDING ones: p = 1
    val identical = out.filter(r => r._1 != "BUILDING" && r._2 != "BUILDING")
    assert(identical.size == 6 && identical.forall(r => r._7 == 1.0 && r._9 == 0L))
    // the separated pairs all involve BUILDING and are rejected
    val sep = out.filter(r => r._1 == "BUILDING" || r._2 == "BUILDING")
    assert(sep.size == 4 && sep.forall(_._9 == 1L))
  }

  // ===================================================================
  // t_forecast_skill: both ends by hand
  // ===================================================================

  private val Day0 = 1704067200L // divisible by 3600

  private def eventsHourly(countOfHour: Int => Int): DataFrame = {
    import spark.implicits._
    val rows = for {
      hr <- 0 until 48
      j <- 0 until countOfHour(hr)
    } yield ((hr * 100 + j).toLong, Day0 + hr * 3600L + j,
      (j % 5).toLong, "view", 1.0)
    rows.toDF("event_id", "sec", "user_id", "event_type", "value")
      .select(col("event_id"), timestamp_seconds(col("sec")).as("ts"),
        col("user_id"), col("event_type"), col("value"), lit("{}").as("props"))
  }

  test("t_forecast_skill ends: a 24-periodic non-constant series has " +
      "skill 0 (seasonal-naive perfect); an anti-phase series reads " +
      "skill 24 on the constructed grid") {
    // parity series 1,3,1,3,…: l24 lands on the same parity → 0 error
    val seasonal = run("t_forecast_skill",
      fixture("fsk1", "events" -> eventsHourly(hr => if (hr % 2 == 0) 1 else 3)))
    assert(seasonal.length == 1)
    val s = seasonal.head
    assert(s.getAs[Long]("n") == 24L)
    assert(s.getAs[Long]("mae1_sum") == 48L)  // |1-3| = 2 per aligned row
    assert(s.getAs[Long]("mae24_sum") == 0L)
    assert(s.getAs[Double]("skill_u2") == 0.0)
    // step series 1×24 then 3×24: the 24-lag is always cross-step
    val anti = run("t_forecast_skill",
      fixture("fsk2", "events" -> eventsHourly(hr => if (hr < 24) 1 else 3)))
    val a = anti.head
    assert(a.getAs[Long]("n") == 24L)
    assert(a.getAs[Long]("mae1_sum") == 2L)   // only the hr-24 step
    assert(a.getAs[Long]("mae24_sum") == 48L)
    assert(a.getAs[Double]("skill_u2") == 24.0)
  }

  // ===================================================================
  // sim17: NDCG ceiling + hand miss case
  // ===================================================================

  /** All vectors identical (first coord 1000): every cosine is exactly
    * 1, both rankings tie-break to ascending vec_id, and all vectors
    * share one IVF cell so the system candidates are complete.
    */
  private def identicalEmb(n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      (i.toLong, Array.tabulate(64)(d => if (d == 0) 1000.0f else 0.0f), 1)
    }.toDF("vec_id", "embedding", "label")
  }

  test("sim17_ranking_ndcg ceiling: system ranking == ideal ranking " +
      "through the real IVF path => ndcg = mrr = 1, n_hits = 5") {
    val out = run("sim17_ranking_ndcg", fixture("ndcg1", "embeddings" -> identicalEmb(10)))
    assert(out.length == 5)
    out.foreach { r =>
      assert(r.getAs[Double]("ndcg") == 1.0)
      assert(r.getAs[Double]("mrr") == 1.0)
      assert(r.getAs[Long]("n_hits") == 5L)
    }
  }

  test("sim17_ranking_ndcg miss case: a 4-candidate corpus scores the " +
      "hand integer DCG 9885074 over the published ideal 10271927") {
    // rel 5,4,3,2 at ranks 1-4: 5·1000000 + 4·630930 + 3·500000
    // + 2·430677 = 9885074; rank-5 slot empty on both sides
    val out = run("sim17_ranking_ndcg", fixture("ndcg2", "embeddings" -> identicalEmb(5)))
    assert(out.length == 5)
    out.foreach { r =>
      assert(r.getAs[Double]("ndcg") == r6(9885074.0 / 10271927.0))
      assert(r.getAs[Double]("mrr") == 1.0)
      assert(r.getAs[Long]("n_hits") == 4L)
    }
  }

  // ===================================================================
  // sim25: Davies-Bouldin replayed imperatively against the same fit
  // ===================================================================

  test("sim25_davies_bouldin == the imperative DB replay (assignment " +
      "argmin, RMS scatter, centroid distances, worst ratio, K-mean)") {
    import spark.implicits._
    // three separated 64-dim groups of four (coords chosen so the
    // x10000 quantization is exact); K = 4, rounds = 2 — the sim9/
    // sim25 pinned constants
    val vecs: Seq[(Long, Array[Float])] = (0 until 12).map { i =>
      val g = i / 4
      val base = Array.fill(64)(0.0f)
      base(g) = 10.0f + (i % 4).toFloat * 0.125f // exact in float AND x1e4
      base(63) = 1.0f
      (i.toLong, base)
    }
    val df = vecs.map { case (id, a) => (id, a, (id % 4).toInt) }
      .toDF("vec_id", "embedding", "label")
    val out = run("sim25_davies_bouldin", fixture("db", "embeddings" -> df))
      .map(r => r.getAs[Long]("cell") ->
        (r.getAs[Long]("n_members"), r.getAs[Double]("s_rms"),
          r.getAs[Double]("max_ratio"), r.getAs[Double]("db_index"))).toMap
    // replay: quantize, re-fit with the library (the fit itself is
    // LloydSpec-anchored), then derive the METRIC independently
    val qv: Map[Long, Array[Long]] = vecs.map { case (id, a) =>
      id -> a.map(x => math.floor(x.toDouble * 10000.0).toLong)
    }.toMap
    val qdf = graft.ext.Lloyd.quantized(df)
    val cents = graft.ext.Lloyd.fitQuantized(qdf, 4, 2)
    def cellOf(v: Array[Long]): Int =
      cents.zipWithIndex.map { case (c, i) =>
        (c.zip(v).map { case (ci, vi) => val d = vi - ci; d * d }.sum, i)
      }.min._2
    val members = qv.toSeq.map { case (id, v) => (cellOf(v), id, v) }
      .groupBy(_._1)
    val si = members.map { case (cell, xs) =>
      val ss = xs.map { case (_, _, v) =>
        v.zip(cents(cell)).map { case (vi, ci) => val d = vi - ci; d * d }.sum
      }.sum
      cell -> (xs.size.toLong, math.sqrt(ss.toDouble / xs.size.toDouble))
    }
    def dij(i: Int, j: Int): Double = math.sqrt(
      cents(i).zip(cents(j)).map { case (a, b) => val d = a - b; (d * d).toDouble }.sum)
    val mr = si.keys.map { i =>
      i -> si.keys.filter(_ != i).map(j => (si(i)._2 + si(j)._2) / dij(i, j)).max
    }.toMap
    val db = mr.values.sum / mr.size.toDouble
    assert(si.size >= 2, "fixture must occupy at least two cells")
    val expected = si.map { case (cell, (n, s)) =>
      cell.toLong -> ((n, r6(s), r6(mr(cell)), r6(db)))
    }
    assert(out == expected)
  }

  // ===================================================================
  // tx38: closed-form isotonic == the sequential PAV stack
  // ===================================================================

  test("tx38_isotonic_calibration: the max-min closed form equals the " +
      "sequential PAV stack on the sf0.01 bins (real violator pool)") {
    val out = run("tx38_isotonic_calibration", "/root/testdata/sf0.01")
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("n"),
        r.getAs[Double]("raw_rate"), r.getAs[Double]("iso_rate")))
    assert(out.nonEmpty)
    // reconstruct np exactly from the 6-dp rate (n << 1e6 here)
    val bins = out.map { case (_, n, raw, _) =>
      (n, math.rint(raw * n.toDouble).toLong)
    }
    // Ayer's pool-adjacent-violators, the sequential stack form
    val stack = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
    bins.foreach { case (n, np) =>
      stack += ((n, np, 1))
      while (stack.size >= 2 && {
        val (n2, p2, _) = stack(stack.size - 1)
        val (n1, p1, _) = stack(stack.size - 2)
        p1.toDouble / n1.toDouble > p2.toDouble / n2.toDouble
      }) {
        val (n2, p2, c2) = stack.remove(stack.size - 1)
        val (n1, p1, c1) = stack.remove(stack.size - 1)
        stack += ((n1 + n2, p1 + p2, c1 + c2))
      }
    }
    val pav = stack.flatMap { case (n, np, c) =>
      Seq.fill(c)(np.toDouble / n.toDouble)
    }
    assert(pav.size == out.size)
    out.zip(pav).foreach { case ((b, _, _, iso), expect) =>
      assert(iso == r6(expect), s"bucket $b: iso $iso != pav ${r6(expect)}")
    }
    // the anchor has teeth only if the corpus actually pools somewhere
    assert(out.exists { case (_, _, raw, iso) => raw != iso },
      "sf0.01 bins no longer contain a violator - move this anchor to a crafted fixture")
  }
}
