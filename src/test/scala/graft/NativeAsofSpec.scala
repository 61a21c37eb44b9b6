package graft

import org.apache.spark.sql.functions._

import graft.ops.AsofJoin
import graft.plans.NativeAsof

/** Native as-of join contract: must agree with the composition
  * operator (ops/AsofJoin.asofBackward) on random data including
  * unmatched keys, equal-timestamp inclusivity, and null-payload
  * right rows; the physical plan must contain AsofJoinExec with one
  * exchange per side (never a union-widened single shuffle); and a
  * plain-Scala brute force pins the semantics independently of both.
  */
class NativeAsofSpec extends SparkSpec {
  import spark.implicits._

  private def randomCase(seed: Int): (Seq[(Long, Long, Long)], Seq[(Long, Long, Option[Long])]) = {
    val rnd = new scala.util.Random(seed)
    val lefts = for (i <- 1 to 120) yield
      (rnd.nextInt(8).toLong, rnd.nextInt(1000).toLong, i.toLong)
    // distinct (key, ts) on the right — as-of's uniqueness contract
    val rights = rnd.shuffle(
      (for (k <- 0L to 6L; _ <- 1 to 25) yield (k, rnd.nextInt(1000).toLong))
        .distinct.toIndexedSeq)
      .map { case (k, ts) =>
        (k, ts, if (ts % 7 == 0) None else Some(ts * 10))
      }
    (lefts, rights)
  }

  private def brute(lefts: Seq[(Long, Long, Long)],
      rights: Seq[(Long, Long, Option[Long])]): Map[(Long, Long, Long), Option[(Long, Long, Option[Long])]] =
    lefts.map { case l @ (k, ts, _) =>
      val cands = rights.filter(r => r._1 == k && r._2 <= ts)
      l -> (if (cands.isEmpty) None else Some(cands.maxBy(_._2)))
    }.toMap

  test("agrees with the composition AND a plain-Scala brute force") {
    for (seed <- Seq(3, 17, 42)) {
      val (lefts, rights) = randomCase(seed)
      val ldf = lefts.toDF("k", "ts", "lid").repartition(4)
      val rdf = rights.toDF("rk", "rts", "payload").repartition(3)

      val native = NativeAsof.asofBackward(ldf, rdf, "k", "rk", "ts", "rts")
        .collect()
        .map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)),
          if (r.isNullAt(3)) None
          else Some((r.getLong(3), r.getLong(4),
            if (r.isNullAt(5)) None else Some(r.getLong(5))))))
        .toMap

      val exp = brute(lefts, rights)
      assert(native == exp, s"seed $seed: native != brute")

      val comp = AsofJoin.asofBackward(
          ldf, rdf.withColumnRenamed("rk", "k").withColumnRenamed("rts", "ts"),
          Seq("k"), "ts", "ts", Seq("payload"))
        .collect()
        .map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)),
          (r.getBoolean(4), if (r.isNullAt(3)) None else Some(r.getLong(3)))))
        .toMap
      // composition reports (matched, payload); compare both against brute
      exp.foreach { case (l, m) =>
        val (matched, pay) = comp(l)
        assert(matched == m.isDefined, s"seed $seed $l matched mismatch")
        assert(pay == m.flatMap(_._3), s"seed $seed $l payload mismatch")
      }
    }
  }

  test("plan uses AsofJoinExec with per-side exchanges, no union/window") {
    val ldf = Seq((1L, 10L, 1L)).toDF("k", "ts", "lid").repartition(4)
    val rdf = Seq((1L, 5L, 50L)).toDF("rk", "rts", "payload").repartition(3)
    val plan = NativeAsof.asofBackward(ldf, rdf, "k", "rk", "ts", "rts")
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), s"native node missing:\n$plan")
    assert(!plan.contains("Window") && !plan.contains("Union"),
      s"native plan degraded to the composition shape:\n$plan")
  }

  test("AsofJoinPruning restores column pruning through the node") {
    // wide right side: only `payload` is consumed downstream, so the
    // optimizer must prune unused_a/unused_b below the node
    val dir = java.nio.file.Files.createTempDirectory("graft_asof_prune")
    try {
      Seq((1L, 5L, 50L, "a", 9.9)).toDF("rk", "rts", "payload", "unused_a", "unused_b")
        .write.mode("overwrite").parquet(s"$dir/r")
      val rdf = spark.read.parquet(s"$dir/r")
      val ldf = Seq((1L, 10L, 1L)).toDF("k", "ts", "lid")
      val out = NativeAsof.asofBackward(ldf, rdf, "k", "rk", "ts", "rts")
        .select("lid", "payload")
      val scan = out.queryExecution.executedPlan.toString
        .linesIterator.filter(_.contains("ReadSchema")).mkString("\n")
      assert(scan.contains("payload") && !scan.contains("unused_a"),
        s"right scan not pruned:\n$scan")
      assert(out.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
        == Seq((1L, 50L)))
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("AsofJoinPruning pushes left-only filters below the node") {
    val ldf = Seq((1L, 10L, 1L), (2L, 10L, 2L)).toDF("k", "ts", "lid")
    val rdf = Seq((1L, 5L, 50L), (2L, 5L, 60L)).toDF("rk", "rts", "payload")
    val out = NativeAsof.asofBackward(ldf, rdf, "k", "rk", "ts", "rts")
      .filter(col("lid") === 1L)
    val opt = out.queryExecution.optimizedPlan.toString
    // the filter must sit BELOW the AsofJoin node (appear after it in
    // the tree print), not above
    val asofIdx = opt.indexOf("AsofJoin")
    val filterIdx = opt.indexOf("lid")
    assert(asofIdx >= 0 && filterIdx > asofIdx,
      s"left filter not pushed below the node:\n$opt")
    assert(out.collect().map(_.getLong(2)).toSeq == Seq(1L))
    // right-side filters must NOT push (null-extension semantics)
    val out2 = NativeAsof.asofBackward(ldf, rdf, "k", "rk", "ts", "rts")
      .filter(col("payload").isNull)
    val opt2 = out2.queryExecution.optimizedPlan.toString
    assert(opt2.indexOf("isnull(payload") >= 0 &&
      opt2.indexOf("isnull(payload") < opt2.indexOf("AsofJoin"),
      s"right filter wrongly pushed:\n$opt2")
  }

  test("null left key/ts rows pass through unmatched") {
    val ldf = Seq((Option(1L), Option(10L), 1L), (None, Option(10L), 2L),
      (Option(1L), None, 3L)).toDF("k", "ts", "lid")
    val rdf = Seq((1L, 5L, 50L)).toDF("rk", "rts", "payload")
    val out = NativeAsof.asofBackward(ldf, rdf, "k", "rk", "ts", "rts")
      .collect().map(r => r.getLong(2) -> r.isNullAt(3)).toMap
    assert(out == Map(1L -> false, 2L -> true, 3L -> true))
  }

  test("numOutputRows metric counts every emitted row") {
    val ldf = Seq((1L, 10L, 1L), (1L, 20L, 2L), (2L, 5L, 3L)).toDF("k", "ts", "lid")
    val rdf = Seq((1L, 5L, 50L)).toDF("rk", "rts", "payload")
    val df = NativeAsof.asofBackward(ldf, rdf, "k", "rk", "ts", "rts")
    assert(df.count() == 3)
    // AQE hides the real tree behind AdaptiveSparkPlanExec — unwrap
    // before collecting the operator's metric
    val df2 = NativeAsof.asofBackward(ldf, rdf, "k", "rk", "ts", "rts")
    df2.collect()
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def nodes(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
      case q: QueryStageExec => nodes(q.plan)
      case other => other +: other.children.flatMap(nodes)
    }
    val m = nodes(df2.queryExecution.executedPlan).collect {
      case e: graft.plans.AsofJoinExec => e.metrics("numOutputRows").value
    }
    assert(m.nonEmpty, "AsofJoinExec not found in the executed plan")
    assert(m.forall(_ == 3L), s"metric values: $m")
  }

  test("timestamp-typed key columns work end to end") {
    val ldf = Seq((7L, "2024-01-01 10:00:00", 1L), (7L, "2024-01-01 00:00:00", 2L))
      .toDF("k", "ts", "lid").withColumn("ts", col("ts").cast("timestamp"))
    val rdf = Seq((7L, "2024-01-01 09:00:00", 90L))
      .toDF("rk", "rts", "payload").withColumn("rts", col("rts").cast("timestamp"))
    val out = NativeAsof.asofBackward(ldf, rdf, "k", "rk", "ts", "rts")
      .collect().map(r => r.getLong(2) -> r.isNullAt(3)).toMap
    assert(out == Map(1L -> false, 2L -> true))
  }
}
