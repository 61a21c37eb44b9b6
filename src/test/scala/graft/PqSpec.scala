package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.{Lloyd, Pq, PqModel}

/** PQ quality contract: the hash oracle pins the ADC geometry
  * cross-engine; this spec pins its QUALITY against the exact metric
  * the approximation targets (integer L2 on the quantized vectors —
  * same space the codebooks live in).
  *
  *  - recall@5: fraction of exact-L2 top-5 recovered by ADC top-5
  *    directly (the no-re-rank floor);
  *  - re-rank recovery: exact re-rank of the ADC top-20 candidate set
  *    must recover (almost) all of exact top-5 — the production
  *    serving shape (ADC scan → shortlist → exact re-rank), where PQ
  *    only has to keep true neighbors in the shortlist, not rank them.
  */
class PqSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"
  private val NumProbes = 20
  private val K = 5
  private val Shortlist = 40

  test("native vec_l2sq_ll == HOF squared-L2 exactly on random long vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val rows = Seq.fill(300)((
      Array.fill(8)(rnd.nextInt(40001).toLong - 20000L),
      Array.fill(8)(rnd.nextInt(40001).toLong - 20000L)))
    val df = rows.toDF("a", "b")
    val hof = aggregate(
      zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, v) => acc + v)
    val diff = df.select(
        call_function("vec_l2sq_ll", col("a"), col("b")).as("fast"),
        hof.as("ref"))
      .filter(col("fast") =!= col("ref"))
    assert(diff.isEmpty, diff.collect().take(3).mkString(","))
    // length mismatch -> null (the HOF would throw instead)
    val m = Seq((Array(1L, 2L), Array(1L))).toDF("a", "b")
      .select(call_function("vec_l2sq_ll", col("a"), col("b")).as("d"))
    assert(m.head().isNullAt(0))
  }

  test("codes are in range; one code per (vector, subspace)") {
    val qdf = Lloyd.quantized(
      graft.sources.Tables.table(spark, sf, "embeddings"))
    val enc = Pq.encode(qdf, PqModel.codebooks, PqModel.subDim)
    val n = qdf.count()
    assert(enc.count() == n * PqModel.numSubspaces)
    val bad = enc.filter(
      col("code") < 0 || col("code") >= PqModel.codebookSize).count()
    assert(bad == 0L)
  }

  test("ADC recall@5 and exact-re-rank recovery vs exact integer L2") {
    val qdf = Lloyd.quantized(
      graft.sources.Tables.table(spark, sf, "embeddings")).cache()
    try {
      val probes = qdf.filter(col("vec_id") < NumProbes)
        .select(col("vec_id").as("probe_id"), col("qv").as("probe_qv"))
      val exact = Pq.exactL2TopK(qdf, probes, K).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

      val adc5 = Pq.topK(qdf, probes, PqModel.codebooks, PqModel.subDim, K)
        .select("probe_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = (exact & adc5).size.toDouble / exact.size
      info(f"ADC recall@$K = $recall%.3f")

      // production shape: ADC shortlist → exact re-rank
      val shortlist = Pq.topK(qdf, probes, PqModel.codebooks, PqModel.subDim,
          Shortlist).select("probe_id", "vec_id")
      val dist = aggregate(
        zip_with(col("qv"), col("probe_qv"), (x, y) => (x - y) * (x - y)),
        lit(0L), (acc, v) => acc + v)
      val w = Window.partitionBy("probe_id").orderBy(col("dist"), col("vec_id"))
      val rr = shortlist
        .join(qdf, Seq("vec_id"))
        .join(probes, Seq("probe_id"))
        .withColumn("dist", dist)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= K)
        .select("probe_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val recovery = (exact & rr).size.toDouble / exact.size
      info(f"exact-re-rank recovery@$K from ADC top-$Shortlist = $recovery%.3f")

      // measured on this corpus/model: recall 0.49, recovery 0.99
      // (synthetic near-random 64-dim data is PQ's worst case — no
      // low intrinsic dimension to exploit; real text embeddings sit
      // far above this floor). The floors catch a silently degraded
      // codebook artifact or a broken encode/ADC change.
      assert(recall >= 0.40, f"ADC recall@$K $recall%.3f below floor 0.40")
      assert(recovery >= 0.95,
        f"re-rank recovery@$K $recovery%.3f below floor 0.95")
    } finally qdf.unpersist()
  }

  test("IVFADC routes correctly and keeps recall vs full-scan ADC") {
    import graft.ext.{IvfPq, IvfPqModel}
    val NProbe = 3
    val qdf = Lloyd.quantized(
      graft.sources.Tables.table(spark, sf, "embeddings")).cache()
    try {
      val probes = qdf.filter(col("vec_id") < NumProbes)
        .select(col("vec_id").as("probe_id"), col("qv").as("probe_qv"))
      val routed = IvfPq.topK(qdf, probes, IvfPqModel.coarse,
        PqModel.codebooks, PqModel.subDim, K, NProbe)

      // pruning contract: every returned neighbor's assigned cell is
      // one of its probe's nprobe routed cells
      val cells = qdf.select(col("vec_id"),
        Lloyd.assignCell(col("qv"), IvfPqModel.coarse).as("cell"))
      val pc = probes.select(col("probe_id"),
        IvfPq.probeCells(col("probe_qv"), IvfPqModel.coarse, NProbe)
          .as("routed_cells"))
      val leaks = routed.join(cells, Seq("vec_id"))
        .join(pc, Seq("probe_id"))
        .filter(!array_contains(col("routed_cells"), col("cell")))
      assert(leaks.isEmpty, leaks.collect().take(3).mkString(","))

      // quality: routing at nprobe=3/8 keeps most of what full-scan
      // ADC finds, and a usable share of exact top-K. Measured here:
      // vs-ADC 0.72, vs-exact 0.40 (near-random synthetic vectors,
      // the worst case for both quantizers — see the sim10 note).
      val full = Pq.topK(qdf, probes, PqModel.codebooks, PqModel.subDim, K)
        .select("probe_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = routed.select("probe_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val vsAdc = (full & got).size.toDouble / full.size
      val exact = Pq.exactL2TopK(qdf, probes, K).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val vsExact = (exact & got).size.toDouble / exact.size
      info(f"IVFADC recall vs full-scan ADC = $vsAdc%.3f, vs exact = $vsExact%.3f")
      assert(vsAdc >= 0.55, f"IVFADC-vs-ADC recall $vsAdc%.3f below floor 0.55")
      assert(vsExact >= 0.25, f"IVFADC-vs-exact recall $vsExact%.3f below floor 0.25")
    } finally qdf.unpersist()
  }
}
