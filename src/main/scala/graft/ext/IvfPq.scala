package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IVFADC — the combined coarse-quantizer + product-quantization ANN
  * serving architecture (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011): IVF routing prunes WHICH
  * codes a probe scores (nprobe/nlist of the corpus), PQ compresses
  * WHAT is stored (M byte-codes per vector). [[IvfIndex]] and [[Pq]]
  * each carry one half; billion-vector production systems (FAISS
  * `IndexIVFPQ`) always run them together, because neither half
  * alone survives 100 TB: full-scan ADC still touches every code,
  * and IVF over raw vectors still stores every float.
  *
  * Cross-engine exact by the [[Lloyd]] construction end to end: the
  * coarse quantizer is a pinned integer centroid set
  * ([[IvfPqModel]], fit offline by `graft.DevFitIvfPq`), cell
  * assignment and probe routing are integer argmins (ties to the
  * smaller cell — [[Lloyd.assignCell]]), and the ADC half reuses
  * [[Pq]]'s integer codebooks, so the whole
  * route → encode → LUT → ADC → rank pipeline is a pure integer
  * function of the data that DuckDB replays bit-exactly.
  *
  * Shape: cell assignment is map-side (8 inlined literal centroids,
  * native `vec_l2sq_ll`); the probe→cell fan-out and the candidate
  * set are bounded by |probes|·nprobe·cell-occupancy and broadcast;
  * the codes table joins the broadcast candidate list on vec_id, so
  * candidate pruning happens map-side against the full code scan
  * with no shuffle. At rest a production layout stores the codes
  * table clustered BY cell (partition pruning then makes the scan
  * itself nprobe/nlist — the [[Bucketing]] discipline); computing
  * the cell inline here keeps the oracle single-pass.
  */
object IvfPq {

  /** Top-nprobe coarse cells for a probe vector, nearest first —
    * integer L2, ties to the smaller cell (lexicographic struct
    * sort, the [[Lloyd.assignCell]] rule one rank deeper).
    */
  def probeCells(qv: Column, cents: Seq[Seq[Long]], nprobe: Int): Column = {
    val scored = cents.zipWithIndex.map { case (c, i) =>
      struct(
        call_function("vec_l2sq_ll", qv, array(c.map(lit): _*)).as("dist"),
        lit(i).as("cell"))
    }
    transform(slice(array_sort(array(scored: _*)), 1, nprobe),
      s => s.getField("cell"))
  }

  /** IVF-routed ADC top-k: assign the corpus to coarse cells, route
    * each probe to its nprobe nearest cells, restrict the PQ code
    * scan to candidates sharing a routed cell, ADC-rank the
    * survivors. Output (probe_id, vec_id, adc_dist, rk) — all
    * integers, hash-exact. Expects `qdf` (vec_id, qv) quantized
    * ([[Lloyd.quantized]]) and `probes` (probe_id, probe_qv).
    */
  def topK(qdf: DataFrame, probes: DataFrame, coarse: Seq[Seq[Long]],
      codebooks: Seq[Seq[Seq[Long]]], subDim: Int, k: Int,
      nprobe: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = qdf.select(col("vec_id"),
      Lloyd.assignCell(col("qv"), coarse).as("cell"))
    val pc = probes.select(col("probe_id"),
      explode(probeCells(col("probe_qv"), coarse, nprobe)).as("cell"))
    val cand = pc.join(cells, Seq("cell"))
      .filter(col("vec_id") =!= col("probe_id"))
      .select("probe_id", "vec_id")
    val enc = Pq.encode(qdf, codebooks, subDim)
    val lut = Pq.probeLut(probes, codebooks, subDim)
    val withCand = enc.join(broadcast(cand), Seq("vec_id"))
    val scored = withCand.join(broadcast(lut),
        withCand("probe_id") === lut("probe_id") &&
          withCand("m") === lut("m") && withCand("code") === lut("j"))
      .groupBy(withCand("probe_id"), col("vec_id"))
      .agg(sum(lut("ds")).as("adc_dist"))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("adc_dist"), col("vec_id"))
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select("probe_id", "vec_id", "adc_dist", "rk")
  }

  /** DuckDB mirrors of the routing half (the ADC half reuses
    * [[Pq.Sql.base]]'s `q`/`dist`/`enc` CTEs).
    */
  object Sql {

    /** Coarse centroids as a `cc(cell, i, c)` literal table — one
      * row per (cell, 1-based dim).
      */
    def ccValues(coarse: Seq[Seq[Long]]): String = {
      val rows = for {
        (cent, cell) <- coarse.zipWithIndex
        (c, i) <- cent.zipWithIndex
      } yield s"($cell,${i + 1},$c)"
      s"cc(cell, i, c) AS (VALUES ${rows.mkString(",")})"
    }

    /** Routing CTEs over [[Pq.Sql.base]]'s `q`: per-(vector, cell)
      * integer distances `cd`, corpus assignment `asg` (argmin, ties
      * to the smaller cell), probe routing `pcells` (top-nprobe,
      * same tie rule). `probePred` selects the probe vectors.
      */
    def routing(coarse: Seq[Seq[Long]], nprobe: Int,
        probePred: String): String =
      s"""${ccValues(coarse)},
         |cd AS (SELECT q.vec_id, cc.cell,
         |    sum((q.qv[cc.i] - cc.c) * (q.qv[cc.i] - cc.c)) AS ds
         |  FROM q, cc GROUP BY 1, 2),
         |asg AS (SELECT vec_id, cell FROM (
         |  SELECT vec_id, cell,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY ds, cell) AS rk
         |  FROM cd) WHERE rk = 1),
         |pcells AS (SELECT vec_id AS probe_id, cell FROM (
         |  SELECT vec_id, cell,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY ds, cell) AS rk
         |  FROM cd WHERE $probePred) WHERE rk <= $nprobe)""".stripMargin
  }
}
