package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative k-means (Lloyd) training, cross-engine exact.
  *
  * [[IvfModel]] made ANN *serving* hash-verifiable by pinning an
  * offline-fit model; this makes the distributed *training loop*
  * itself verifiable. The usual obstacle is float order-dependence
  * (centroid = mean of floats ⇒ engine-specific summation order ⇒
  * diverging models). Removed by construction:
  *
  *  - vectors are quantized once to integers
  *    (`floor(double(x)·10000)` — identical IEEE double ops both
  *    engines, then exact longs);
  *  - distances are integer sums of squares (order-invariant);
  *  - centroid update is integer floor-division `⌊Σq / n⌋`
  *    (`pmod`-based so negative sums floor identically);
  *  - argmin tie-breaks on the smaller cell id.
  *
  * Every round is therefore a pure function of the data — DuckDB
  * replays the identical rounds as an unrolled CTE and must land on
  * the identical model. Spark execution is the standard iterative-ML
  * shape: assignment is map-side (centroids are plan literals, the
  * serving trick), the update is one (cell,dim)-key aggregation, and
  * the K×D model state rides the driver between rounds (the same
  * offline-fit/online-serve split [[IvfIndex]] uses, looped).
  * Scale: per-round shuffle is K·D longs of model + one agg over
  * N·D (cell,dim) rows; rounds are fixed — O(R·N·D) total, no
  * all-pairs anything.
  */
object Lloyd {

  /** Quantization scale: embeddings are unit-ish floats, so ×10⁴
    * keeps 4 significant digits and distances ≪ 2⁶³.
    */
  val Scale = 10000

  /** vec_id + quantized integer vector `qv`. */
  def quantized(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"),
      transform(col("embedding"),
        x => floor(x.cast("double") * lit(Scale.toDouble)).cast("long")).as("qv"))

  /** Map-side assignment against literal centroids: argmin over cells
    * of the integer squared distance, ties to the smaller cell id
    * (array_min over (dist, cell) structs compares lexicographically).
    * Distances run through the native codegen'd `vec_l2sq_ll`
    * ([[graft.functions.LongVecL2Sq]]) — bit-identical to the
    * interpreted HOF formulation (spec-proved), K× per row in the
    * training hot loop.
    */
  def assignCell(qv: Column, cents: Seq[Seq[Long]]): Column = {
    val scored = cents.zipWithIndex.map { case (c, i) =>
      val dist = call_function("vec_l2sq_ll", qv, array(c.map(lit): _*))
      struct(dist.as("dist"), lit(i).as("cell"))
    }
    array_min(array(scored: _*)).getField("cell")
  }

  /** Integer floor division (column form): `(s − pmod(s,n)) div n` —
    * exact for negative sums, mirror of the SQL in [[Sql.floorDiv]].
    * `div` (IntegralDivide) keeps the whole computation in exact long
    * arithmetic; `/` would route through doubles and silently lose
    * precision past 2⁵³.
    */
  def floorDiv(s: Column, n: Column): Column =
    call_function("div", s - pmod(s, n), n).cast("long")

  /** The K smallest-vec_id quantized vectors, cell = rank order —
    * the pinned deterministic init.
    */
  def seeds(qdf: DataFrame, k: Int): Seq[Seq[Long]] =
    graft.ops.Grids.boundedRows(qdf.orderBy("vec_id").limit(k),
        k, "lloyd_seeds")
      .map(_.getSeq[Long](1).toIndexedSeq).toIndexedSeq

  /** One Lloyd update: assign with `cents`, aggregate per-(cell,dim)
    * integer sums + counts, floor-divide, keep the previous centroid
    * for cells that lost every member. The collect is the K×D model
    * state (≤ a few KB) — the only driver-side data.
    */
  def update(qdf: DataFrame, cents: Seq[Seq[Long]]): Seq[Seq[Long]] = {
    // vectors stay WHOLE through the shuffle (native vec_sum_ll
    // aggregate, map-side combine over the vector dimension): each
    // map task folds its rows into one D-long buffer per cell, so the
    // shuffle carries K×|partitions| arrays instead of n·D exploded
    // rows. Element-wise long sums are exact and associative —
    // bit-identical to the previous posexplode formulation, so the
    // unrolled-CTE oracle is untouched. The explode that remains runs
    // on the K summed arrays — constant work.
    val sums = qdf
      .withColumn("cell", assignCell(col("qv"), cents))
      .groupBy("cell")
      .agg(call_function("vec_sum_ll", col("qv")).as("sv"),
        count(lit(1)).as("n"))
      .select(col("cell"), col("n"), posexplode(col("sv")).as(Seq("d", "s")))
      .withColumn("c", floorDiv(col("s"), col("n")))
      .select("cell", "d", "c")
    val model = graft.ops.Grids.boundedRows(sums,
        cents.size * cents.headOption.map(_.size).getOrElse(1),
        "lloyd_model_state")
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    cents.zipWithIndex.map { case (prev, cell) =>
      prev.indices.map(d => model.getOrElse((cell, d), prev(d)))
    }
  }

  /** R rounds of [[update]] from the smallest-vec_id seeds over an
    * already-quantized (ideally cached) `qdf`. NOTE: training is
    * eager by nature — each round collects the K×D model state — so
    * callers constructing a lazy DataFrame around the result should
    * cache `qdf` first or every round re-scans the source.
    */
  def fitQuantized(qdf: DataFrame, k: Int, rounds: Int): Seq[Seq[Long]] = {
    var cents = seeds(qdf, k)
    for (_ <- 1 to rounds) cents = update(qdf, cents)
    cents
  }

  /** [[quantized]] + [[fitQuantized]] convenience (uncached `qdf`). */
  def fit(emb: DataFrame, k: Int, rounds: Int): (DataFrame, Seq[Seq[Long]]) = {
    val qdf = quantized(emb)
    (qdf, fitQuantized(qdf, k, rounds))
  }

  /** DuckDB mirrors: the unrolled round structure over CTEs
    * `q` (vec_id, qv) → `qd` (vec_id, d, v) → per round r:
    * `a{r}` assignment, `s{r}` sums, `c{r}` centroids.
    */
  object Sql {

    def floorDiv(s: String, n: String): String =
      s"CAST(($s - ((($s % $n) + $n) % $n)) // $n AS BIGINT)"

    /** `q` + `qd` + seed centroids `c0` (cell,d,c), 1-indexed d. */
    def base(k: Int, dim: Int): String =
      s"""q AS MATERIALIZED (SELECT vec_id, list_transform(embedding::DOUBLE[],
         |  x -> CAST(floor(x * $Scale.0) AS BIGINT)) AS qv FROM embeddings),
         |dims AS MATERIALIZED (SELECT unnest(range(1, ${dim + 1})) AS d),
         |qd AS MATERIALIZED (SELECT vec_id, d, qv[d] AS v FROM q, dims),
         |seeds AS MATERIALIZED (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, qv
         |  FROM q ORDER BY vec_id LIMIT $k),
         |c0 AS MATERIALIZED (SELECT cell, d, qv[d] AS c FROM seeds, dims)""".stripMargin

    /** Assignment `a{r}` against centroids `c{prev}` + update
      * `s{r}`/`c{r}` (floor-div, empty cells keep `c{prev}`).
      */
    def round(r: Int): String = {
      val p = r - 1
      s"""a$r AS MATERIALIZED (SELECT vec_id, cell FROM (
         |  SELECT qd.vec_id, c$p.cell,
         |    row_number() OVER (PARTITION BY qd.vec_id
         |      ORDER BY sum((qd.v - c$p.c)*(qd.v - c$p.c)), c$p.cell) AS rk
         |  FROM qd JOIN c$p ON qd.d = c$p.d GROUP BY 1, 2) WHERE rk = 1),
         |s$r AS MATERIALIZED (SELECT a$r.cell, qd.d, CAST(sum(qd.v) AS BIGINT) AS s,
         |    count(*)::BIGINT AS n
         |  FROM a$r JOIN qd USING (vec_id) GROUP BY 1, 2),
         |c$r AS MATERIALIZED (SELECT c$p.cell, c$p.d,
         |    COALESCE(${floorDiv("s", "n")}, c$p.c) AS c
         |  FROM c$p LEFT JOIN s$r ON c$p.cell = s$r.cell AND c$p.d = s$r.d)""".stripMargin
    }
  }
}
