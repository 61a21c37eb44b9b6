package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.{IvfIndex, IvfModel}

/** Round-10 verdict ask 7: the refit gate behind sim26_ivf_incremental
  * must actually discriminate — a batch drawn from the FITTED
  * distribution trips nothing, a drifted batch trips. Both directions,
  * so the gate can neither cry wolf on every ingest nor sleep through
  * the geometry break it exists to catch.
  */
class IvfMaintenanceSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def cellShares(df: DataFrame, cname: String): DataFrame =
    df.select(IvfIndex.assign(col("embedding"), IvfModel.centroids).as("cell"))
      .groupBy("cell").agg(count(lit(1)).as(cname))

  /** Number of cells tripping `n_new·TB > 2·n_base·TF` (the sim26
    * cross-multiplied integer gate) for a given arrival batch.
    */
  private def trippedCells(base: DataFrame, fresh: DataFrame): Long = {
    val spine = spark.range(0, IvfModel.nlist.toLong)
      .select(col("id").cast("int").as("cell"))
    val occ = spine
      .join(cellShares(base, "n_base"), Seq("cell"), "left")
      .join(cellShares(fresh, "n_new"), Seq("cell"), "left")
      .select(col("cell"),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_new"), lit(0L)).as("n_new"))
    val tot = occ.agg(sum("n_base").as("tb"), sum("n_new").as("tf"))
    occ.crossJoin(broadcast(tot))
      .select(when(col("n_new") * col("tb") > lit(2L) * col("n_base") * col("tf"),
        1L).otherwise(0L).as("f"))
      .agg(sum("f")).head().getLong(0)
  }

  test("same-distribution arrivals trip NO refit flag") {
    val e = graft.sources.Tables.table(spark, sf, "embeddings")
      .select("vec_id", "embedding")
    // the batch IS the fitted distribution: per-cell shares are equal
    // by construction, so n_new*TB == n_base*TF exactly in BIGINT —
    // the gate's quiet direction is deterministic, not probabilistic
    assert(trippedCells(e, e) == 0L)
  }

  test("a drifted arrival batch trips the refit gate") {
    val e = graft.sources.Tables.table(spark, sf, "embeddings")
      .select("vec_id", "embedding")
    val rot = concat(slice(col("embedding"), 2, 63), slice(col("embedding"), 1, 1))
    val drifted = e.select(col("vec_id"),
      zip_with(col("embedding"), rot,
        (x, y) => (x.cast("double") + lit(1.0) * y.cast("double"))
          .cast("float")).as("embedding"))
    val n = trippedCells(e, drifted)
    assert(n > 0L, s"drifted corpus must trip at least one cell, got $n")
  }
}
