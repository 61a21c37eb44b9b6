package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM-training-data pipelines.
  *
  * Exact dedup is a single hash-shuffle on the fingerprint key: keys are
  * md5 (uniform, high-cardinality), so there is no skew and the shuffle
  * partitions evenly at any scale — the same plan holds at 100 TB with
  * more shuffle partitions. Nothing here collects to the driver.
  *
  * Near-dup (MinHash/SimHash) lives in [[NearDup]]; both consume the
  * same tokenization ([[TextAnalysis.tokens]]).
  */
object Dedup {

  /** Keep-first exact dedup: one row per `key`, the row with the
    * smallest `order` values (deterministic, unlike `dropDuplicates`
    * which keeps an arbitrary row). `row_number` over a hash-partitioned
    * window — one shuffle, streaming-friendly rank, no full sort.
    */
  def exactKeepFirst(df: DataFrame, key: Seq[Column], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(key: _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Duplication summary over a fingerprint column: total rows, distinct
    * fingerprints, duplicate rows (total − distinct). Two-stage
    * aggregation (groupBy fingerprint, then global) — exact counts with
    * map-side partial aggregation, never a driver-side distinct. For a
    * cheap estimate at extreme scale use [[approxDistinct]] instead.
    */
  def exactSummary(df: DataFrame, fingerprint: Column): DataFrame =
    df.groupBy(fingerprint.as("__fp"))
      .agg(count(lit(1)).as("__c"))
      .agg(sum(col("__c")).as("n_rows"),
           count(lit(1)).as("n_unique"),
           (sum(col("__c")) - count(lit(1))).as("n_dup_rows"))

  /** HLL++ distinct-fingerprint estimate (`approx_count_distinct`) —
    * the constant-memory scale path for "how much dup is in this 100 TB
    * crawl" triage before paying for the exact shuffle.
    */
  def approxDistinct(df: DataFrame, fingerprint: Column, rsd: Double = 0.05): DataFrame =
    df.agg(approx_count_distinct(fingerprint, rsd).as("approx_unique"),
           count(lit(1)).as("n_rows"))

  /** Streaming exact dedup: keep the first arrival per fingerprint on
    * an unbounded stream. `dropDuplicatesWithinWatermark` bounds the
    * dedup state to the watermark horizon — the only way stateful
    * dedup survives an unbounded 100 TB/day stream (unbounded-state
    * `dropDuplicates` would OOM; beyond-horizon re-arrivals are
    * accepted as the documented tradeoff).
    */
  def streamingExactDedup(stream: DataFrame, fingerprint: Column,
      tsCol: String, watermarkDelay: String): DataFrame =
    stream.withColumn("__fp", fingerprint)
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")

  /** Connected components over an undirected edge list — the step that
    * turns near-dup PAIRS into dedup GROUPS (transitive closure: if
    * a~b and b~c, all three are one duplicate cluster and one canonical
    * representative survives). Returns one row per node appearing in
    * any edge: (node, component), component = smallest node id in the
    * cluster — so `node === component` selects the canonical doc.
    *
    * Algorithm: iterative min-label propagation. Each round every node
    * takes the min of its own label and its neighbors' labels (one
    * shuffle on the node key per round); the smallest id floods one hop
    * per round, so rounds = cluster diameter — for dup clusters
    * (cliques-ish around a shared shingle core) that is 2-4, never the
    * log-n worst case of arbitrary graphs. Lineage is cut per round
    * with `localCheckpoint` (an iterative plan otherwise grows
    * exponentially); on a cluster prefer reliable `checkpoint` so a
    * lost executor replays one round, not the whole history. Stops
    * early the first round no label changes; `maxIter` bounds
    * pathological chains (and is itself the documented diameter
    * ceiling: a chain of near-identical docs longer than maxIter hops
    * splits — raise maxIter or pre-cluster by exact fingerprint first).
    *
    * Checkpoint blocks live OUTSIDE the CacheManager (clearCache never
    * frees them), so each superseded round is released by RDD handle —
    * without that a 20-round run holds 20 full label copies for the
    * life of the session. Only the returned frame's blocks (one copy)
    * stay resident. Handles come from diffing
    * `sc.getPersistentRDDs` around each eager checkpoint — sound when
    * nothing else persists concurrently. NOT safe under concurrent
    * persist/checkpoint activity on the same SparkContext: a foreign
    * RDD id landing in the diff window gets unpersisted here, and for
    * a localCheckpointed RDD (lineage truncated) that destroys its
    * only copy — the foreign job then fails with a missing checkpoint
    * block. Run concurrent CC jobs in separate sessions, or serialize
    * them.
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 20): DataFrame = {
    val sc = edges.sparkSession.sparkContext
    def tracked(body: => DataFrame): (DataFrame, Seq[org.apache.spark.rdd.RDD[_]]) = {
      val before = sc.getPersistentRDDs.keySet
      val df = body
      val added = sc.getPersistentRDDs.collect {
        case (id, r) if !before(id) => r
      }.toSeq
      (df, added)
    }
    val (sym, symRdds) = tracked(
      edges.select(col(srcCol).as("node"), col(dstCol).as("nbr"))
        .unionAll(edges.select(col(dstCol).as("node"), col(srcCol).as("nbr")))
        .localCheckpoint())
    var (labels, labelRdds) = tracked(
      sym.select(col("node")).distinct()
        .withColumn("comp", col("node"))
        .localCheckpoint())
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val viaNbr = sym.join(labels.select(col("node").as("nbr"), col("comp")), "nbr")
        .select("node", "comp")
      val (next, nextRdds) = tracked(
        labels.select("node", "comp").unionAll(viaNbr)
          .groupBy("node").agg(min("comp").as("comp"))
          .localCheckpoint())
      converged = next
        .join(labels.select(col("node"), col("comp").as("prev")), "node")
        .filter(col("comp") =!= col("prev"))
        .isEmpty
      labelRdds.foreach(_.unpersist(blocking = false))
      labels = next
      labelRdds = nextRdds
      iter += 1
    }
    symRdds.foreach(_.unpersist(blocking = false))
    labels
  }

  /** Canonical-keep summary for a near-dup'd corpus: total docs, dup
    * clusters, docs removed (cluster size − 1 each), docs kept. The
    * flagship end-of-pipeline number a 100 TB dedup run reports.
    */
  def keepCanonicalSummary(docs: DataFrame, components: DataFrame): DataFrame = {
    val removed = components.filter(col("node") =!= col("comp"))
      .agg(count(lit(1)).as("__removed"))
    docs.agg(count(lit(1)).as("n_docs"))
      .crossJoin(components.agg(countDistinct(col("comp")).as("n_clusters")))
      .crossJoin(removed)
      .select(col("n_docs"), col("n_clusters"),
        col("__removed").as("n_removed"),
        (col("n_docs") - col("__removed")).as("n_kept"))
  }
}
