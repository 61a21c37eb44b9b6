package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Relational MERGE INTO (the lakehouse upsert primitive: one pass
  * applies a change feed to a snapshot — WHEN MATCHED THEN
  * UPDATE/DELETE, WHEN NOT MATCHED THEN INSERT). The diff/CDC family
  * (`diff_snapshots`) CLASSIFIES changes between two snapshots; MERGE
  * is the inverse operation — it APPLIES a classified feed, and
  * `MergeSpec` proves the round trip: merging the diff of (old, new)
  * into old rebuilds new exactly.
  *
  * Semantics per key (source `op` column: 'I' insert, 'U' update,
  * 'D' delete):
  *  - target-only key → row kept unchanged;
  *  - matched + 'U' → source payload replaces the row;
  *  - matched + 'D' → row deleted;
  *  - source-only + 'I' (or 'U' — upsert tolerance) → row inserted;
  *  - source-only + 'D' → no-op (delete of a missing key).
  *
  * Shape: ONE full-outer join on the key — both sides shuffle once on
  * the merge key and every decision is a per-row CASE over the join
  * result; no second pass, no driver state. At 100 TB this is the
  * standard copy-on-write MERGE plan (Delta/Iceberg execute exactly
  * this join before rewriting matched files); a broadcast source is
  * the AQE fast path when the change feed is small.
  *
  * The source must carry `op` plus the same payload columns as the
  * target; one row per key per batch (enforce upstream — last-writer
  * collapse is `dedup_exact_keep_first`'s job, deliberately not
  * re-done here).
  */
object Merge {

  def upsert(target: DataFrame, source: DataFrame, key: String,
      opCol: String = "op"): DataFrame = {
    val payload = target.columns.filter(_ != key).toSeq
    val t = target.select(col(key) +: payload.map(c => col(c).as(s"t_$c")): _*)
    // op contract enforced at the source scan: anything outside
    // {I,U,D} (including NULL) raises rather than silently becoming a
    // no-op / all-NULL insert — after the full_outer join a NULL
    // source op would be indistinguishable from an unmatched target row
    val checkedOp = when(col(opCol).isin("I", "U", "D"), col(opCol))
      .otherwise(raise_error(concat(
        lit("Merge.upsert: op must be one of I/U/D, got "),
        coalesce(col(opCol).cast("string"), lit("NULL")))))
    val s = source.select(
      col(key) +: (payload.map(c => col(c).as(s"s_$c")) :+ checkedOp.as("__op")): _*)
    t.join(s, Seq(key), "full_outer")
      .filter(
        // drop: matched delete; and source-only delete (no-op insert)
        col("__op").isNull || col("__op") =!= "D")
      .select(col(key) +: payload.map(c =>
        when(col("__op").isin("I", "U"), col(s"s_$c"))
          .otherwise(col(s"t_$c")).as(c)): _*)
  }
}
