package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — "attach the most recent `right` row at or before each
  * `left` row's timestamp, per key" — the time-series join Spark has
  * no built-in operator for (brief §custom-operators; kdb/Flink
  * staple).
  *
  * This is the COMPOSITION formulation (rung (a) of the escalation
  * ladder); the native physical operator now also exists
  * ([[graft.plans.AsofJoinExec]], rung (c)) and shuffles each side at
  * its own width — prefer it unless the session can't inject planner
  * strategies. Mechanics here: tag both sides, UNION, and take
  * `last(marker, ignoreNulls)` over a per-key window ordered by
  * (ts, side) with an unbounded-preceding frame, then keep the left
  * rows. The marker is a non-null STRUCT wrapping the payload columns,
  * not the payload itself — so the latest matched right row wins even
  * when its payload value is NULL (DuckDB ASOF JOIN returns the matched
  * row's NULL; filling the raw payload would skip it and carry an older
  * row's value forward). Cost is ONE hash shuffle on the key plus a
  * per-partition sort — linear and scale-safe — versus a naive range
  * join whose per-key cross product is quadratic.
  *
  * Hot-key caveat: AQE splits skewed JOIN partitions, not skewed
  * WINDOW partitions — a pathologically hot key still funnels its
  * whole history through one task's sort. [[asofBackwardBucketed]] is
  * the shipped mitigation: bucket both sides by a time epoch, as-of
  * join within each (key, bucket) partition, and seed each bucket with
  * the latest right row from strictly earlier buckets (computed over
  * per-bucket summaries, so the per-key funnel is O(#buckets), never
  * O(#rows)).
  *
  * Right rows sort before left rows at equal timestamps, so the match
  * is backward-INCLUSIVE (r.ts <= l.ts), the same contract as DuckDB's
  * `ASOF JOIN ... ON l.ts >= r.ts`, which the oracle uses. The right
  * side should be unique per (key, ts) — equal-ts duplicates make any
  * as-of semantics ambiguous.
  */
object AsofJoin {

  /** Backward-inclusive as-of join. Returns all `left` columns plus
    * `prefix+p` for every payload column `p` of `right` (null when no
    * right row precedes) and a `prefix+matched` boolean. Filter
    * `prefix+matched` for inner-asof semantics — NOT payload null-ness,
    * which cannot distinguish "no preceding right row" from "matched a
    * right row whose payload is NULL" (DuckDB's inner ASOF keeps the
    * latter).
    */
  def asofBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    import org.apache.spark.sql.types.{StructField, StructType}
    val leftCols = left.columns.toSeq
    require(!(payload :+ "matched").exists(p => leftCols.contains(prefix + p)),
      s"asof payload prefix '$prefix' collides with a left column; pass a different prefix")
    require(!leftCols.exists(Set("__ts", "__side", "__m")),
      "left columns may not use the reserved names __ts/__side/__m")
    // non-null marker struct: presence = "a right row exists at-or-before",
    // independent of whether its payload values are NULL
    val markerType = StructType(
      payload.map(p => StructField(p, right.schema(p).dataType, nullable = true)))

    val taggedRight = right.select(
      keys.map(col) ++
        Seq(col(rightTs).as("__ts"), lit(0).as("__side")) ++
        leftCols.filterNot(keys.contains).map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(payload.map(col): _*).as("__m"): _*)
    val taggedLeft = left.select(
      keys.map(col) ++
        Seq(col(leftTs).as("__ts"), lit(1).as("__side")) ++
        leftCols.filterNot(keys.contains).map(col) :+
        lit(null).cast(markerType).as("__m"): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    taggedRight.unionByName(taggedLeft)
      .withColumn("__m", last(col("__m"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        payload.map(p => col("__m").getField(p).as(prefix + p)) :+
        col("__m").isNotNull.as(prefix + "matched"): _*)
  }

  /** Hot-key-safe variant of [[asofBackward]] — identical output
    * (property-spec'd), different physics. The window partition key is
    * (keys..., time-bucket) instead of the bare key, so a key holding
    * half the corpus splits across `range/bucketSeconds` tasks instead
    * of funneling through one sort.
    *
    * Mechanics: rows bucket by `floor(epoch / bucketSeconds)`; each
    * bucket as-of joins its own right rows PLUS one seed row — the
    * latest right row from any strictly earlier bucket. Seeds are
    * derived from per-(key, bucket) argmax summaries: the only
    * stage partitioned by the bare key windows over those summaries,
    * O(#buckets) rows per key regardless of row counts.
    *
    * Cost: three shuffles (per-bucket summary agg, summary window,
    * bucketed union window) versus asofBackward's one — opt in when a
    * key's history outgrows a single task's sort (rule of thumb:
    * rows-per-hottest-key × row width ≳ a task's memory budget), and
    * size `bucketSeconds` so a bucket holds ~10⁵-10⁶ rows of the
    * hottest key.
    *
    * Unlike [[asofBackward]] (any orderable ts type), this variant
    * requires TIMESTAMP ts columns — bucketing needs an epoch number
    * (`unix_micros`), so the drop-in swap is only drop-in for
    * timestamp data; numeric-epoch callers bucket by division
    * themselves or stay on [[asofBackward]].
    */
  def asofBackwardBucketed(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String],
      bucketSeconds: Long, prefix: String = "asof_"): DataFrame = {
    import org.apache.spark.sql.types.{StructField, StructType, TimestampType}
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    require(left.schema(leftTs).dataType == TimestampType &&
        right.schema(rightTs).dataType == TimestampType,
      s"asofBackwardBucketed buckets via unix_micros and requires TIMESTAMP ts columns; " +
        s"got $leftTs: ${left.schema(leftTs).dataType.simpleString}, " +
        s"$rightTs: ${right.schema(rightTs).dataType.simpleString} " +
        "(use asofBackward for other orderable ts types)")
    val leftCols = left.columns.toSeq
    require(!(payload :+ "matched").exists(p => leftCols.contains(prefix + p)),
      s"asof payload prefix '$prefix' collides with a left column; pass a different prefix")
    require(!leftCols.exists(Set("__ts", "__side", "__m", "__bkt", "__s", "__tm", "__cm")),
      "left columns may not use the reserved names __ts/__side/__m/__bkt/__s/__tm/__cm")
    val markerType = StructType(
      payload.map(p => StructField(p, right.schema(p).dataType, nullable = true)))
    val micros = bucketSeconds * 1000000L
    def bkt(ts: Column): Column = floor(unix_micros(ts) / micros)

    val r = right.select(
        keys.map(col) ++ Seq(col(rightTs).as("__ts")) :+
          struct(payload.map(col): _*).as("__m"): _*)
      .withColumn("__bkt", bkt(col("__ts")))

    // carry candidates: latest right row per (key, bucket) — ties on
    // __ts are impossible under the unique-(key, ts) contract
    val summaries = r.groupBy((keys :+ "__bkt").map(col): _*)
      .agg(max_by(struct(col("__ts").as("ts"), col("__m").as("m")), col("__ts")).as("__tm"))

    val lbuckets = left
      .select(keys.map(col) :+ bkt(col(leftTs)).as("__bkt"): _*)
      .distinct()

    // seed per left bucket = last summary from a STRICTLY earlier
    // bucket: at equal __bkt the left-bucket probe (__s=0) orders
    // before the same bucket's summary (__s=1), excluding it
    val carryW = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__bkt"), col("__s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carries = summaries
      .select(keys.map(col) ++ Seq(col("__bkt"), lit(1).as("__s"), col("__tm")): _*)
      .unionByName(lbuckets.select(
        keys.map(col) ++ Seq(col("__bkt"), lit(0).as("__s"),
          lit(null).cast(summaries.schema("__tm").dataType).as("__tm")): _*))
      .withColumn("__cm", last(col("__tm"), ignoreNulls = true).over(carryW))
      .filter(col("__s") === 0 && col("__cm").isNotNull)
      .select(keys.map(col) ++ Seq(col("__bkt"), col("__cm")): _*)

    val nullLeft = leftCols.filterNot(keys.contains)
      .map(c => lit(null).cast(left.schema(c).dataType).as(c))
    val taggedRight = r.select(
      keys.map(col) ++ Seq(col("__bkt"), col("__ts"), lit(0).as("__side")) ++
        nullLeft :+ col("__m"): _*)
    // a seed's ts comes from an earlier bucket, so it is strictly below
    // every in-bucket right ts; __side = -1 is belt-and-braces ordering
    val taggedCarry = carries.select(
      keys.map(col) ++ Seq(col("__bkt"),
        col("__cm").getField("ts").as("__ts"), lit(-1).as("__side")) ++
        nullLeft :+ col("__cm").getField("m").as("__m"): _*)
    val taggedLeft = left.select(
      keys.map(col) ++ Seq(bkt(col(leftTs)).as("__bkt"),
        col(leftTs).as("__ts"), lit(1).as("__side")) ++
        leftCols.filterNot(keys.contains).map(col) :+
        lit(null).cast(markerType).as("__m"): _*)

    val w = Window.partitionBy((keys :+ "__bkt").map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    taggedRight.unionByName(taggedCarry).unionByName(taggedLeft)
      .withColumn("__m", last(col("__m"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        payload.map(p => col("__m").getField(p).as(prefix + p)) :+
        col("__m").isNotNull.as(prefix + "matched"): _*)
  }
}
