package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Native as-of join — rung (c) of the custom-operator escalation
  * ladder (compose < custom Expression < custom LogicalPlan + Rule/
  * Strategy + SparkPlan < mapPartitions): a whole-operator physical
  * implementation of "attach the most recent right row at or before
  * each left row's timestamp, per key", planned through a
  * `SparkStrategy` and executed by a streaming two-pointer merge.
  *
  * Why a physical operator when [[graft.ops.AsofJoin.asofBackward]]
  * (the composition) already exists: the composition UNIONs both
  * sides into one frame, which means every RIGHT row is padded with
  * nulls for every LEFT column (and vice versa) BEFORE the shuffle —
  * the shuffled bytes are |l+r| rows × (l-width + r-width). The
  * native operator shuffles each side at its own width and holds ONE
  * candidate row per key instead of window state. Each child
  * declares `ClusteredDistribution(key)` + (key, ts) child ordering,
  * so EnsureRequirements co-partitions the two sides exactly as it
  * does for a sort-merge join, and a pre-partitioned/bucketed child
  * plans with no Exchange at all.
  *
  * Semantics (backward-INCLUSIVE, the DuckDB `ASOF JOIN ... ON
  * l.ts >= r.ts` contract, same as the composition): output =
  * left columns ++ right columns (right all-nullable); a left row
  * with no preceding right row carries nulls — the matched test is
  * "right KEY column is non-null" (null-keyed/null-ts right rows are
  * skipped, so a matched row always carries its key). Key and ts
  * must be long-backed types (bigint / timestamp); the
  * [[NativeAsof]] wrapper enforces this at construction.
  *
  * Skew: one hot key still funnels through one task here (exactly
  * like SMJ); the bucketed composition variant remains the shipped
  * mitigation for that regime (AsofJoin.asofBackwardBucketed).
  */
case class AsofJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTs: Attribute,
    rightTs: Attribute)
    extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsofJoinNode]] → [[AsofJoinExec]]; injected via
  * `SparkSessionExtensions.injectPlannerStrategy` (fresh sessions)
  * and `spark.experimental.extraStrategies` (pre-existing sessions —
  * the GraftFunctions.ensureRegistered path).
  */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsofJoinNode =>
      AsofJoinExec(n.leftKey, n.rightKey, n.leftTs, n.rightTs,
        planLater(n.left), planLater(n.right)) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(
    leftKey: Attribute,
    rightKey: Attribute,
    leftTs: Attribute,
    rightTs: Attribute,
    left: SparkPlan,
    right: SparkPlan)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  /** Both sides clustered on their key — EnsureRequirements
    * co-partitions them (SMJ's contract), or plans NO exchange when a
    * child already satisfies it (bucketed reads, reused shuffles).
    */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  /** (key, ts) within each partition — the merge's precondition. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val lKeyOrd = left.output.indexWhere(_.exprId == leftKey.exprId)
    val lTsOrd = left.output.indexWhere(_.exprId == leftTs.exprId)
    val rKeyOrd = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rTsOrd = right.output.indexWhere(_.exprId == rightTs.exprId)
    require(Seq(lKeyOrd, lTsOrd, rKeyOrd, rTsOrd).forall(_ >= 0),
      "asof key/ts attribute not found in child output")
    val rightWidth = right.output.size
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightWidth)
      // UnsafeProjection so downstream row-based consumers (exchange,
      // agg buffers) always see UnsafeRow, as SMJ's result projection
      val project = UnsafeProjection.create(outAttrs, outAttrs)

      // right-side lookahead, skipping null key/ts rows
      var rHead: InternalRow = null
      var rHeadKey = 0L
      var rHeadTs = 0L
      def advance(): Unit = {
        rHead = null
        while (rHead == null && rIter.hasNext) {
          val r = rIter.next()
          if (!r.isNullAt(rKeyOrd) && !r.isNullAt(rTsOrd)) {
            rHead = r
            rHeadKey = r.getLong(rKeyOrd)
            rHeadTs = r.getLong(rTsOrd)
          }
        }
      }
      advance()

      // last right row popped for the current key region — sorted
      // inputs make a forward-only pointer sufficient: every right
      // row with key < lk precedes the lk region, so a stale
      // candidate is detected by candKey != lk, never revisited
      var candidate: InternalRow = null
      var candKey = 0L

      lIter.map { l =>
        val out =
          if (l.isNullAt(lKeyOrd) || l.isNullAt(lTsOrd)) joined(l, nullRight)
          else {
            val lk = l.getLong(lKeyOrd)
            val lts = l.getLong(lTsOrd)
            while (rHead != null &&
                (rHeadKey < lk || (rHeadKey == lk && rHeadTs <= lts))) {
              candidate = rHead.copy()
              candKey = rHeadKey
              advance()
            }
            if (candidate != null && candKey == lk) joined(l, candidate)
            else joined(l, nullRight)
          }
        numOutputRows += 1
        project(out)
      }
    }
  }
}

/** Public construction API for the native as-of join. */
object NativeAsof {
  import org.apache.spark.sql.{DataFrame, functions => F}

  private val LongBacked = Set[org.apache.spark.sql.types.DataType](
    LongType, TimestampType, TimestampNTZType)

  /** Backward-inclusive native as-of join of `left` and `right` on
    * `key`, matching the latest right row with `rightTs <= leftTs`.
    * Output: all left columns, then all right columns (nullable; the
    * right KEY column is non-null exactly when a match exists).
    * Right columns should be pre-renamed by the caller to avoid
    * duplicate names in the result.
    */
  def asofBackward(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, leftTs: String, rightTs: String): DataFrame = {
    // re-alias every right column to itself: fresh exprIds, so a
    // self-join (both sides derived from one table) can never carry
    // ambiguous attribute references into the node
    val r = right.select(right.columns.toIndexedSeq.map(c => F.col(c).as(c)): _*)
    def attr(df: DataFrame, name: String): Attribute = {
      val plan = df.queryExecution.analyzed
      val a = plan.output.find(_.name == name).getOrElse(
        sys.error(s"asof column '$name' not found in ${plan.output.map(_.name)}"))
      require(LongBacked.contains(a.dataType),
        s"asof key/ts columns must be bigint or timestamp; '$name' is ${a.dataType.simpleString}")
      a
    }
    val node = AsofJoinNode(
      left.queryExecution.analyzed, r.queryExecution.analyzed,
      attr(left, leftKey), attr(r, rightKey),
      attr(left, leftTs), attr(r, rightTs))
    org.apache.spark.sql.graftglue.Bridge.ofRows(left.sparkSession, node)
  }
}
