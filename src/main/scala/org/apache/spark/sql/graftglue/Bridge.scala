package org.apache.spark.sql.graftglue

import org.apache.spark.sql.{DataFrame, SparkSession, classic}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` doorway the graft library needs: building a
  * DataFrame from a custom LogicalPlan ([[graft.plans.AsofJoinNode]]).
  * `Dataset.ofRows` is private[sql], so this object lives under
  * `org.apache.spark.sql` — the standard extension-library pattern;
  * nothing else from the internal surface is re-exported.
  */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
