package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` doorway the engine needs: wrapping a custom
  * [[LogicalPlan]] node (e.g. [[graft.plans.AsofJoinPlan]]) back into a
  * user-facing DataFrame. Everything else in the engine stays on public
  * API; this shim exists so the custom-operator path (logical node →
  * strategy → physical exec) can hand its plan to the normal analyzer/
  * optimizer/planner pipeline exactly like a built-in operator. */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
