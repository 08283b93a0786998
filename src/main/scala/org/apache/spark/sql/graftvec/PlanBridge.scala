package org.apache.spark.sql.graftvec

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** `Dataset.ofRows` is `private[sql]` — this bridge lets graft code turn
  * a hand-rewritten `LogicalPlan` (e.g. [[graft.plans.LshJoinRewrite]]
  * applied explicitly, outside the optimizer pipeline) back into a
  * DataFrame. Same bridge-package pattern as the native expressions. */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
