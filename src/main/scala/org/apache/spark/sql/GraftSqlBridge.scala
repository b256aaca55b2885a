package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal accessor for the `private[sql]` DataFrame-from-LogicalPlan
  * constructor — the standard bridge every Spark extension library
  * ships to expose a custom logical operator (graft.plans.AsOfJoinNode)
  * through a public DataFrame-returning API. Nothing else from the
  * private surface is touched. */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
