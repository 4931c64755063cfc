package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one package-private hop a SparkSessionExtensions-based operator
  * library needs that the public API does not expose: turning a custom
  * LogicalPlan node into a DataFrame. `Dataset.ofRows` is `private[sql]`
  * by design (the supported entry points are SQL text and the DataFrame
  * DSL, neither of which can produce a third-party node), so the
  * injection pattern used by every plan-extending library applies: one
  * bridge object in the sql package, kept to the single call.
  */
object GraftSqlBridge {
  def ofRows(spark: classic.SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark, plan)
}
