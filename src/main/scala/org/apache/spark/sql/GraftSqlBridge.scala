package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into the `private[sql]` surface: materialize a DataFrame from a
  * hand-built logical plan. `Dataset.ofRows` is package-private, so any
  * library that injects its own logical operators (graft.plans.TopKPerGroup)
  * needs a shim compiled inside the org.apache.spark.sql package — the
  * standard pattern for third-party Spark extensions. */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
