package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` doorway a library-defined logical operator needs:
  * turning a hand-built LogicalPlan into a DataFrame. Spark itself offers no
  * public constructor for this (SPARK-31561 discussion), so — like every
  * published Spark extension that ships custom plans — we place this single
  * forwarding call inside the `org.apache.spark.sql` package. Nothing else
  * in the codebase lives outside `graft.*`. */
object GraftBridge {
  def ofRows(spark: classic.SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark, plan)
}
