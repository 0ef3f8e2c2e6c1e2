package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The `private[sql]` doorways a library-defined connector needs:
  * turning a hand-built LogicalPlan into a DataFrame (Spark offers no
  * public constructor for this — SPARK-31561 discussion), and converting
  * the V2 `Predicate`s runtime filtering delivers into the V1 `Filter`s
  * a file skipper evaluates (`PredicateUtils`, the same translation
  * Spark's own file sources use). Like every published Spark extension
  * that ships custom plans, we place these forwarding calls inside the
  * `org.apache.spark.sql` package. Nothing else in the codebase lives
  * outside `graft.*`. */
object GraftBridge {
  def ofRows(spark: classic.SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark, plan)

  /** V2 runtime-filter predicates → V1 filters, dropping unconvertible
    * ones (always sound for a pruning-only consumer). */
  def predicatesToV1(
      predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate])
      : Array[org.apache.spark.sql.sources.Filter] =
    org.apache.spark.sql.internal.connector.PredicateUtils.toV1(predicates)
}
