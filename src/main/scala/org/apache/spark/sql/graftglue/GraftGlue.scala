package org.apache.spark.sql.graftglue

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.{classic, DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy

/** The two `private[sql]` shims a custom-LogicalPlan operator needs —
  * isolated in a subpackage of `org.apache.spark.sql` (the standard
  * extension-bridge technique) so the rest of graft stays on public
  * API. Nothing here contains logic; both calls are one-liners into
  * Spark's own session machinery. */
object GraftGlue {

  /** Wrap a (resolved) logical plan as a DataFrame on this session. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Idempotently append a planner strategy to the session. */
  def ensureStrategy(spark: SparkSession, s: SparkStrategy): Unit = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    if (!cs.experimental.extraStrategies.contains(s))
      cs.experimental.extraStrategies =
        cs.experimental.extraStrategies :+ s
  }
}
