package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic
import org.apache.spark.sql.execution.SparkStrategy

/** Bridge to Spark's private[sql] Dataset factory and the experimental
  * strategy registry — needed to hand a custom LogicalPlan (e.g.
  * graft.plans.AsOfJoinNode) back to the public DataFrame API, and to
  * self-register its planner strategy in sessions built without
  * GraftExtensions. Lives under org.apache.spark.sql for the
  * private[sql] scope; no logic of its own. */
object DatasetBridge {

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Idempotently append `s` to the session's extra planner strategies. */
  def ensureStrategy(spark: SparkSession, s: SparkStrategy): Unit = {
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(s)) {
      exp.extraStrategies = exp.extraStrategies :+ s
    }
  }
}
