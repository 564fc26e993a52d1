package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.SparkStrategy

/** The one deliberately-scoped bridge into Spark's `private[sql]` surface.
  *
  * Building a DataFrame from a custom [[LogicalPlan]] node (the tier-(c)
  * custom-operator path: LogicalPlan + Strategy + SparkPlan) requires
  * `Dataset.ofRows`, which Spark keeps `private[sql]` — the documented
  * workaround for extension libraries is a single file in this package.
  * Everything else in the engine goes through the public API; nothing else
  * may import this object's internals.
  */
object GraftSqlBridge {

  /** Wrap an (already analyzed) logical plan as a DataFrame. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed plan of a DataFrame (resolved attributes). */
  def analyzed(df: Dataset[_]): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed

  /** Idempotently register an extra planner strategy on a live session —
    * lets custom-plan operators work on sessions built without
    * `withExtensions` (Verify/Bench/driver sessions).
    */
  def ensureStrategy(spark: SparkSession, s: SparkStrategy): Unit = {
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(s))
      exp.extraStrategies = exp.extraStrategies :+ s
  }
}
