// Lives under org.apache.spark.sql.* for the same reason as the custom
// expressions: Dataset.ofRows is private[sql] — the standard bridge for
// third-party plan-level integrations.
package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

object PlanUtils {
  /** Analyze + wrap an arbitrary (possibly unresolved) logical plan as a
    * DataFrame — resolves temp views / subqueries in `plan` against the
    * session's catalog, exactly like spark.sql would. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
