package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{DataFrame, Dataset, SparkSession}

/** The one `private[sql]` doorway a library-defined logical operator
  * needs: wrapping a custom [[LogicalPlan]] node back into a public
  * DataFrame. Spark's own connectors and every custom-plan library
  * use exactly this package-placement pattern; everything else in
  * graft stays on public API.
  */
object Bridge {
  def ofRows(s: org.apache.spark.sql.SparkSession, plan: LogicalPlan): org.apache.spark.sql.DataFrame =
    Dataset.ofRows(s.asInstanceOf[SparkSession], plan)

  def logicalPlan(df: org.apache.spark.sql.DataFrame): LogicalPlan =
    df.asInstanceOf[DataFrame].queryExecution.analyzed
}
