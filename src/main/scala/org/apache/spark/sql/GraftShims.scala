/*
 * Lives in org.apache.spark.sql to reach two private[sql] seams that
 * library-side extension code needs — the same factory technique used by
 * published Spark extensions (cf. SNIPPETS.md[3], Qbeast's
 * DatasetFactory pattern). Only thin pass-throughs live here; all engine
 * logic stays in the graft packages.
 */
package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

object GraftShims {

  /** Build a DataFrame from a custom LogicalPlan (Dataset.ofRows). */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Extract the Catalyst expression backing a Column. */
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
}
