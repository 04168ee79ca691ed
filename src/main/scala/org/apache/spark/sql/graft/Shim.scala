package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSession}

/** Access shim for `private[sql]` planner entry points — the standard
  * pattern for Spark-extension libraries that must execute auxiliary
  * plans from inside planning (here: plan-time sampling, SURVEY §4.8). */
object Shim {
  /** Materialize a DataFrame over an arbitrary logical plan. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSession], plan)

  /** Column <-> Catalyst Expression bridges (classic.ExpressionUtils is
    * the blessed conversion seam in Spark 4's split Column API). */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
  def expression(c: org.apache.spark.sql.Column): org.apache.spark.sql.catalyst.expressions.Expression =
    // Eager conversion (not ExpressionUtils.expression, which returns a
    // lazy ColumnNodeExpression wrapper): callers pattern-match on the
    // catalyst tree, e.g. PlanBuilder.agg rewriting UnresolvedFunction.
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter.apply(c.node)

  /** V2 column <-> StructType bridges (CatalogV2Util is private[sql]). */
  def v2ColumnsToStructType(
      cols: Array[org.apache.spark.sql.connector.catalog.Column]): org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.connector.catalog.CatalogV2Util.v2ColumnsToStructType(cols)
  def structTypeToV2Columns(
      schema: org.apache.spark.sql.types.StructType): Array[org.apache.spark.sql.connector.catalog.Column] =
    org.apache.spark.sql.connector.catalog.CatalogV2Util.structTypeToV2Columns(schema)
}
