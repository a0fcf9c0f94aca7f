package org.apache.spark.sql.graftinternal

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => CDataset, ExpressionUtils, SparkSession => CSparkSession}

/** Narrow bridge into `private[sql]` surface needed to build DataFrames
  * from custom logical plans (the documented pattern for third-party
  * operator libraries: a small shim compiled inside an org.apache.spark.sql
  * subpackage). Only two capabilities cross the boundary:
  * Column ↔ Expression and LogicalPlan → DataFrame. */
object Bridge {
  /** Eagerly converts the column node tree to a Catalyst expression (the
    * lazy ExpressionUtils wrapper is only unwrapped by Dataset API entry
    * points, not by the analyzer inside a custom plan). */
  def expr(spark: SparkSession, c: Column): Expression =
    spark.asInstanceOf[CSparkSession].expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)
  /** Session-free Column → Expression (for expression builders usable
    * inside HOF lambdas, where no session is at hand). */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    CDataset.ofRows(spark.asInstanceOf[CSparkSession], plan)
}
