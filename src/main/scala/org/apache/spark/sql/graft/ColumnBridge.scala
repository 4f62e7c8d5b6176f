package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Bridge into Spark's `private[sql]` Column <-> Expression conversion —
 * the established extension-library pattern for registering native
 * Catalyst expressions from outside Spark (the classic API hides the
 * constructors behind package-private helpers).
 */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame from a logical plan (classic `Dataset.ofRows` is
    * private[sql]) — used by the ANN optimizer rule to count prefilter
    * survivors among index candidates. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** InternalRow-level RDD of a DataFrame (`queryExecution.toRdd`) — the
    * zero-boxing scan the hot index kernels iterate (primitive array /
    * binary accessors instead of Seq[Float] deserialization). */
  def toInternalRdd(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow] =
    df.asInstanceOf[org.apache.spark.sql.classic.DataFrame].queryExecution.toRdd
}
