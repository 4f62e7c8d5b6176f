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

  /** Release the storage blocks pinned by `localCheckpoint()` leaves of a
    * DataFrame's plan (a checkpointed frame is a `LogicalRDD` over cached
    * blocks; plain `df.unpersist()` goes through the cache manager and
    * never sees them — without this they stay resident until the RDD is
    * GC'd and the ContextCleaner sweeps it). */
  def unpersistCheckpointLeaves(df: org.apache.spark.sql.DataFrame): Unit =
    df.asInstanceOf[org.apache.spark.sql.classic.DataFrame]
      .queryExecution.analyzed.collect {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
      }.foreach(_.unpersist(blocking = false))

  /** Storage levels of a frame's `localCheckpoint()` leaves — spec
    * observability for [[unpersistCheckpointLeaves]]. */
  def checkpointLeafLevels(df: org.apache.spark.sql.DataFrame)
      : Seq[org.apache.spark.storage.StorageLevel] =
    df.asInstanceOf[org.apache.spark.sql.classic.DataFrame]
      .queryExecution.analyzed.collect {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.getStorageLevel
      }
}
