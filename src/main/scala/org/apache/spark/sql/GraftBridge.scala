package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into the `private[sql]` constructor surface: turning a
  * hand-built [[LogicalPlan]] back into a user-facing DataFrame. This is
  * the standard extension-library pattern for custom operators (the
  * public `SparkSessionExtensions` API injects rules/strategies but has
  * no public "wrap this plan" call).
  */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def analyzedPlan(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed

  /** Spark 4 moved Column to a connect-compatible facade; the catalyst
    * Expression behind it comes back through the classic converter.
    */
  def expr(spark: SparkSession, c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    spark.asInstanceOf[classic.SparkSession].expression(c)

  /** Test-only: the physical plan of a streaming query's most recent
    * micro-batch, for asserting plan shape (e.g. the stream-static
    * join stays broadcast) — the streaming analogue of `.explain`.
    */
  def lastMicroBatchPlan(q: org.apache.spark.sql.streaming.StreamingQuery)
      : org.apache.spark.sql.execution.SparkPlan =
    q.asInstanceOf[org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
      .streamingQuery.lastExecution.executedPlan

  /** Block until the listener bus has delivered every queued event —
    * the `private[spark]` drain the stage-profile operator needs so a
    * profile snapshot taken right after an action includes the last
    * task's metrics (listener delivery is async).
    */
  def drainListenerBus(sc: org.apache.spark.SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty(30000)

  /** Test-only: a physical scan over raw (possibly non-Unsafe)
    * InternalRows, for driving custom execs the way an arbitrary child
    * SparkPlan would — SparkPlan.execute() guarantees only InternalRow.
    */
  def rawRowScan(
      output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute],
      rows: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow])
      : org.apache.spark.sql.execution.SparkPlan =
    org.apache.spark.sql.execution.RDDScanExec(output, rows, "RawRowScan")
}
