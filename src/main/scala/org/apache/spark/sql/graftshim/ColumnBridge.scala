package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Interop shim: Column <-> Catalyst Expression conversion is
  * `private[sql]` in Spark 4.x (ExpressionUtils), so the bridge lives in
  * an org.apache.spark.sql subpackage. This is the only place the
  * project reaches into Spark-private API, and only to register the
  * native expressions in graft.functions.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Session-local function registration (sessionState is private[sql]). */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")

  /** Block until the async listener bus has delivered every queued event
    * (`listenerBus` is private[spark]) — the deterministic drain the
    * profiler's per-op shuffle-byte attribution needs; a fixed sleep can
    * under-wait on a loaded host and bleed one op's stage metrics into
    * the next (review-caught).
    */
  def drainListenerBus(sc: org.apache.spark.SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
