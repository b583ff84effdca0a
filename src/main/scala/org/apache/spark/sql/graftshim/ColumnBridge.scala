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
}
