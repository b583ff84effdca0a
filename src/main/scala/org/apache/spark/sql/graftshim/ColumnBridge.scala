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
}
