package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column <-> Expression converters — the
  * one place this library needs Spark-internal access, isolated here so
  * graft code stays on the public API. Spark 4 wraps Column around
  * ColumnNode; `ExpressionUtils` performs the classic conversion both
  * directions. (The conventional extension-library technique: a single
  * shim compiled inside the org.apache.spark.sql package scope.)
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
