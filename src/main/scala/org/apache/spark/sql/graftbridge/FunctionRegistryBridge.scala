package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Bridge into the session's `private[sql]` FunctionRegistry, for
  * registering functions on an ALREADY-RUNNING session (notebooks, tests).
  * The deployment path — `spark.sql.extensions=graft.GraftExtensions` —
  * needs no internals; this shim exists only because extensions are
  * applied at session build time and an existing session's registry is
  * session-state. Same isolation rationale as [[ColumnBridge]].
  */
object FunctionRegistryBridge {
  def register(spark: SparkSession, name: String, info: ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(name), info, builder)
}
