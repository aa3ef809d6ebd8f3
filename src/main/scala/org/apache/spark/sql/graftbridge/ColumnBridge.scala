package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 Columns are ColumnNode-backed and the classic Column↔Expression
  * bridge (`org.apache.spark.sql.classic.ExpressionUtils`) is
  * `private[sql]` — the established pattern for extension libraries that
  * ship custom Catalyst expressions is a minimal adapter inside the
  * `org.apache.spark.sql` package namespace. This is the only file in the
  * project outside the `graft` namespace.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
