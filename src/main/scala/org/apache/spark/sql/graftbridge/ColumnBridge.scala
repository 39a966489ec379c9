package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's private[sql] Column <-> Expression converters, for the
  * few places graft builds a Column around an expression that cannot flow
  * through the SQL function registry — e.g. `BloomMightContainBc`, whose
  * broadcast handle has no literal spelling. Same in-package pattern as
  * `org.apache.spark.sql.jdbc.GraftDerbyDialect`; only public Spark
  * behavior is used, just via its package-private classic accessors. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
