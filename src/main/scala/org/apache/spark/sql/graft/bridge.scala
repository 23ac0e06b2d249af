package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> catalyst Expression bridge. Spark 4 made the classic
  * converters `private[sql]`, so custom native expressions (e.g.
  * [[graft.functions.DotF64]]) need this one-hop accessor inside the
  * spark.sql package tree — the standard pattern for Catalyst extension
  * libraries.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
