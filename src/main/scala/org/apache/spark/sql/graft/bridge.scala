package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionColumnNode}

/** Bridge between the public Column API and Catalyst expressions.
  *
  * Spark 4 routes Columns through ColumnNode, and the node<->Expression
  * converters are `private[sql]` — this shim (compiled into the sql package
  * namespace) is the sanctioned-by-visibility way for a library to attach
  * custom native expressions (e.g. [[graft.expressions.PyTitleCase]]) without
  * registering them in a FunctionRegistry.
  */
object bridge {
  def column(e: Expression): Column = Column(ExpressionColumnNode(e))
  def expression(c: Column): Expression = ColumnNodeToExpressionConverter(c.node)
}
