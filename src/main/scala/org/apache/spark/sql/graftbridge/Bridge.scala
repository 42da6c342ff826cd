package org.apache.spark.sql
package graftbridge

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionColumnNode}

/** Column ⇄ Expression bridge for custom Catalyst expressions.
  *
  * Spark 4's Column wraps a ColumnNode and the converters are
  * `private[sql]`, so extension libraries host this one-file bridge inside
  * the `org.apache.spark.sql` package tree — the same pattern Spark
  * connector/extension projects use. No Spark internals are modified.
  */
object Bridge {
  def column(e: Expression): Column = Column(ExpressionColumnNode(e))
  def expression(c: Column): Expression =
    ColumnNodeToExpressionConverter(c.node)
}
