package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionColumnNode}

/** Bridge between graft's native Catalyst expressions and the public
  * `Column` API (Spark 4's Column wraps a ColumnNode; the constructors are
  * package-private, so extension libraries expose them from inside the
  * `org.apache.spark.sql` package — the same pattern Spark-native
  * libraries use).
  */
object GraftBridge {
  def column(e: Expression): Column = Column(ExpressionColumnNode(e))
  def expression(c: Column): Expression = ColumnNodeToExpressionConverter(c.node)
}
