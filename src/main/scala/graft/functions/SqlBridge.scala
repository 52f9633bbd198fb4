// Lives under org.apache.spark.sql to reach the private[sql] helpers
// that convert between the public Column API and catalyst Expressions
// (Spark 4 wraps Column around ColumnNode; ExpressionUtils is the
// supported internal bridge).
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object SqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
