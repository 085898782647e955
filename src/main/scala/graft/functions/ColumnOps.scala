package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graftshim.Bridge

/** Bridge between the public Column API and Catalyst expressions
  * (Spark 4 moved Column onto ColumnNode; the conversion lives behind
  * private[sql] ExpressionUtils — re-exported via graftshim.Bridge).
  */
object ColumnOps {
  def toColumn(e: Expression): Column = Bridge.toColumn(e)
  def toExpr(c: Column): Expression = Bridge.toExpr(c)
}
