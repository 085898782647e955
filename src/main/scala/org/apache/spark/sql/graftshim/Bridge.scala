package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 wraps Column around ColumnNode
  * and gates the Catalyst conversion behind `private[sql]`
  * ExpressionUtils (spark/sql/classic/columnNodeSupport.scala) — this
  * shim lives in the org.apache.spark.sql namespace solely to re-export
  * those two conversions for graft's native expressions.
  */
object Bridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpr(c: Column): Expression = ExpressionUtils.expression(c)
}
