package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge. `ExpressionUtils` is `private[sql]` at
  * the Scala level (public in bytecode), so the conversion lives in a
  * sub-package of org.apache.spark.sql — the standard extension-library
  * technique for building custom Catalyst expressions into Columns. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
