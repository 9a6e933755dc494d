package org.apache.spark.sql
package graftshim

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between public `Column` and Catalyst `Expression` for custom
  * expressions. Spark 4 made the converters `private[sql]`
  * (org.apache.spark.sql.classic.ExpressionUtils), so this one-file shim
  * lives inside the sql package — the standard pattern for libraries
  * shipping native expressions against the classic API.
  */
object ColumnShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
