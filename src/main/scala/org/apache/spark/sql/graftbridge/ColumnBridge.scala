package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge for graft's native Catalyst expressions.
  *
  * Spark 4 moved the converters behind `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`); a library that ships
  * its own codegen'd `Expression`s still needs them, so this one-file
  * subpackage of `org.apache.spark.sql` re-exposes exactly the two calls.
  * Nothing else may live here.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
