package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between the public `Column` API (ColumnNode-backed since Spark 4)
  * and catalyst `Expression`s, for graft's custom expressions.
  * Lives in `org.apache.spark.sql` to reach the `private[sql]` converters —
  * the same pattern used by open-source Spark extension libraries.
  */
object GraftSqlShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
