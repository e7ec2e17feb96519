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

  /** EAGER node→expression conversion. `expression` returns a lazy
    * `ColumnNodeExpression` wrapper, which the classic Dataset API
    * converts at plan construction — but an expression returned from a
    * FunctionRegistry builder is spliced into a tree already under
    * analysis, the wrapper never converts, and execution dies with
    * "Cannot generate code". Converting eagerly yields a plain
    * (possibly Unresolved*) expression tree the analyzer resolves like
    * any parsed SQL. */
  def expressionEager(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)
}
