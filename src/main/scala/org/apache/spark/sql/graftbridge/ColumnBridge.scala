package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made Column wrap a ColumnNode and gated the
  * Expression ↔ Column converters behind `private[sql]`
  * (`classic.ExpressionUtils`). Custom Catalyst expressions still need
  * them, so this two-line bridge lives in the `org.apache.spark.sql`
  * namespace — the standard technique for Spark extension libraries. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
