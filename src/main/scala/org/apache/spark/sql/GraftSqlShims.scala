package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the sql-package-private Column ⇄ Expression converters —
  * the standard escape hatch third-party engines/connectors use to expose
  * custom Catalyst expressions through the public Column API.
  */
object GraftSqlShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
