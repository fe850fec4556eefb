package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between graft's native Catalyst expressions and the public Column
  * API (Spark 4 hides Expression↔Column conversion behind
  * `private[sql] classic.ExpressionUtils`; this shim is the standard
  * extension-library access pattern — no Spark internals are modified).
  */
object GraftColumn {
  def of(e: Expression): Column = ExpressionUtils.column(e)
  def expressionOf(c: Column): Expression = ExpressionUtils.expression(c)
}
