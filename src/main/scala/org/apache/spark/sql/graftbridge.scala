package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column↔Expression conversion (Spark 4 moved
  * `Column` off Catalyst `Expression`; extensions that construct custom
  * expressions need the classic converter). Package-placed on purpose —
  * the only non-public Spark API this library touches.
  */
object GraftColumnBridge {
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
}
