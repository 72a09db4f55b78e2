package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Expression bridge for programmatically-constructed native
  * expressions (graft.plans.IvfProbesPrunedExpr carries a driver-built model
  * object no function-registry builder could receive). Spark 4 removed the
  * public `Column(expr)` constructor; the supported classic-API conversion
  * lives in `org.apache.spark.sql.classic.ExpressionUtils`, which is
  * `private[sql]` — this shim re-exports the two conversions from inside the
  * `sql` package, the standard OSS pattern for libraries extending Catalyst. */
object ColumnBridge {
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
