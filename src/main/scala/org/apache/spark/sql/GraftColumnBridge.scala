package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column ⇄ Expression conversion.
  *
  * Spark 4 made `Column` wrap a logical `ColumnNode` rather than a
  * Catalyst `Expression`; the conversion lives in
  * `org.apache.spark.sql.classic.ExpressionUtils`, which is
  * `private[sql]`. Custom Catalyst expressions (graft.functions.*) need
  * exactly this conversion to surface as user-facing `Column`s, so this
  * one-file shim lives in the `org.apache.spark.sql` package. No Spark
  * behavior is modified.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
