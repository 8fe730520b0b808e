package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Catalyst-Expression bridge. Spark 4 removed the public
  * `Column(expr)` constructor; the supported converters live in
  * `org.apache.spark.sql.classic.ExpressionUtils`, which is
  * `private[sql]` — so this one-file shim sits in a subpackage of
  * `org.apache.spark.sql` (the standard pattern for Spark extension
  * libraries). It lets graft build Columns from its native expressions
  * ([[graft.functions.FixedPointSum]], [[graft.functions.CosineSimilarity]])
  * DIRECTLY, with no dependency on session-registered function names —
  * declared queries then work under any SparkSession, with or without
  * GraftExtensions.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
