package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between the public `Column` API and catalyst `Expression`s.
  *
  * Spark 4 made `Column` a tree of `ColumnNode`s (Connect-compatible) and
  * the classic converters (`org.apache.spark.sql.classic.ExpressionUtils`)
  * `private[sql]` — the supported way for an extension library to wrap a
  * custom Expression as a Column is exactly this kind of in-package shim
  * (same approach as spark-connectors in the wild). Kept to two one-line
  * forwarders; everything else in graft stays in its own namespace.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
