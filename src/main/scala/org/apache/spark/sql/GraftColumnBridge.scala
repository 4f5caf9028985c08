package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge to the `private[sql]` Column ↔ Expression converters in
  * Spark 4's classic module (org.apache.spark.sql.classic.ExpressionUtils,
  * spark/sql/core — columnNodeSupport.scala). Needed so graft's custom
  * Catalyst expressions (e.g. graft.functions.CosineSimilarity) can be
  * exposed through the public Column API. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
