package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal accessor for `private[sql]` Column↔Expression plumbing — the
  * standard seam an external Spark extension library needs to expose custom
  * Catalyst expressions through the public Column API (the classic-mode
  * bridge moved behind `org.apache.spark.sql.classic` in Spark 4). */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
