package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Thin bridge to `private[sql]` Column<->Expression conversion, needed to
  * expose custom Catalyst expressions (e.g. graft.functions.Hash64Expr)
  * through the public Column API. Kept to the two conversion calls — no
  * other internals are touched. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
