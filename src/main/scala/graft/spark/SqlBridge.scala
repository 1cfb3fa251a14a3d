// Lives in the org.apache.spark.sql package hierarchy ON PURPOSE: the
// Column <-> Expression converters (classic.ExpressionUtils) are
// private[sql] in Spark 4, and a Column wrapping an expression that holds
// runtime state (a Broadcast sketch) cannot go through the public
// function-registry path. This is the conventional bridge pattern used by
// Spark extension libraries; keep it to exactly these two forwarders.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object SqlBridge {
  def column(e: Expression): Column     = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
