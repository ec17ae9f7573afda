package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Package-private-API bridge: Spark 4 hides `Column <-> Expression`
  * conversion behind `private[sql]`; custom Catalyst expressions (e.g.
  * [[graft.plans.DotProduct]]) need it to participate in the public Column
  * algebra. Lives under `org.apache.spark.sql` solely for visibility — no
  * Spark internals are modified. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
