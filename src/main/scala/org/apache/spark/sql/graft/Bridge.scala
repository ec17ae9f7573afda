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

  /** Drop the materialized blocks behind a `localCheckpoint()`ed DataFrame.
    * Iterative operators checkpoint every round to truncate lineage; without
    * an explicit free, every round's blocks stay in the block manager until
    * session GC — measured 4-6× round slowdowns from the resulting memory
    * pressure (graft.tools.ClusterBench). Only call on frames that are no
    * longer referenced: a local checkpoint has no lineage to recompute from,
    * so unpersisting a live one loses the data. No-op on non-checkpoint
    * plans. */
  def freeLocalCheckpoint(df: org.apache.spark.sql.DataFrame): Unit =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
