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

  /** `localCheckpoint()` that REPLACES the checkpoint's inherited statistics
    * with the materialized blocks' measured size.
    *
    * Why this must exist: `Dataset.localCheckpoint` builds its `LogicalRDD`
    * via `LogicalRDD.fromDataset`, which CARRIES OVER the source plan's
    * estimated statistics. In an iterative operator that joins its own
    * previous checkpoint every round (connected components, k-core,
    * PageRank), the estimate therefore COMPOUNDS: each round's join
    * multiplies the previous checkpoint's inherited `sizeInBytes`, so the
    * estimate squares (or cubes) per round and after ~20 rounds is a
    * BigInt with millions of digits — at which point Catalyst's
    * `SizeInBytesOnlyStatsPlanVisitor` (which multiplies child sizes on
    * every `visitJoin`) burns unbounded DRIVER CPU inside BigInteger
    * multiplication. Measured: the entity-merge fuzzy-pair graph (long
    * typo chains → ~20 propagation rounds) pinned a core for 5+ minutes
    * per construction in stats estimation alone; with this reset it plans
    * in milliseconds.
    *
    * The replacement is the TRUTH, not a guess: the checkpoint's blocks
    * are already in the block manager, so their byte size is exact —
    * downstream broadcast decisions get better, not worse. Falls back to
    * the session default size when storage info is not yet visible. */
  def localCheckpointFreshStats(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.execution.LogicalRDD
    import org.apache.spark.sql.catalyst.plans.logical.Statistics
    val ckpt = df.localCheckpoint()
    ckpt.queryExecution.analyzed match {
      case l: LogicalRDD =>
        val session = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        val measured = session.sparkContext.getRDDStorageInfo
          .find(_.id == l.rdd.id)
          .map(i => BigInt(i.memSize + i.diskSize).max(BigInt(1)))
          .getOrElse(BigInt(session.sessionState.conf.defaultSizeInBytes))
        val fresh = LogicalRDD(
          l.output,
          l.rdd,
          l.outputPartitioning,
          l.outputOrdering,
          l.isStreaming,
          l.stream)(session, Some(Statistics(sizeInBytes = measured)), None)
        org.apache.spark.sql.classic.Dataset.ofRows(session, fresh)
      case _ => ckpt
    }
  }
}
