package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC relational sources — the real S1/S2 read path (reference
  * RdlETL.java:86-101 Oracle cursor, YhCldETL.java:56-68 MySQL-wire scan).
  *
  * The reference hand-writes WHERE clauses and tunes fetch size on a single
  * forward-only cursor; Spark's JDBC relation subsumes both — filters and
  * column pruning are pushed into the generated SQL (visible as
  * `PushedFilters` on the scan node, asserted in JdbcSourceSpec), and
  * `fetchsize` is an option, not code.
  *
  * Scale design: a single JDBC cursor is a 1-partition scan no matter the
  * cluster size — the database, not Spark, becomes the bottleneck. For any
  * table above façade size use [[readPartitioned]]: N executors each open a
  * cursor over a disjoint stride of `partitionCol` (`WHERE col >= lo AND
  * col < hi` per partition), the standard parallel-ingest shape for
  * relational offload. Partition count should track the source DB's
  * connection budget, not the cluster's core count.
  */
object Jdbc {

  /** Single-cursor read — small dimension tables (S2).
    * Predicate/column pushdown still applies. */
  def read(
      spark: SparkSession,
      url: String,
      table: String,
      options: Map[String, String] = Map.empty): DataFrame =
    spark.read
      .format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .options(options)
      .load()

  /** Parallel striped read — fact tables (S1). Spark issues one bounded
    * cursor per partition over `[lower, upper)` strides of a numeric
    * `partitionCol`. */
  def readPartitioned(
      spark: SparkSession,
      url: String,
      table: String,
      partitionCol: String,
      lower: Long,
      upper: Long,
      numPartitions: Int,
      options: Map[String, String] = Map.empty): DataFrame =
    spark.read
      .format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("partitionColumn", partitionCol)
      .option("lowerBound", lower)
      .option("upperBound", upper)
      .option("numPartitions", numPartitions)
      .options(options)
      .load()
}
