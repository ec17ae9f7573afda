package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout — the pre-paid-shuffle story for fact tables that
  * are joined or aggregated on the same key query after query.
  *
  * Writing with `bucketBy(n, key)` hash-partitions files by key once at
  * write time; every later equi-join or groupBy on that key between tables
  * bucketed with the same `n` reads co-located buckets and plans with ZERO
  * shuffle exchanges (asserted in BucketingSpec). At 100 TB this converts
  * the dominant recurring cost of a star-schema workload — re-shuffling the
  * fact table per query — into a one-time write-side cost.
  *
  * Bucketed tables must live in the session catalog (`saveAsTable`), not a
  * bare parquet path: the bucket spec is catalog metadata. Pick `buckets`
  * so each bucket file lands in the 100 MB–1 GB range at target scale, and
  * keep it identical across tables that will join.
  */
object Bucketing {

  def writeBucketed(
      df: DataFrame,
      table: String,
      key: String,
      buckets: Int,
      mode: SaveMode = SaveMode.ErrorIfExists): Unit =
    df.write
      .format("parquet")
      .mode(mode)
      .bucketBy(buckets, key)
      .sortBy(key) // sorted buckets: sort-merge joins skip the per-task sort
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
