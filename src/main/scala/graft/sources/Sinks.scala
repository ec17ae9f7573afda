package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Training-data export sinks (SURVEY.md §7.2 M5 companion to the K3 CSV
  * export): JSONL is the interchange format LLM data pipelines consume —
  * one JSON object per line, size-capped files so downstream loaders
  * stream fixed-size shards, optional partition columns so a 100 TB corpus
  * lands as prunable directories. Same file-rolling contract as the
  * reference's CSV export (RdlETL3.java:117-128), parallel per task — no
  * driver-side writer.
  */
object Sinks {

  /** @param mode defaults to ErrorIfExists: a corpus export pointed at an
    *   existing directory should fail loudly, not silently delete it. Pass
    *   `SaveMode.Overwrite` to opt into clobbering. */
  def exportJsonl(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String] = Nil,
      maxRecordsPerFile: Long = 500000L,
      mode: SaveMode = SaveMode.ErrorIfExists): Unit = {
    val w = df.write
      .mode(mode)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .option("compression", "none")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).json(path)
  }

  /** Write the corpus as deterministic training shards: assigns each doc
    * the same rerun-stable shard as [[graft.operators.Curation
    * .shardManifest]] (so the manifest query IS the written layout's
    * manifest) and lands one `shard=K/` directory per shard via
    * `partitionBy` — no shuffle beyond the write's own file split; a
    * dataloader reads shard directories independently. Returns the shard
    * column name for callers composing further. */
  def writeShards(
      documents: DataFrame,
      path: String,
      nShards: Int = 32,
      mode: SaveMode = SaveMode.ErrorIfExists): Unit = {
    import org.apache.spark.sql.functions.{col, lit, pmod}
    documents
      .withColumn(
        "shard",
        pmod(graft.operators.Curation.hashBucket(col("doc_id")), lit(nShards.toLong)))
      .write
      .mode(mode)
      .partitionBy("shard")
      .parquet(path)
  }
}
