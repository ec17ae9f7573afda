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

  /** ORC export — the other columnar interchange format (Hive/Trino
    * ecosystems read it natively). Same rolling/partitioning contract as
    * [[exportJsonl]]; Spark's ORC scan supports the same predicate
    * pushdown and column pruning as parquet (SinksSpec asserts
    * PushedFilters reaches the ORC reader), so a consumer can treat
    * ORC-landed shards as first-class scan sources, not just exports. */
  def exportOrc(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String] = Nil,
      maxRecordsPerFile: Long = 500000L,
      mode: SaveMode = SaveMode.ErrorIfExists): Unit = {
    val w = df.write
      .mode(mode)
      .option("maxRecordsPerFile", maxRecordsPerFile)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).orc(path)
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

  /** Compact a parquet directory's small files in place (the operational
    * complement to continuous ingest: an AvailableNow drain per micro-batch
    * lands one file per batch per task, and a year of that makes every
    * downstream scan pay per-file open/footer cost). Rewrites the directory
    * as `ceil(bytes / targetFileBytes)` files via a round-robin
    * repartition — content-identical, one shuffle whose width IS the
    * output layout. Writes to `<path>.compact.tmp` first and swaps only
    * after the rewrite commits, so a failed compaction never touches the
    * original (same tmp-then-swap discipline as WideColumnTable.put).
    * Returns (filesBefore, filesAfter). */
  def compact(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      targetFileBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    def parquetFiles(p: String): Seq[java.nio.file.Path] =
      Files.walk(Paths.get(p)).iterator().asScala
        .filter(f => f.toString.endsWith(".parquet") && Files.isRegularFile(f))
        .toSeq
    val before = parquetFiles(path)
    val bytes = before.map(Files.size).sum
    val nOut = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val tmp = path + ".compact.tmp"
    spark.read.parquet(path).repartition(nOut)
      .write.mode(SaveMode.Overwrite).parquet(tmp)
    val old = path + ".compact.old"
    Files.move(Paths.get(path), Paths.get(old))
    Files.move(Paths.get(tmp), Paths.get(path))
    def deleteTree(p: String): Unit = {
      val root = Paths.get(p)
      if (Files.exists(root))
        Files.walk(root).sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala.foreach(Files.delete)
    }
    deleteTree(old)
    (before.size, parquetFiles(path).size)
  }
}
