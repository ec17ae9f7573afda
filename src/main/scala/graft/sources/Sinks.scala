package graft.sources

import org.apache.spark.sql.DataFrame

/** Training-data export sinks (SURVEY.md §7.2 M5 companion to the K3 CSV
  * export): JSONL is the interchange format LLM data pipelines consume —
  * one JSON object per line, size-capped files so downstream loaders
  * stream fixed-size shards, optional partition columns so a 100 TB corpus
  * lands as prunable directories. Same file-rolling contract as the
  * reference's CSV export (RdlETL3.java:117-128), parallel per task — no
  * driver-side writer.
  */
object Sinks {

  def exportJsonl(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String] = Nil,
      maxRecordsPerFile: Long = 500000L): Unit = {
    val w = df.write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .option("compression", "none")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).json(path)
  }
}
