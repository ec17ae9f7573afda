package graft.kv

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Thin wide-column KV façade (SURVEY.md §7.2 M4) mirroring the reference's
  * imperative client surface (HBaseClient.java): createTable/exists (DDL,
  * K5), batched multi-row upsert (K1/K2), point get (S6), range scan (S3),
  * filtered scan (S4) — over partitioned parquet in long form
  * `(row_key, family, qualifier, value)`.
  *
  * Storage layout: one directory per table, hash-partitioned files; the
  * `family` column is a physical partition column (= HBase column families
  * being separate stores), so family projection prunes whole directories.
  * Upsert is cell-level last-write-wins, implemented as read-merge-overwrite
  * per write batch — the parquet-honest analog of HBase `put` (SURVEY.md
  * §1.4; a production deployment would use Delta/Iceberg MERGE for
  * row-level concurrency, documented in SURVEY §7.4).
  *
  * Scale note: `get`/`scan` read through Spark with partition (family) and
  * predicate pushdown; nothing is cached on the driver.
  */
class WideColumnTable(spark: SparkSession, warehouse: String, name: String) {

  private val path = s"$warehouse/$name"
  private val schemaCols = Seq("row_key", "family", "qualifier", "value")

  /** DDL: families recorded as partition values (HBaseClient.java:75-93). */
  def create(families: Seq[String]): Unit = {
    import spark.implicits._
    if (!exists) {
      families
        .map(f => ("", f, "", ""))
        .toDF(schemaCols: _*)
        .filter(lit(false)) // schema-only: write an empty partitioned table
        .write
        .partitionBy("family")
        .mode(SaveMode.Overwrite)
        .parquet(path)
    }
  }

  def exists: Boolean = Files.exists(Paths.get(path))

  private def readAll(): DataFrame =
    spark.read
      .schema("row_key STRING, qualifier STRING, value STRING, family STRING")
      .parquet(path)

  /** Batched upsert (K1, HBaseClient.java:95-111): cell-level last-write-wins
    * against existing data. `cells` must have columns
    * (row_key, family, qualifier, value). */
  def put(cells: DataFrame): Unit = {
    val incoming = cells.select(schemaCols.map(col): _*)
    val merged =
      if (!exists) incoming
      else {
        val existing = readAll().select(schemaCols.map(col): _*)
        // last-write-wins: keep existing cells only where not overwritten
        existing
          .join(incoming.select("row_key", "family", "qualifier"), Seq("row_key", "family", "qualifier"), "left_anti")
          .unionByName(incoming)
      }
    // Stage to a temp dir then swap — parquet can't overwrite its own input.
    val tmp = s"$path.tmp"
    merged.write.partitionBy("family").mode(SaveMode.Overwrite).parquet(tmp)
    val target = Paths.get(path)
    if (Files.exists(target)) {
      import scala.jdk.CollectionConverters._
      Files.walk(target).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }
    Files.move(Paths.get(tmp), target)
  }

  /** Single-row multi-column put (K2, HBaseClient.java:113-147). */
  def put(rowKey: String, family: String, pairs: Seq[(String, String)]): Unit = {
    import spark.implicits._
    put(pairs.map { case (q, v) => (rowKey, family, q, v) }.toDF(schemaCols: _*))
  }

  /** Point get (S6, HBaseClient.java:149-158). */
  def get(rowKey: String, family: String, qualifier: String): Option[String] =
    readAll()
      .filter(col("family") === family && col("row_key") === rowKey && col("qualifier") === qualifier)
      .select("value")
      .collect()
      .headOption
      .map(_.getString(0))

  /** Range scan (S3, RdlETL.java:60-73): [startRow, stopRow) with optional
    * family/qualifier projection — returned as a DataFrame, never an
    * iterator on the driver. */
  def scan(
      startRow: String,
      stopRow: String,
      family: Option[String] = None,
      qualifier: Option[String] = None): DataFrame = {
    var df = readAll().filter(col("row_key") >= startRow && col("row_key") < stopRow)
    family.foreach(f => df = df.filter(col("family") === f))
    qualifier.foreach(q => df = df.filter(col("qualifier") === q))
    df
  }

  /** Filtered scan (S4, RdlETL2.java:42-63): rows in range where cell
    * `family:qualifier == v` exists (filterIfMissing=true semantics — rows
    * without the cell drop out via the inner semi-join). */
  def scanWithValueFilter(
      startRow: String,
      stopRow: String,
      family: String,
      qualifier: String,
      v: String): DataFrame = {
    val inRange = readAll().filter(col("row_key") >= startRow && col("row_key") < stopRow)
    val matching = inRange
      .filter(col("family") === family && col("qualifier") === qualifier && col("value") === v)
      .select("row_key")
    inRange.join(matching, Seq("row_key"), "left_semi")
  }
}
