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

  /** On-disk location (tests assert partition-level file stability). */
  def dataPath: String = path

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

  /** Storage-status probe — K6 parity (HBaseClient.java:67-73 logs
    * per-RegionServer heap; the parquet analog is per-family storage
    * footprint). One row per `family=` partition: file count and bytes
    * from filesystem metadata only — no data is read, the same cost class
    * as the reference's admin RPC. Cell counts live in `observe()`
    * metrics / `q_count`, not here, precisely so status stays metadata-
    * cheap on a 100 TB table. */
  def status(): Seq[(String, Int, Long)] = {
    val root = new java.io.File(path)
    if (!root.exists()) Seq.empty
    else
      root
        .listFiles()
        .filter(d => d.isDirectory && d.getName.startsWith("family="))
        .map { d =>
          val parts = d.listFiles().filter(_.getName.endsWith(".parquet"))
          (d.getName.stripPrefix("family="), parts.length, parts.map(_.length()).sum)
        }
        .sortBy(_._1)
        .toSeq
  }

  private def readAll(): DataFrame =
    spark.read
      .schema("row_key STRING, qualifier STRING, value STRING, family STRING")
      .parquet(path)

  /** Batched upsert (K1, HBaseClient.java:95-111): cell-level last-write-wins
    * against existing data. `cells` must have columns
    * (row_key, family, qualifier, value).
    *
    * Incremental: only the `family` partitions present in the batch are
    * read, merged, and rewritten — untouched families' files are left
    * byte-identical on disk (asserted in WideColumnTableSpec). This mirrors
    * HBase's cost profile, where a put is O(batch) against one column
    * family's store, not O(table): partition pruning bounds the read side
    * to the touched directories and the swap replaces only those
    * directories. The touched-family list reaches the driver, which is safe
    * by design — column families are a bounded schema-level set (HBase
    * tables have a handful), never data-scale. */
  def put(cells: DataFrame): Unit = {
    val incoming = cells.select(schemaCols.map(col): _*)
    if (!exists) {
      incoming.write.partitionBy("family").mode(SaveMode.Overwrite).parquet(path)
      return
    }
    val families =
      incoming.select("family").distinct().collect().map(_.getString(0)).toSeq.sorted
    if (families.isEmpty) return
    // Partition pruning: only the touched family=… directories are scanned.
    val existing = readAll()
      .filter(col("family").isin(families: _*))
      .select(schemaCols.map(col): _*)
    // last-write-wins: keep existing cells only where not overwritten
    val merged = existing
      .join(
        incoming.select("row_key", "family", "qualifier"),
        Seq("row_key", "family", "qualifier"),
        "left_anti")
      .unionByName(incoming)
    // Stage to a temp dir then swap the touched family dirs — parquet can't
    // overwrite its own input.
    val tmp = s"$path.tmp"
    merged.write.partitionBy("family").mode(SaveMode.Overwrite).parquet(tmp)
    import scala.jdk.CollectionConverters._
    def deleteTree(p: java.nio.file.Path): Unit =
      if (Files.exists(p))
        Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    // Enumerate the partition dirs Spark actually wrote rather than
    // reconstructing `family=$f` names: Spark percent-escapes special
    // characters in partition paths (`=`, `:`, `%`, …; null →
    // __HIVE_DEFAULT_PARTITION__), so a literal-name lookup silently skips
    // the swap for such families and drops the batch's cells. The on-disk
    // names under tmp are exactly the touched set, already escaped the same
    // way they appear under `path`.
    new java.io.File(tmp)
      .listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("family="))
      .foreach { src =>
        val dst = Paths.get(path, src.getName)
        deleteTree(dst)
        Files.move(src.toPath, dst)
      }
    deleteTree(Paths.get(tmp))
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
