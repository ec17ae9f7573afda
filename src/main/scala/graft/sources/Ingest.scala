package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Fault-tolerant ingest readers — the arrival-side robustness a 100 TB
  * pipeline needs: raw JSONL always contains some malformed lines, and a
  * long-lived parquet corpus always spans writer-schema generations.
  * Both readers keep the failure handling inside the declarative plan
  * (no try/catch per record, no driver involvement), so they scale like
  * any other scan.
  */
object Ingest {

  /** JSONL read that ROUTES malformed lines instead of dropping or
    * failing: returns (good, quarantine) where `good` is the parsed rows
    * in `schema` column order and `quarantine` carries each unparseable
    * raw line for offline inspection/replay.
    *
    * Built as `from_json` over a text scan rather than
    * `spark.read.json` + `_corrupt_record`: the datasource corrupt-column
    * route requires caching the parsed frame to even filter on it (Spark
    * refuses a query referencing only the internal corrupt column) — a
    * non-starter at corpus scale. Here each branch is an independent
    * lazy plan over the same text source: no cache, no shared state, and
    * the text scan is whole-stage-codegen friendly.
    *
    * Corruption contract: `from_json` in PERMISSIVE mode yields a struct
    * whose corrupt-record field carries the raw text iff the line failed
    * to parse (a missing attribute is NOT corruption — it parses with
    * that column null). A line is quarantined iff that field is set.
    * Blank lines (a trailing newline artifact) are dropped from both
    * sides. */
  def jsonlWithQuarantine(
      spark: SparkSession,
      path: String,
      schema: StructType): (DataFrame, DataFrame) = {
    val crCol = "__graft_corrupt"
    require(!schema.fieldNames.contains(crCol), s"schema may not contain $crCol")
    val parseSchema = schema.add(crCol, "string")
    val parsed = spark.read
      .text(path)
      .filter(length(trim(col("value"))) > 0)
      .select(
        col("value"),
        from_json(col("value"), parseSchema, Map("columnNameOfCorruptRecord" -> crCol).asJava)
          .as("r"))
    // `null` is valid JSON but parses to a null STRUCT with no corrupt
    // field to inspect — without the isNotNull guard it would flow into
    // `good` as an all-null row instead of quarantining.
    val good = parsed
      .filter(col("r").isNotNull && col(s"r.$crCol").isNull)
      .select(schema.fieldNames.map(f => col(s"r.$f")).toIndexedSeq: _*)
    val quarantine = parsed
      .filter(col("r").isNull || col(s"r.$crCol").isNotNull)
      .select(col("value").as("raw_line"))
    (good, quarantine)
  }

  /** Parquet read across writer-schema generations, projected to one
    * canonical schema: `mergeSchema=true` unifies what the footers
    * declare (older files simply lack newer columns), then any canonical
    * column absent from EVERY generation is filled with typed nulls, and
    * the output is projected to exactly `canonical`'s columns in order —
    * so downstream operators see one stable shape regardless of which
    * file generation a partition came from.
    *
    * Scale note: mergeSchema's footer unification is a driver-side
    * metadata pass over file footers (not data); the per-file column
    * gaps are filled by the parquet reader itself as nulls, row-group
    * locally. Columns must only EVOLVE by addition — a type change for
    * an existing name fails the merge loudly, which is the correct
    * behavior (silent coercion would corrupt downstream). */
  def parquetEvolving(spark: SparkSession, dir: String, canonical: StructType): DataFrame = {
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    val present = merged.schema.fieldNames.toSet
    // Cast present columns too: mergeSchema only unifies what the footers
    // agree on — a generation written before a column was WIDENED (int
    // doc_id vs canonical long) merges without conflict at the old type,
    // and an uncast projection would leak it downstream.
    merged
      .select(canonical.fields.map { f =>
        if (present.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
        else lit(null).cast(f.dataType).as(f.name)
      }.toIndexedSeq: _*)
  }
}
