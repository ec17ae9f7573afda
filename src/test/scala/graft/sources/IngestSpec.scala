package graft.sources

import org.apache.spark.sql.types._

import graft.SparkSpec

class IngestSpec extends SparkSpec {
  import spark.implicits._

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  test("jsonlWithQuarantine: malformed lines route to quarantine, good rows parse in schema order") {
    val dir = java.nio.file.Files.createTempDirectory("graft-quar").toString
    val lines = Seq(
      """{"doc_id": 1, "text": "alpha", "lang": "en"}""",
      """{"doc_id": 2, "text": "beta"}""", // missing column -> good, lang null
      """{"doc_id": 3, "text": "gamma",""", // truncated mid-object
      """not json at all""",
      "", // blank artifact: dropped from both sides
      "null", // valid JSON, null struct: must quarantine, not emit all-nulls
      """{"doc_id": 4, "text": "delta", "lang": "de"}"""
    )
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part-0.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))

    val (good, quarantine) = Ingest.jsonlWithQuarantine(spark, dir, docSchema)
    assert(good.columns.toSeq === Seq("doc_id", "text", "lang"))
    val g = good.collect().map(r => (r.getLong(0), r.getString(1), Option(r.getString(2))))
    assert(g.sortBy(_._1).toSeq === Seq(
      (1L, "alpha", Some("en")),
      (2L, "beta", None),
      (4L, "delta", Some("de"))))
    val q = quarantine.collect().map(_.getString(0)).sorted
    assert(q.toSeq === Seq("not json at all", "null", """{"doc_id": 3, "text": "gamma","""))
  }

  test("parquetEvolving: generations merge by addition; never-written canonical columns null-fill") {
    val dir = java.nio.file.Files.createTempDirectory("graft-evolve").toString
    // generation 1: (doc_id, text)
    Seq((1L, "old one"), (2L, "old two"))
      .toDF("doc_id", "text")
      .write.parquet(dir + "/gen=1")
    // generation 2 adds lang
    Seq((3L, "new one", "en"))
      .toDF("doc_id", "text", "lang")
      .write.parquet(dir + "/gen=2")

    val canonical = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("lang", StringType),
      StructField("quality", DoubleType))) // in no generation yet
    val out = Ingest.parquetEvolving(spark, dir, canonical)
    assert(out.columns.toSeq === Seq("doc_id", "text", "lang", "quality"))
    val rows = out.collect().map(r =>
      (r.getLong(0), r.getString(1), Option(r.getString(2)), r.isNullAt(3)))
    assert(rows.sortBy(_._1).toSeq === Seq(
      (1L, "old one", None, true),
      (2L, "old two", None, true),
      (3L, "new one", Some("en"), true)))
  }
}
