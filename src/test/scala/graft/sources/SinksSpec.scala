package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("JSONL export: partitioned, size-capped, round-trips through the JSON reader") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl").toString + "/corpus"
    val docs = (0 until 50)
      .map(i => (i.toLong, s"doc text $i", if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "text", "lang")
    Sinks.exportJsonl(docs, dir, partitionCols = Seq("lang"), maxRecordsPerFile = 10L)

    // partition directories exist and files respect the record cap
    val base = new java.io.File(dir)
    val partDirs = base.listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(partDirs === Set("lang=en", "lang=de"))
    val dataFiles = base.listFiles().filter(_.isDirectory).flatMap(_.listFiles())
      .filter(f => f.getName.endsWith(".json"))
    assert(dataFiles.nonEmpty)
    dataFiles.foreach { f =>
      val lines = scala.io.Source.fromFile(f).getLines().size
      assert(lines <= 10, s"${f.getName} has $lines lines > cap")
    }

    // round-trip: schema'd JSON read returns the exact rows
    val back = spark.read
      .schema("doc_id BIGINT, text STRING, lang STRING")
      .json(dir)
      .select("doc_id", "text", "lang")
    assert(back.count() === 50)
    assert(
      back.as[(Long, String, String)].collect().toSet ===
        docs.as[(Long, String, String)].collect().toSet)
    assert(back.filter(col("lang") === "en").count() === 25)

    // destructive-overwrite is opt-in: re-export to the same dir fails by
    // default instead of silently clobbering, succeeds with Overwrite
    intercept[org.apache.spark.sql.AnalysisException] {
      Sinks.exportJsonl(docs, dir, partitionCols = Seq("lang"))
    }
    Sinks.exportJsonl(
      docs, dir, partitionCols = Seq("lang"),
      mode = org.apache.spark.sql.SaveMode.Overwrite)
    assert(spark.read.schema("doc_id BIGINT, text STRING, lang STRING").json(dir).count() === 50)
  }
}
