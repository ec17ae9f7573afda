package graft.kv

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The reference's own de facto test, at pipeline scope: create table, put
  * cells, read one back (HBaseClient.java:28-39 round-trip), plus upsert
  * last-write-wins, range scan bounds, and filterIfMissing scan semantics. */
class WideColumnTableSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(name: String): WideColumnTable = {
    val wh = java.nio.file.Files.createTempDirectory("graft-kv").toString
    new WideColumnTable(spark, wh, name)
  }

  test("create/exists/put/get round-trip (HBaseClient demo parity)") {
    val t = freshTable("student")
    assert(!t.exists)
    t.create(Seq("score"))
    assert(t.exists)
    t.put("zhangsan", "score", Seq("math" -> "90", "english" -> "85", "physics" -> "77"))
    assert(t.get("zhangsan", "score", "english") === Some("85"))
    assert(t.get("zhangsan", "score", "missing") === None)
    assert(t.get("nobody", "score", "math") === None)
  }

  test("status probe: per-family footprint from metadata only (K6 parity)") {
    val t = freshTable("status_t")
    t.create(Seq("cf1", "cf2"))
    t.put("r1", "cf1", Seq("a" -> "1", "b" -> "2"))
    t.put("r2", "cf2", Seq("c" -> "3"))
    val st = t.status().map { case (f, n, b) => f -> ((n, b)) }.toMap
    assert(st.keySet === Set("cf1", "cf2"))
    assert(st("cf1")._1 > 0 && st("cf1")._2 > 0L, "cf1 must report files and bytes")
    assert(st("cf2")._1 > 0 && st("cf2")._2 > 0L)
  }

  test("upsert is cell-level last-write-wins") {
    val t = freshTable("fact")
    t.create(Seq("bmz"))
    t.put("0401_7", "bmz", Seq("20240101" -> "100", "20240102" -> "110"))
    t.put("0401_7", "bmz", Seq("20240102" -> "115", "20240103" -> "120"))
    assert(t.get("0401_7", "bmz", "20240101") === Some("100")) // untouched survives
    assert(t.get("0401_7", "bmz", "20240102") === Some("115")) // overwritten
    assert(t.get("0401_7", "bmz", "20240103") === Some("120")) // inserted
  }

  test("put is incremental: untouched family partitions stay byte-identical") {
    val t = freshTable("families")
    t.create(Seq("cf1", "cf2"))
    t.put(Seq(
      ("r1", "cf1", "a", "1"),
      ("r1", "cf2", "b", "2")
    ).toDF("row_key", "family", "qualifier", "value"))

    def familyFiles(fam: String): Map[String, Seq[Byte]] = {
      val dir = new java.io.File(t.dataPath, s"family=$fam")
      dir.listFiles().filter(_.getName.endsWith(".parquet")).map { f =>
        f.getName -> java.nio.file.Files.readAllBytes(f.toPath).toSeq
      }.toMap
    }
    val cf2Before = familyFiles("cf2")
    assert(cf2Before.nonEmpty)

    // touches only cf1 → cf2's files must not be rewritten
    t.put(Seq(("r1", "cf1", "a", "9")).toDF("row_key", "family", "qualifier", "value"))
    assert(familyFiles("cf2") === cf2Before, "cf2 partition was rewritten")
    assert(t.get("r1", "cf1", "a") === Some("9"))
    assert(t.get("r1", "cf2", "b") === Some("2"))
  }

  test("put survives family names Spark escapes in partition paths") {
    // `=` and `:` are percent-escaped on disk (family=a%3Db%3Ac); the swap
    // must track the escaped dir names or the batch is silently dropped.
    val t = freshTable("escaped")
    val fam = "a=b:c"
    t.put(Seq(("r1", fam, "q1", "v1")).toDF("row_key", "family", "qualifier", "value"))
    assert(t.get("r1", fam, "q1") === Some("v1"))
    // incremental path (table already exists) is where the bug lived
    t.put(Seq(("r1", fam, "q1", "v2"), ("r2", fam, "q2", "w")).toDF(
      "row_key", "family", "qualifier", "value"))
    assert(t.get("r1", fam, "q1") === Some("v2"))
    assert(t.get("r2", fam, "q2") === Some("w"))
  }

  test("range scan: [start, stop) prefix bounds + projections") {
    val t = freshTable("scan")
    t.create(Seq("info"))
    t.put(Seq(
      ("0401_1", "info", "cldbs", "1"),
      ("0402_2", "info", "cldbs", "2"),
      ("0402_3", "info", "cldbs", "3"),
      ("0403_4", "info", "cldbs", "4")
    ).toDF("row_key", "family", "qualifier", "value"))
    val hit = t.scan("0402", "0403").select("row_key").as[String].collect().sorted
    assert(hit.toSeq === Seq("0402_2", "0402_3"))
    assert(t.scan("0402", "0403", family = Some("nope")).count() === 0)
  }

  test("filtered scan drops rows missing the filter cell (filterIfMissing)") {
    val t = freshTable("flagged")
    t.create(Seq("bmz"))
    t.put(Seq(
      ("0401_1", "bmz", "DATA", "1"),
      ("0401_1", "bmz", "20240101", "100"),
      ("0401_2", "bmz", "20240101", "50") // no DATA cell -> whole row excluded
    ).toDF("row_key", "family", "qualifier", "value"))
    val rows = t
      .scanWithValueFilter("0401", "0402", "bmz", "DATA", "1")
      .select("row_key")
      .distinct()
      .as[String]
      .collect()
    assert(rows.toSeq === Seq("0401_1"))
  }
}
