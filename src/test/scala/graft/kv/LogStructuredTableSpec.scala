package graft.kv

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** LSM cost-profile parity with HBase `put` (reference HBaseClient.java:
  * 95-111): appends never touch the base, the merged view is last-write-wins
  * with tombstones, and compaction physically collapses the log without
  * changing the view. */
class LogStructuredTableSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(name: String): LogStructuredTable = {
    val wh = Files.createTempDirectory("graft-lsm").toString
    val t = new LogStructuredTable(spark, wh, name)
    t.create()
    t
  }

  private def cells(rows: (String, String, String, String)*) =
    rows.toDF("row_key", "family", "qualifier", "value")

  /** (path, size, mtime) of every file under a directory — byte-identity
    * fingerprint for the no-rewrite assertions. */
  private def fileState(dir: String): Set[(String, Long, Long)] = {
    import scala.jdk.CollectionConverters._
    val root = Paths.get(dir)
    Files.walk(root).iterator().asScala.filter(Files.isRegularFile(_))
      .map((p: Path) =>
        (root.relativize(p).toString, Files.size(p), Files.getLastModifiedTime(p).toMillis))
      .toSet
  }

  test("putLog is O(batch): base files stay byte-identical, one log dir per put") {
    val t = fresh("meters")
    t.putLog(cells(("m1", "cf", "v", "100"), ("m2", "cf", "v", "200")))
    t.compact() // seed a non-empty base
    val baseBefore = fileState(t.baseDir)
    t.putLog(cells(("m1", "cf", "v", "101")))
    t.putLog(cells(("m3", "cf", "v", "300")))
    assert(fileState(t.baseDir) === baseBefore) // append never rewrote the base
    val logDirs = new java.io.File(t.logDir).listFiles().map(_.getName).sorted
    assert(logDirs.length === 2 && logDirs.forall(_.startsWith("seq=")))
  }

  test("readView: newest seq wins per cell; untouched cells survive") {
    val t = fresh("lww")
    t.putLog(cells(("r1", "cf", "a", "1"), ("r1", "cf", "b", "2")))
    t.putLog(cells(("r1", "cf", "a", "10"), ("r2", "cf", "a", "5")))
    val v = t.readView().orderBy("row_key", "qualifier")
      .collect().map(r => (r.getString(0), r.getString(2), r.getString(3)))
    assert(v.toSeq === Seq(("r1", "a", "10"), ("r1", "b", "2"), ("r2", "a", "5")))
  }

  test("tombstone (null value) masks a cell; a later put resurrects it") {
    val t = fresh("tomb")
    t.putLog(cells(("r1", "cf", "a", "1"), ("r1", "cf", "b", "2")))
    t.putLog(Seq(("r1", "cf", "a", Option.empty[String]))
      .toDF("row_key", "family", "qualifier", "value"))
    assert(t.readView().collect().map(_.getString(2)).toSeq === Seq("b"))
    t.putLog(cells(("r1", "cf", "a", "9")))
    assert(t.readView().filter(col("qualifier") === "a").head().getString(3) === "9")
  }

  test("intra-batch duplicates resolve deterministically: non-null beats tombstone") {
    val t = fresh("dup")
    t.putLog(Seq(
      ("r1", "cf", "a", Option("3")),
      ("r1", "cf", "a", Option("7")),
      ("r1", "cf", "a", Option.empty[String])).toDF("row_key", "family", "qualifier", "value"))
    assert(t.readView().head().getString(3) === "7")
  }

  test("compact: view unchanged, log emptied, shadowed cells and tombstones physically gone") {
    val t = fresh("cpt")
    t.putLog(cells(("r1", "cf", "a", "1"), ("r2", "cf", "a", "2"), ("r3", "cf", "a", "3")))
    t.putLog(cells(("r1", "cf", "a", "10"))) // shadow
    t.putLog(Seq(("r2", "cf", "a", Option.empty[String]))
      .toDF("row_key", "family", "qualifier", "value")) // tombstone
    val before = t.readView().orderBy("row_key", "qualifier").collect().toSeq
    t.compact()
    assert(t.readView().orderBy("row_key", "qualifier").collect().toSeq === before)
    assert(!Files.exists(Paths.get(t.logDir)))
    // physical: the compacted base holds exactly the live cells — no "1",
    // no r2 row, no null values anywhere
    val base = spark.read.parquet(t.baseDir)
    assert(base.count() === 2)
    assert(base.filter(col("value").isNull || col("row_key") === "r2").count() === 0)
    // and the table keeps accepting appends after compaction (seq monotone
    // across the compact: directory listing restarts at 1 — fine, the base
    // already holds everything older)
    t.putLog(cells(("r4", "cf", "a", "4")))
    assert(t.readView().count() === 3)
  }

  test("view equals WideColumnTable.put semantics for the same batch sequence") {
    // same batches through the rewrite-based facade and the log-structured
    // one: identical final state (two implementations, one contract)
    val wh = Files.createTempDirectory("graft-lsm-eq").toString
    val w = new WideColumnTable(spark, wh, "a"); w.create(Seq("cf"))
    val l = new LogStructuredTable(spark, wh, "b"); l.create()
    val b1 = cells(("r1", "cf", "x", "1"), ("r2", "cf", "x", "2"))
    val b2 = cells(("r1", "cf", "x", "5"), ("r3", "cf", "y", "7"))
    w.put(b1); w.put(b2)
    l.putLog(b1); l.putLog(b2)
    val fromW = w.scan("r", "s").select("row_key", "family", "qualifier", "value")
      .orderBy("row_key", "qualifier").collect().toSeq
    val fromL = l.readView().orderBy("row_key", "qualifier").collect().toSeq
    assert(fromL === fromW)
  }
}
