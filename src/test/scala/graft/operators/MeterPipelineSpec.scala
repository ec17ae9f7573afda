package graft.operators

import java.sql.Date
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unit fixtures from FIXTURES.md §3: the W1 guard matrix
  * (reference RdlETL2.java:76, 95-100), A1 first-wins dedup
  * (RdlETL.java:106-126), and J1 join-miss drop (RdlETL.java:110-114). */
class MeterPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def factsDf(rows: Seq[(String, String, Double)]): DataFrame =
    rows
      .map { case (k, d, v) => (k, Date.valueOf(d), v) }
      .toDF("row_key", "rd_date", "bmz")

  private def dimDf(rows: Seq[(String, java.lang.Double)]): DataFrame =
    rows.toDF("row_key", "zhbl")

  private def rdlMap(facts: DataFrame, dim: DataFrame): Map[(String, String), Option[Double]] =
    MeterPipeline
      .dailyEnergy(facts, dim)
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString) -> Option(r.get(2)).map(_.asInstanceOf[Double]))
      .toMap

  test("W1 guard matrix: delta × multiplier with guards and defaults") {
    val facts = factsDf(Seq(
      ("A_1", "2024-01-01", 100.0), ("A_1", "2024-01-02", 110.0), ("A_1", "2024-01-03", 110.0),
      ("B_2", "2024-01-01", 100.0), ("B_2", "2024-01-02", 90.0), // rollover: tom < cur
      ("C_3", "2024-01-01", 0.0), ("C_3", "2024-01-02", 50.0), // cur = 0
      ("D_4", "2024-01-01", 50.0), // next day missing -> reads 0
      ("E_5", "2024-01-01", 100.0), ("E_5", "2024-01-02", 120.0) // zhbl missing -> default 1
    ))
    val dim = dimDf(Seq(("A_1", 2.0), ("B_2", 1.0), ("C_3", 1.0), ("D_4", 1.0), ("E_5", null)))
    val m = rdlMap(facts, dim)
    assert(m(("A_1", "2024-01-01")) === Some(20.0)) // (110-100)*2
    assert(m(("A_1", "2024-01-02")) === Some(0.0)) // tom == cur allowed
    assert(m(("B_2", "2024-01-01")) === None) // rollover
    assert(m(("C_3", "2024-01-01")) === None) // cur = 0
    assert(m(("D_4", "2024-01-01")) === None) // missing day -> 0 -> guard
    assert(m(("E_5", "2024-01-01")) === Some(20.0)) // default multiplier 1
  }

  test("W1 dense grid covers the whole range with NULLs for absent days") {
    val facts = factsDf(Seq(("A_1", "2024-01-01", 100.0), ("A_1", "2024-01-02", 110.0)))
    val dim = dimDf(Seq(("A_1", 1.0)))
    val out = MeterPipeline.dailyEnergy(facts, dim)
    assert(out.count() === MeterPipeline.DayStrings.size) // 30 days, one meter
    assert(out.filter(col("rdl").isNotNull).count() === 1)
  }

  test("W1 sparse variant equals dense variant's non-null rows") {
    val facts = factsDf(Seq(
      ("A_1", "2024-01-01", 100.0), ("A_1", "2024-01-02", 110.0), ("A_1", "2024-01-05", 200.0),
      ("A_1", "2024-01-06", 190.0), ("B_2", "2024-01-10", 10.0), ("B_2", "2024-01-11", 30.0)))
    val dim = dimDf(Seq(("A_1", 2.0), ("B_2", 3.0)))
    val dense = MeterPipeline
      .dailyEnergy(facts, dim)
      .filter(col("rdl").isNotNull)
      .orderBy("row_key", "rd_date")
      .collect()
      .toSeq
    val sparse = MeterPipeline
      .dailyEnergySparse(facts, dim)
      .orderBy("row_key", "rd_date")
      .collect()
      .toSeq
    assert(dense === sparse)
  }

  test("R1 fused pivot equals dense pivot on the guard-matrix fixture") {
    val facts = factsDf(Seq(
      ("A_1", "2024-01-01", 100.0), ("A_1", "2024-01-02", 110.0), ("A_1", "2024-01-03", 110.0),
      ("B_2", "2024-01-01", 100.0), ("B_2", "2024-01-02", 90.0),
      ("E_5", "2024-01-01", 100.0), ("E_5", "2024-01-02", 120.0)))
    val dim = Seq(
      ("A_1", java.lang.Double.valueOf(2.0), "custA"),
      ("B_2", java.lang.Double.valueOf(1.0), "custB"),
      ("E_5", null.asInstanceOf[java.lang.Double], "custE"))
      .toDF("row_key", "zhbl", "yhbh")
    val dense = MeterPipeline
      .pivotExport(MeterPipeline.dailyEnergy(facts, dim), dim)
      .orderBy("yhbh")
      .collect()
      .map(_.toSeq)
      .toSeq
    val fused =
      MeterPipeline.pivotExportFused(facts, dim).orderBy("yhbh").collect().map(_.toSeq).toSeq
    assert(dense === fused)
  }

  test("A1 first-wins dedup and J1 join-miss drop in factLoad") {
    val events = Seq(
      (1L, Timestamp.valueOf("2024-01-01 05:00:00"), 7L, "m", 100.0, "{}"),
      (2L, Timestamp.valueOf("2024-01-01 09:00:00"), 7L, "m", 999.0, "{}"), // same day dup: dropped
      (3L, Timestamp.valueOf("2024-01-02 01:00:00"), 7L, "m", 120.0, "{}"),
      (4L, Timestamp.valueOf("2024-01-01 01:00:00"), 8L, "m", 50.0, "{}") // no dim row: dropped
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dim = Seq(("7", "0401_7")).toDF("cldbs", "row_key")
    val out = MeterPipeline.factLoad(events, dim).orderBy("rd_date").collect()
    assert(out.length === 2) // user 8 dropped (join miss), dup dropped
    assert(out(0).getAs[Double]("bmz") === 100.0) // first event wins, not 999
    assert(out.forall(_.getAs[String]("row_key") == "0401_7"))
  }

  test("2.13 observability: ingest metrics accumulate in the one pass, misses = input - loaded") {
    val events = Seq(
      (1L, Timestamp.valueOf("2024-01-01 05:00:00"), 7L, "m", 100.0, "{}"),
      (2L, Timestamp.valueOf("2024-01-01 09:00:00"), 7L, "m", 999.0, "{}"), // same-day dup
      (3L, Timestamp.valueOf("2024-01-02 01:00:00"), 7L, "m", 0.0, "{}"), // non-positive reading
      (4L, Timestamp.valueOf("2024-01-01 01:00:00"), 8L, "m", 50.0, "{}"), // join miss
      (5L, Timestamp.valueOf("2024-01-02 01:00:00"), 8L, "m", 60.0, "{}") // join miss
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dim = Seq(("7", "0401_7")).toDF("cldbs", "row_key")
    val (out, inputObs, loadedObs) = MeterPipeline.factLoadObserved(events, dim)
    assert(out.count() === 2) // user 7's two days
    assert(inputObs.get("n") === 4L) // post-dedup readings
    assert(inputObs.get("n_nonpositive") === 1L) // the 0.0 reading
    assert(loadedObs.get("n") === 2L)
    assert(inputObs.get("n").asInstanceOf[Long] - loadedObs.get("n").asInstanceOf[Long] === 2L) // join misses
    // observed plan returns the same rows as the plain factLoad
    assert(
      out.collect().map(_.toSeq).toSet ===
        MeterPipeline.factLoad(events, dim).collect().map(_.toSeq).toSet)
  }

  test("R1 pivot: one row per yhbh, one column per day, values = rdl") {
    val facts = factsDf(Seq(("A_1", "2024-01-01", 100.0), ("A_1", "2024-01-02", 110.0)))
    val dim = Seq(("A_1", 1.0, "CUST-A")).toDF("row_key", "zhbl", "yhbh")
    val rdl = MeterPipeline.dailyEnergy(facts, dim)
    val wide = MeterPipeline.pivotExport(rdl, dim)
    assert(wide.columns.toSeq === ("yhbh" +: MeterPipeline.DayStrings.map("d" + _)))
    val row = wide.collect().head
    assert(row.getAs[String]("yhbh") === "CUST-A")
    assert(row.getAs[Double]("d20240101") === 10.0)
    assert(row.isNullAt(wide.columns.indexOf("d20240102"))) // next day missing
  }

  test("end-to-end pipeline replay: ingest -> derive -> pivot -> partitioned CSV golden") {
    import java.sql.Timestamp
    // Two meters in different org prefixes; meter 7 has two adjacent days.
    val events = Seq(
      (1L, Timestamp.valueOf("2024-01-01 05:00:00"), 7L, "m", 100.0, "{}"),
      (2L, Timestamp.valueOf("2024-01-02 05:00:00"), 7L, "m", 120.0, "{}"),
      (3L, Timestamp.valueOf("2024-01-01 06:00:00"), 8L, "m", 50.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dim = Seq(
      ("7", "0401_7", "0401", 2.0, "CUST-7"),
      ("8", "0402_8", "0402", 1.0, "CUST-8")
    ).toDF("cldbs", "row_key", "gdj", "zhbl", "yhbh")
    val facts = MeterPipeline.factLoad(events, dim)
    val rdl = MeterPipeline.dailyEnergy(facts, dim)
    val wide = MeterPipeline
      .pivotExport(rdl, dim)
      .join(dim.select("yhbh", "gdj").distinct(), Seq("yhbh"))
    val dir = java.nio.file.Files.createTempDirectory("graft-e2e").toString + "/out"
    MeterPipeline.exportCsv(wide, dir, partitionCols = Seq("gdj"))
    // One directory per org prefix (RdlETL3.java:37), header + golden values.
    val d1 = new java.io.File(s"$dir/gdj=0401")
    val d2 = new java.io.File(s"$dir/gdj=0402")
    assert(d1.isDirectory && d2.isDirectory)
    val csv = d1.listFiles().filter(_.getName.endsWith(".csv")).head
    val lines = scala.io.Source.fromFile(csv).getLines().toSeq
    assert(lines.head === ("yhbh" +: MeterPipeline.DayStrings.map("d" + _)).mkString(","))
    val row7 = lines(1).split(",", -1)
    assert(row7(0) === "CUST-7")
    assert(row7(1) === "40.0") // (120-100)*2 on 2024-01-01
    assert(row7.drop(2).forall(_ == "")) // all other days empty
  }

  test("K3/K4 CSV export: header, overwrite, size-capped files, null as empty") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv").toString + "/out"
    val facts = factsDf(Seq(("A_1", "2024-01-01", 100.0), ("A_1", "2024-01-02", 110.0)))
    val dim = Seq(("A_1", 1.0, "CUST-A")).toDF("row_key", "zhbl", "yhbh")
    val wide = MeterPipeline.pivotExport(MeterPipeline.dailyEnergy(facts, dim), dim)
    MeterPipeline.exportCsv(wide, dir, maxRecordsPerFile = 1)
    MeterPipeline.exportCsv(wide, dir, maxRecordsPerFile = 1) // K4: overwrite works
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".csv"))
    assert(files.nonEmpty)
    val lines = scala.io.Source.fromFile(files.head).getLines().toSeq
    assert(lines.head.startsWith("yhbh,d20240101"))
    assert(lines(1).contains("CUST-A,10.0,")) // null day -> consecutive commas
  }
}
