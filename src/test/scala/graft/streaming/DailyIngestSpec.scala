package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DailyIngestSpec extends SparkSpec {
  import spark.implicits._

  private def writeEvents(dir: String): Unit =
    Seq(
      (1L, Timestamp.valueOf("2024-01-01 05:00:00"), 7L, "m", 100.0, "{}"),
      (2L, Timestamp.valueOf("2024-01-01 09:00:00"), 7L, "m", 999.0, "{}"), // same (user, day)
      (3L, Timestamp.valueOf("2024-01-02 01:00:00"), 7L, "m", 120.0, "{}"),
      (4L, Timestamp.valueOf("2024-01-02 02:00:00"), 8L, "k", 50.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", expr("unix_micros(ts) * 1000")) // same nanos-long layout as testdata
      .write
      .mode("overwrite")
      .parquet(dir)

  test("AvailableNow backlog drain: watermarked dedup keeps one reading per (user, day)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString + "/events"
    writeEvents(dir)
    val out = DailyIngest
      .runAvailableNow(
        DailyIngest.dedupedReadings(DailyIngest.readEvents(spark, dir)),
        "readings_test")
      .map(r => (r.getLong(0), r.getDate(1).toString))
    assert(out.toSet === Set((7L, "2024-01-01"), (7L, "2024-01-02"), (8L, "2024-01-02")))
  }

  test("readEvents fails loudly on a planted alien file in the events directory") {
    // The batch reader pins its column list; the streaming reader must hold
    // the same discipline — a foreign table's parquet in the globbed
    // directory previously surfaced as silent nulls under the declared
    // events schema. The construction-time mergeSchema footer check turns
    // that into an immediate, named failure.
    val dir = java.nio.file.Files.createTempDirectory("graft-alien").toString + "/events"
    writeEvents(dir)
    Seq((1L, "some doc text", "web"))
      .toDF("doc_id", "text", "source") // an alien documents-shaped file
      .coalesce(1)
      .write.mode("append").parquet(dir)
    val e = intercept[IllegalArgumentException] {
      DailyIngest.readEvents(spark, dir)
    }
    assert(e.getMessage.contains("not events-only"))
    assert(e.getMessage.contains("doc_id"))
  }

  test("stateful incremental W1: adjacent-day deltas with guards, state across batches") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString + "/events"
    Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 05:00:00"), 7L, "m", 100.0, "{}"),
      (2L, java.sql.Timestamp.valueOf("2024-01-02 05:00:00"), 7L, "m", 120.0, "{}"),
      (3L, java.sql.Timestamp.valueOf("2024-01-03 05:00:00"), 7L, "m", 110.0, "{}"), // rollback
      (4L, java.sql.Timestamp.valueOf("2024-01-04 05:00:00"), 7L, "m", 115.0, "{}"),
      (5L, java.sql.Timestamp.valueOf("2024-01-06 05:00:00"), 7L, "m", 200.0, "{}")) // gap
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", expr("unix_micros(ts) * 1000"))
      .write.mode("overwrite").parquet(dir)
    val out = DailyIngest
      .runAvailableNow(
        DailyIngest.incrementalDailyEnergy(
          DailyIngest.dedupedReadings(DailyIngest.readEvents(spark, dir))),
        "rdl_test")
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getDouble(2)))
      .toSet
    // 01→02: +20; 02→03 rollback -> dropped; 03→04: +5; 04→06 gap -> dropped
    assert(out === Set((7L, "2024-01-01", 20.0), (7L, "2024-01-03", 5.0)))
  }

  test("incremental parquet sink: checkpoint resume processes each file batch exactly once") {
    val base = java.nio.file.Files.createTempDirectory("graft-incr").toString
    val (src, out, ckpt) = (s"$base/events", s"$base/out", s"$base/ckpt")
    def writeBatch(file: String, rows: Seq[(Long, String, Long)]): Unit =
      rows
        .map { case (id, ts, uid) => (id, Timestamp.valueOf(ts), uid, "m", 1.0, "{}") }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .withColumn("ts", expr("unix_micros(ts) * 1000"))
        .coalesce(1)
        .write.mode("append").parquet(src)

    def ingest(): Unit = DailyIngest.runIncremental(
      DailyIngest
        .readEvents(spark, src)
        .select(col("event_id"), col("user_id"), to_date(col("ts")).as("rd_date"), col("value")),
      out,
      ckpt)

    writeBatch("b1", Seq((1L, "2024-01-01 05:00:00", 7L), (2L, "2024-01-01 06:00:00", 8L)))
    ingest()
    assert(spark.read.parquet(out).count() === 2)

    writeBatch("b2", Seq((3L, "2024-01-02 05:00:00", 7L)))
    ingest() // same checkpoint: only the new file is read
    val ids = spark.read.parquet(out).select("event_id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq === Seq(1L, 2L, 3L)) // batch 1 NOT duplicated, batch 2 present

    ingest() // nothing new: a no-op, still exactly once
    assert(spark.read.parquet(out).count() === 3)
  }

  test("streaming session_window matches the batch operator on the same data") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString + "/events"
    Seq(
      (1L, Timestamp.valueOf("2024-01-01 05:00:00"), 7L, "m", 1.0, "{}"),
      (2L, Timestamp.valueOf("2024-01-01 05:10:00"), 7L, "m", 1.0, "{}"), // same session
      (3L, Timestamp.valueOf("2024-01-01 06:30:00"), 7L, "m", 1.0, "{}"), // gap > 30m: new session
      (4L, Timestamp.valueOf("2024-01-01 05:05:00"), 8L, "k", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", expr("unix_micros(ts) * 1000"))
      .write.mode("overwrite").parquet(dir)
    val streamed = DailyIngest
      .runAvailableNow(
        DailyIngest.sessionize(DailyIngest.readEvents(spark, dir)),
        "sessions_test",
        outputMode = "complete")
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // batch: identical aggregation over the same files through the batch reader
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val batch = spark.read
      .schema("event_id BIGINT, ts BIGINT, user_id BIGINT, event_type STRING, value DOUBLE, props STRING")
      .parquet(dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        expr("unix_micros(sw.start)").as("start_us"),
        expr("unix_micros(sw.end)").as("end_us"),
        col("n_events"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(streamed === batch)
    assert(streamed.size === 3) // (7: two sessions), (8: one)
    assert(streamed.map(_._1) === Set(7L, 8L))
  }

  test("tumbling daily aggregation over the stream (complete mode)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString + "/events"
    writeEvents(dir)
    val out = DailyIngest
      .runAvailableNow(
        DailyIngest.dailyAggregates(DailyIngest.readEvents(spark, dir)),
        "agg_test",
        outputMode = "complete")
      .map(r => (r.getDate(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSet === Set(
      ("2024-01-01", "m", 2L, 1099.0),
      ("2024-01-02", "m", 1L, 120.0),
      ("2024-01-02", "k", 1L, 50.0)))
  }
}
