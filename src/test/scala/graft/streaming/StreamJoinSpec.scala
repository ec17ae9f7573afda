package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("stream-stream attribution equals the batch join on the real fixture") {
    // file-source dir must contain only events files — stage a copy
    val dir = java.nio.file.Files.createTempDirectory("graft-sjoin").toString + "/events"
    new java.io.File(dir).mkdirs()
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))

    val streamed = DailyIngest
      .runAvailableNow(
        StreamJoin.attribution(DailyIngest.readEvents(spark, dir)),
        "attr_stream")
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val batch = StreamJoin
      .attribution(Tables.events(spark, sfDir))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(batch.nonEmpty, "fixture produced no attributed pairs")
    assert(streamed === batch)
  }

  test("purchase arriving after the watermark finds evicted click state and is dropped") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val events = src.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = StreamJoin.attribution(events).writeStream
      .format("memory").queryName("attr_late").outputMode("append").start()
    def row(id: Long, ts: String, u: Long, t: String, v: Double) =
      (id, Timestamp.valueOf(ts), u, t, v, "{}")
    // batch 1: a matching pair, plus 20:00 sentinels on BOTH sides (the
    // global watermark is the MIN over all watermark operators, so each
    // side must advance) — the post-batch watermark (delay 1 h) lands at
    // 19:00, far past click 1's eviction bound c_ts + horizon = 12:00.
    // The sentinels share no user, so they pair with nothing.
    src.addData(
      row(1L, "2024-03-01 10:00:00", 7L, "click", 0.0),
      row(2L, "2024-03-01 10:30:00", 7L, "purchase", 50.0),
      row(3L, "2024-03-01 20:00:00", 8L, "click", 0.0),
      row(5L, "2024-03-01 20:00:00", 9L, "purchase", 1.0))
    q.processAllAvailable()
    // batch 2: a purchase 8+ hours below the watermark aimed at click 1,
    // whose buffered state the advanced watermark has already evicted
    src.addData(row(4L, "2024-03-01 10:40:00", 7L, "purchase", 99.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("attr_late").collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSet
    // only the on-time purchase attributes; the late one met evicted state
    assert(out === Set((1L, 2L)))
  }
}
