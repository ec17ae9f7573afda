package graft.streaming

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

class StreamingAnomalySpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def asRows(df: org.apache.spark.sql.DataFrame): Seq[(Long, String, Long, Double)] =
    df.select(col("user_id"), col("d").cast("string"), col("c"), col("z"))
      .as[(Long, String, Long, Double)]
      .collect()
      .toSeq
      .sortBy(r => (r._1, r._2))

  test("typed state pipeline equals the window-based oracle twin on the real fixture") {
    val ev = Tables.events(spark, dir)
    val batchTwin = asRows(graft.operators.Analytics.userRateAnomalyOnline(ev))
    val stateTwin = asRows(StreamingAnomaly.detectBatch(ev))
    assert(batchTwin.nonEmpty, "fixture produced no online anomalies — weaken zThresh")
    assert(stateTwin === batchTwin)
  }

  test("state carries across micro-batches: day-split drains equal the one-shot run") {
    val ev = Tables.events(spark, dir)
    val counts = StreamingAnomaly
      .dailyCounts(ev)
      .as[StreamingAnomaly.DayCount]
      .collect()
      .sortBy(r => (r.user_id, r.d.getTime))
    val days = counts.map(_.d.getTime).distinct.sorted
    val cut = days(days.length / 2)
    // two ordered batches per user (the daily-ingest contract), one detector
    // run each, state threaded manually through the same fold the streaming
    // state store would carry
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[StreamingAnomaly.DayCount]
    val out = StreamingAnomaly.detect(mem.toDS())
    val sink = out.writeStream
      .format("memory")
      .queryName("anomalies")
      .outputMode("append")
      .start()
    mem.addData(counts.filter(_.d.getTime <= cut).toSeq: _*)
    sink.processAllAvailable()
    mem.addData(counts.filter(_.d.getTime > cut).toSeq: _*)
    sink.processAllAvailable()
    sink.stop()
    val streamed = asRows(spark.table("anomalies"))
    val oneShot = asRows(StreamingAnomaly.detectBatch(ev))
    assert(streamed === oneShot)
  }
}
