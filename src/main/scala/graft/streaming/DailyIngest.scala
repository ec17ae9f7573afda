package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.streaming.Trigger

/** Structured-Streaming extension (SURVEY.md §2.11): the reference has no
  * streaming — its "incremental" mode is a daily batch loop
  * (RdlETL.java:45-47) made idempotent by keyed upsert + first-wins dedup.
  * The Spark-native analog exposes the same ingest as an incremental
  * pipeline:
  *
  *  - `readStream` over the events directory (file source discovers new
  *    files per micro-batch; `Trigger.AvailableNow` = "process the backlog,
  *    then stop", the streaming version of the reference's daily rerun);
  *  - watermark + `dropDuplicates` = the reference's per-day dedup set (A1)
  *    with bounded state instead of an unbounded driver HashMap;
  *  - tumbling event-time window aggregation = the daily rollup (W2).
  *
  * State scales with (meters × watermark horizon), not with history — the
  * 100 TB-safe shape for continuous ingest.
  */
object DailyIngest {

  /** Streaming source over an events parquet directory, same nanos handling
    * and same pinned-column discipline as the batch path (Tables.events).
    *
    * The file source globs every parquet in the directory under the
    * declared events schema, so a foreign table's file would otherwise
    * surface as silent nulls that violate downstream non-null encoders.
    * Guard: a mergeSchema footer pass over the directory at stream
    * CONSTRUCTION (one distributed footer-read job — no data scan, scale
    * is #files not bytes) must yield exactly the documented events columns
    * (TESTDATA.md); an alien file fails loudly here — extra/missing
    * columns via the require, a same-name/different-type conflict via the
    * merge itself. */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir).schema
    val expected = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = merged.fields.map(_.name).toSet
    require(
      got == expected.toSet,
      s"events stream dir $dir is not events-only: " +
        s"unexpected columns [${(got -- expected).toSeq.sorted.mkString(",")}], " +
        s"missing [${(expected.toSet -- got).toSeq.sorted.mkString(",")}]")
    // Same two-generation ts handling as the batch path (Tables.events):
    // streaming sources need the schema declared up front, and declaring
    // the wrong one is a hard "Parquet column cannot be converted" at
    // drain time.
    val tsIsLong = merged("ts").dataType == org.apache.spark.sql.types.LongType
    val tsDdl = if (tsIsLong) "BIGINT" else "TIMESTAMP_NTZ"
    val schema =
      s"event_id BIGINT, ts $tsDdl, user_id BIGINT, event_type STRING, value DOUBLE, props STRING"
    val raw = spark.readStream.schema(schema).parquet(dir)
    val converted =
      if (tsIsLong) raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else raw.withColumn("ts", col("ts").cast("timestamp"))
    converted.select(expected.map(col): _*)
  }

  /** Deduplicated per-meter-per-day readings as an incremental stream:
    * watermarked event-time dedup on (user_id, day) — the reference's A1
    * dedup with bounded state. */
  def dedupedReadings(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 days")
      .withColumn("rd_date", to_date(col("ts")))
      .dropDuplicatesWithinWatermark("user_id", "rd_date")
      .select(col("user_id"), col("rd_date"), col("value").as("bmz"))

  /** Tumbling 1-day event-time aggregation (W2 streaming analog): per-type
    * daily counts/sums with late data handled by the watermark. */
  def dailyAggregates(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(
        col("window.start").cast("date").as("d"),
        col("event_type"),
        col("n"),
        col("total"))

  /** Native session windows over the stream (same `session_window` merging
    * aggregation as the batch `q_session_window` query): state is O(open
    * sessions) and expires with the watermark — the streaming scale path
    * for sessionization, vs. the lag-window variant's full-partition sort.
    * Session end = last event + gap, per the operator's definition. */
  def sessionize(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "1 day")
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        expr("unix_micros(sw.start)").as("start_us"),
        expr("unix_micros(sw.end)").as("end_us"),
        col("n_events"))

  /** Per-meter running state for [[incrementalDailyEnergy]]: last seen
    * reading and its day. */
  case class MeterState(lastDate: java.sql.Date, lastBmz: Double)

  /** One derived daily-energy record emitted by the stateful stream. */
  case class RdlRecord(user_id: Long, rd_date: java.sql.Date, rdl: Double)

  /** Stateful streaming W1 (custom state via `mapGroupsWithState`,
    * SURVEY §2.7 / §2.11 extension): per meter, as deduplicated readings
    * arrive in event-time order within a batch, emit
    * `(bmz(d+1) − bmz(d)) × 1` for adjacent days passing the reference's
    * guards (RdlETL2.java:96-98), carrying the last reading across
    * micro-batches as keyed state. State is O(meters) — bounded, no history
    * replay — which is the 100 TB-continuous shape of the batch operator
    * (multiplier join omitted: enrichment composes downstream exactly as in
    * the batch plan).
    */
  def incrementalDailyEnergy(readings: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.GroupStateTimeout
    import org.apache.spark.sql.{Encoders, Row}
    val spark = readings.sparkSession
    import spark.implicits._
    val grouped = readings
      .selectExpr("user_id", "rd_date", "bmz")
      .as[(Long, java.sql.Date, Double)]
      .groupByKey(_._1)
    grouped
      .flatMapGroupsWithState[MeterState, RdlRecord](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout())( (key, rows, state) => {
        val sorted = rows.toSeq.sortBy(_._2.toLocalDate.toEpochDay)
        val start = state.getOption
        val out = scala.collection.mutable.ArrayBuffer.empty[RdlRecord]
        var last = start
        for ((_, d, v) <- sorted) {
          last match {
            case Some(MeterState(ld, lv))
                if d.toLocalDate.toEpochDay == ld.toLocalDate.toEpochDay + 1 &&
                  lv > 0 && v > 0 && v >= lv =>
              out += RdlRecord(key, ld, v - lv)
            case _ => ()
          }
          last = Some(MeterState(d, v))
        }
        last.foreach(state.update)
        out.iterator
      })
      .toDF()
  }

  /** Durable incremental ingest: drain the source backlog into a parquet
    * sink with a checkpoint, then stop. Re-invoking with the same checkpoint
    * processes ONLY files that arrived since the last run — the file-source
    * offset log + sink commit log give exactly-once file-batch semantics,
    * which is the durable version of the reference's "re-run the daily job"
    * idempotency (RdlETL.java:45-47: rerun re-reads everything and relies on
    * keyed upsert; here the checkpoint skips already-committed input). */
  def runIncremental(df: DataFrame, outPath: String, checkpoint: String): Unit = {
    val q = df.writeStream
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Drain-the-backlog runner: process everything currently in the source,
    * then stop — the streaming equivalent of the reference's daily batch
    * rerun. Returns the collected sink rows (memory sink, test/demo use). */
  def runAvailableNow(df: DataFrame, queryName: String, outputMode: String = "append"): Seq[Row] = {
    val q = df.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    df.sparkSession.table(queryName).collect().toSeq
  }
}
