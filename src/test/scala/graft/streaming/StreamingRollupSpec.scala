package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.IncrementalRollup
import graft.sources.Tables

class StreamingRollupSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def answer(sketches: org.apache.spark.sql.DataFrame) =
    IncrementalRollup
      .distinctUsersOverRange(sketches, "2024-01-01", "2024-01-31")
      .select("est_users", "n_events")
      .head()

  test("epoch appends merge to the batch rebuild, even when batches split a day") {
    val out = java.nio.file.Files.createTempDirectory("graft-rollup").toString + "/t"
    val ev = Tables.events(spark, dir)
    // three micro-batches sliced orthogonally to days — every day's sketch
    // rows arrive split across epochs, the worst case for merge losslessness
    (0 to 2).foreach { i =>
      StreamingRollup.appendBatch(out, ev.filter(col("event_id") % 3 === i), i.toLong)
    }
    val streamed = answer(StreamingRollup.dayRollup(spark, out))
    val rebuilt = answer(IncrementalRollup.dailyUserSketches(ev))
    assert(streamed === rebuilt)
  }

  test("replayed epochs are skipped; compaction folds rows and raises the high-water mark") {
    val out = java.nio.file.Files.createTempDirectory("graft-rollup").toString + "/t"
    val ev = Tables.events(spark, dir)
    (0 to 2).foreach { i =>
      StreamingRollup.appendBatch(out, ev.filter(col("event_id") % 3 === i), i.toLong)
    }
    val before = answer(StreamingRollup.dayRollup(spark, out))
    // at-least-once replay of epoch 1 with DIFFERENT (corrupt) content: the
    // existing directory wins, nothing double-counts
    StreamingRollup.appendBatch(out, ev.limit(5), 1L)
    assert(answer(StreamingRollup.dayRollup(spark, out)) === before)

    StreamingRollup.compactDays(spark, out)
    assert(StreamingRollup.compactedThrough(out) === 2L)
    val rolled = StreamingRollup.dayRollup(spark, out)
    assert(rolled.groupBy("day").count().filter(col("count") > 1).isEmpty)
    assert(answer(rolled) === before)
    // replay of an epoch at or below the mark is skipped even though its
    // directory is gone (it was folded into the compacted row)
    StreamingRollup.appendBatch(out, ev.limit(5), 2L)
    assert(answer(StreamingRollup.dayRollup(spark, out)) === before)
    // re-compaction over just the folded epoch=0 must not LOWER the mark —
    // that would re-admit late replays of already-folded epochs
    StreamingRollup.compactDays(spark, out)
    assert(StreamingRollup.compactedThrough(out) === 2L)
    StreamingRollup.appendBatch(out, ev.limit(5), 1L)
    assert(answer(StreamingRollup.dayRollup(spark, out)) === before)
  }

  test("watermark fold (keepLast): the hot tail stays unfolded, the answer is " +
    "unchanged, and the mark rises only to the fold boundary") {
    val out = java.nio.file.Files.createTempDirectory("graft-rollup-wm").toString + "/t"
    val ev = Tables.events(spark, dir)
    (0 to 3).foreach { i =>
      StreamingRollup.appendBatch(out, ev.filter(col("event_id") % 4 === i), i.toLong)
    }
    val before = answer(StreamingRollup.dayRollup(spark, out))
    StreamingRollup.compactDays(spark, out, keepLast = 2)
    assert(StreamingRollup.compactedThrough(out) === 1L, "mark stops at the watermark")
    assert(answer(StreamingRollup.dayRollup(spark, out)) === before)
    val hot = new java.io.File(out).listFiles().map(_.getName).filter(_.startsWith("epoch="))
    assert(hot.toSet === Set("epoch=2", "epoch=3"), s"hot tail must survive, got ${hot.toSeq}")
    // the next full fold merges base + hot tail; answer still identical
    StreamingRollup.compactDays(spark, out)
    assert(StreamingRollup.compactedThrough(out) === 3L)
    assert(answer(StreamingRollup.dayRollup(spark, out)) === before)
  }

  test("histogram rollup: streamed epochs equal the batch rebuild BIT-EXACTLY; compaction too") {
    val out = java.nio.file.Files.createTempDirectory("graft-rollup").toString + "/h"
    val ev = Tables.events(spark, dir)
    (0 to 2).foreach { i =>
      StreamingRollup.appendHistBatch(out, ev.filter(col("event_id") % 3 === i), i.toLong)
    }
    def probe(h: org.apache.spark.sql.DataFrame) = IncrementalRollup
      .quantileOverRange(h, "2024-01-01", "2024-01-31", Seq("0.25", "0.5", "0.9"))
      .orderBy("p").collect().toSeq
    val rebuilt = probe(IncrementalRollup.dailyValueHistograms(ev))
    // counter addition is exact: stronger than the HLL path's estimate-equality
    assert(probe(StreamingRollup.histRollup(spark, out)) === rebuilt)
    // replay with corrupt content: existing epoch dir wins
    StreamingRollup.appendHistBatch(out, ev.limit(5), 1L)
    assert(probe(StreamingRollup.histRollup(spark, out)) === rebuilt)
    // compaction folds to one row per (day, bin), answer unchanged
    StreamingRollup.compactHistDays(spark, out)
    assert(StreamingRollup.compactedThrough(out) === 2L)
    val rolled = StreamingRollup.histRollup(spark, out)
    assert(rolled.groupBy("day", "bin").count().filter(col("count") > 1).isEmpty)
    assert(probe(rolled) === rebuilt)
  }

  test("streaming drift monitor: driftTimeline over streamed epochs equals the batch drift") {
    // Composition closure: the drift monitor consumes the SAME histogram
    // table the streaming writer maintains, so a streamed history answers
    // the drift question bit-identically to a batch rebuild — the streaming
    // deployment of q_drift_timeline needs no operator of its own.
    val out = java.nio.file.Files.createTempDirectory("graft-rollup").toString + "/h"
    val ev = Tables.events(spark, dir)
    (0 to 2).foreach { i =>
      StreamingRollup.appendHistBatch(out, ev.filter(col("event_id") % 3 === i), i.toLong)
    }
    def drift(h: org.apache.spark.sql.DataFrame) = graft.operators.Analytics
      .driftTimeline(h).orderBy("day").collect().toSeq
    val batch = drift(IncrementalRollup.dailyValueHistograms(ev))
    assert(batch.nonEmpty)
    assert(drift(StreamingRollup.histRollup(spark, out)) === batch)
    // still equal after compaction (union fold is exact)
    StreamingRollup.compactHistDays(spark, out)
    assert(drift(StreamingRollup.histRollup(spark, out)) === batch)
  }

  test("checkpointed AvailableNow drain feeds the rollup through foreachBatch") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-rollup").toString
    val (evDir, out, ckpt) = (s"$tmp/events", s"$tmp/rollup", s"$tmp/ckpt")
    import spark.implicits._
    Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 05:00:00"), 7L, "m", 1.0, "{}"),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 09:00:00"), 8L, "m", 1.0, "{}"),
      (3L, java.sql.Timestamp.valueOf("2024-01-02 01:00:00"), 7L, "m", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", expr("unix_micros(ts) * 1000"))
      .write.mode("overwrite").parquet(evDir)
    StreamingRollup.runAvailableNow(DailyIngest.readEvents(spark, evDir), out, ckpt)
    val got = StreamingRollup
      .dayRollup(spark, out)
      .select(col("day").cast("string"), col("n_events"),
        expr("hll_sketch_estimate(sketch)").as("users"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got === Set(("2024-01-01", 2L, 2L), ("2024-01-02", 1L, 1L)))
    // second drain with the same checkpoint: no new input, rollup unchanged
    StreamingRollup.runAvailableNow(DailyIngest.readEvents(spark, evDir), out, ckpt)
    assert(StreamingRollup.dayRollup(spark, out).count() === 2L)
  }
}
