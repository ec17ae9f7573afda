package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.IncrementalRollup

/** Streaming maintenance of the mergeable-sketch rollups
  * (operators/IncrementalRollup.scala) — the missing writer for those
  * tables: batch jobs REBUILD them, a stream APPENDS to them. Two family
  * members share the epoch machinery: per-day HLL user sketches
  * (estimate-equal under merge) and per-day value histograms for the
  * quantile rollup (EXACTLY equal under merge — counter addition).
  *
  * Each micro-batch folds to one sketch row per day it touched
  * ([[IncrementalRollup.dailyUserSketches]] over just the batch) and lands
  * epoch-keyed under `epoch=N/` — the same exactly-once discipline as
  * `LogStructuredTable.putLogEpoch`: foreachBatch delivers at-least-once, the
  * epoch id names the directory, a replay targets an existing directory and
  * is skipped, and a partially-written first attempt can't be mistaken for
  * complete because the batch stages to a dot-prefixed temp dir and the
  * rename is the commit point.
  *
  * A day touched by k micro-batches holds k sketch rows. That is CORRECT,
  * not merely tolerable, because sketch merge is state-lossless: the HLL
  * union of the k partial-day sketches IS the sketch of the whole day
  * (register-wise max), so [[dayRollup]]'s one `hll_union_agg` pass per read
  * — or a periodic [[compactDays]] rewrite, the sketch-table analog of LSM
  * compaction — recovers exactly what a batch rebuild would have produced
  * (asserted, estimate-equal, in StreamingRollupSpec). Per-batch work is
  * O(batch) and the table is never read on the write path; history is never
  * rescanned by either writer.
  */
object StreamingRollup {

  /** Generic epoch-keyed idempotent append: `fold` reduces the batch to
    * its sketch rows, which land as `dir/epoch=N/`. Replayed or already-
    * compacted epochs are skipped via the directory check and the
    * compaction high-water mark. Correctness requires `fold`'s row type to
    * be state-losslessly mergeable by the paired merge function — true for
    * every [[IncrementalRollup]] family member (HLL register-max, counter
    * addition). */
  private def appendBatchWith(dir: String, epoch: Long)(fold: => DataFrame): Unit = {
    val dst = Paths.get(s"$dir/epoch=$epoch")
    if (epoch <= compactedThrough(dir) || Files.exists(dst)) return
    val tmp = s"$dir/.inflight-epoch=$epoch"
    fold.write.mode(SaveMode.Overwrite).parquet(tmp)
    Files.move(Paths.get(tmp), dst)
  }

  /** Idempotent epoch-keyed append of per-day HLL user sketches. */
  def appendBatch(dir: String, batchEvents: DataFrame, epoch: Long): Unit =
    appendBatchWith(dir, epoch)(IncrementalRollup.dailyUserSketches(batchEvents))

  /** Idempotent epoch-keyed append of per-day value histograms (the
    * quantile-rollup family member): counter rows merge by EXACT addition,
    * so unlike the HLL path the streamed table equals a batch rebuild
    * bit for bit, not just estimate-equal (StreamingRollupSpec). */
  def appendHistBatch(dir: String, batchEvents: DataFrame, epoch: Long): Unit =
    appendBatchWith(dir, epoch)(IncrementalRollup.dailyValueHistograms(batchEvents))

  /** Highest epoch folded by [[compactDays]]; -1 before any compaction
    * (streaming epochs start at 0). */
  def compactedThrough(dir: String): Long = {
    val m = Paths.get(s"$dir/_compacted_through")
    if (Files.exists(m)) Files.readString(m).trim.toLong else -1L
  }

  private def epochs(dir: String): Seq[Long] = {
    val d = new java.io.File(dir)
    if (!d.exists()) Seq.empty
    else
      d.listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("epoch="))
        .map(_.getName.stripPrefix("epoch=").toLong)
        .toSeq
        .sorted
  }

  private def readEpochs(spark: SparkSession, dir: String): DataFrame = {
    val es = epochs(dir)
    require(es.nonEmpty, s"no rollup epochs under $dir")
    spark.read.parquet(es.map(e => s"$dir/epoch=$e"): _*)
  }

  /** Merge-on-read: one row per day regardless of how many micro-batches
    * touched it — schema-compatible with what
    * [[IncrementalRollup.distinctUsersOverRange]] consumes. O(sketch rows)
    * moved, zero event rows. */
  def dayRollup(spark: SparkSession, dir: String): DataFrame =
    readEpochs(spark, dir)
      .groupBy("day")
      .agg(
        sum("n_events").as("n_events"),
        expr("hll_union_agg(sketch)").as("sketch"))

  /** Merge-on-read for the histogram table: exact counter addition per
    * (day, bin) — consumable by [[IncrementalRollup.quantileOverRange]]. */
  def histRollup(spark: SparkSession, dir: String): DataFrame =
    readEpochs(spark, dir)
      .groupBy("day", "bin")
      .agg(sum("cnt").as("cnt"))

  /** Fold all epochs into one `epoch=0` holding a single row per day and
    * record the high-water mark so replays of folded epochs are skipped —
    * LSM compaction for the sketch table. The read answer is unchanged
    * (union is associative); reads afterwards merge nothing. */
  def compactDays(spark: SparkSession, dir: String): Unit =
    compactWith(dir, epochs(dir))(dayRollup(spark, dir))

  /** LSM compaction for the histogram table — same commit protocol, exact
    * counter-addition fold. */
  def compactHistDays(spark: SparkSession, dir: String): Unit =
    compactWith(dir, epochs(dir))(histRollup(spark, dir))

  private def compactWith(dir: String, es: Seq[Long])(merged: => DataFrame): Unit = {
    if (es.isEmpty) return
    val tmp = s"$dir/.compact-tmp"
    merged.write.mode(SaveMode.Overwrite).parquet(tmp)
    import scala.jdk.CollectionConverters._
    def deleteTree(p: java.nio.file.Path): Unit =
      if (Files.exists(p))
        Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    es.foreach(e => deleteTree(Paths.get(s"$dir/epoch=$e")))
    Files.move(Paths.get(tmp), Paths.get(s"$dir/epoch=0"))
    // Monotone high-water mark: a re-compaction over just the folded
    // epoch=0 has es.max == 0, and lowering the mark would re-admit a late
    // replay of an already-folded epoch (its sketch would union away, but
    // n_events would double-count).
    Files.writeString(
      Paths.get(s"$dir/_compacted_through"),
      math.max(es.max, compactedThrough(dir)).toString)
  }

  /** Drain a streaming event source into the rollup table and stop —
    * checkpointed, so a re-run appends only new input and a mid-stream crash
    * replays its last epoch into the idempotent skip. */
  def runAvailableNow(events: DataFrame, dir: String, checkpoint: String): Unit =
    drain(events, checkpoint)((batch, id) => appendBatch(dir, batch, id))

  /** Same drain for the histogram (quantile) rollup table. */
  def runAvailableNowHist(events: DataFrame, dir: String, checkpoint: String): Unit =
    drain(events, checkpoint)((batch, id) => appendHistBatch(dir, batch, id))

  private def drain(events: DataFrame, checkpoint: String)(
      append: (DataFrame, Long) => Unit): Unit = {
    val q = events.writeStream
      .foreachBatch(append)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
