package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.{DirCommit, IncrementalRollup}

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
  * epoch id names the directory, a replay targets an existing directory (or
  * one already folded below the [[EpochLog]] mark) and is skipped, and a
  * partially-written first attempt can't be mistaken for complete because
  * the batch stages to a dot-prefixed temp dir and the rename is the commit
  * point. All directory I/O rides the Hadoop FileSystem API
  * ([[DirCommit]]/[[EpochLog]]), so the table can live on shared storage.
  *
  * A day touched by k micro-batches holds k sketch rows. That is CORRECT,
  * not merely tolerable, because sketch merge is state-lossless: the HLL
  * union of the k partial-day sketches IS the sketch of the whole day
  * (register-wise max), so [[dayRollup]]'s one `hll_union_agg` pass per read
  * — or a periodic [[compactDays]] fold, the sketch-table analog of LSM
  * compaction — recovers exactly what a batch rebuild would have produced
  * (asserted, estimate-equal, in StreamingRollupSpec). Per-batch work is
  * O(batch) and the table is never read on the write path; history is never
  * rescanned by either writer.
  *
  * Retention: compaction folds epochs up to a watermark (`keepLast` newest
  * epochs stay unfolded — the hot tail a live stream is appending next to)
  * into one merged base segment named by the [[EpochLog]] state file, whose
  * atomic generation-file commit swaps base + mark together: a crash before
  * it leaves the old state fully live, a crash after it leaves folded dirs
  * ignored (and swept later) by mark. The mark is monotone, so a late
  * replay of an already-folded epoch can never double-count.
  */
object StreamingRollup {

  /** Generic epoch-keyed idempotent append: `fold` reduces the batch to
    * its sketch rows, which land as `dir/epoch=N/`. Replayed or already-
    * folded epochs are skipped via the directory check and the [[EpochLog]]
    * mark. Correctness requires `fold`'s row type to be state-losslessly
    * mergeable by the paired merge function — true for every
    * [[IncrementalRollup]] family member (HLL register-max, counter
    * addition). */
  private def appendBatchWith(dir: String, epoch: Long)(fold: => DataFrame): Unit = {
    val spark = SparkSession.active
    val dst = s"$dir/epoch=$epoch"
    if (epoch <= compactedThrough(dir) || DirCommit.exists(spark, dst)) return
    val tmp = s"$dir/.inflight-epoch=$epoch"
    fold.write.mode(SaveMode.Overwrite).parquet(tmp)
    DirCommit.commitDir(spark, tmp, dst)
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

  /** Highest epoch folded into the base; -1 before any compaction
    * (streaming epochs start at 0). */
  def compactedThrough(dir: String): Long =
    EpochLog.state(SparkSession.active, dir).mark

  /** Live segments: the folded base (if any) plus every epoch above the
    * fold mark. */
  private def readLive(spark: SparkSession, dir: String): DataFrame = {
    val st = EpochLog.state(spark, dir)
    val es = EpochLog.epochs(spark, dir).filter(_ > st.mark)
    val base = st.baseDir(dir)
      .filter(DirCommit.exists(spark, _))
      .map(spark.read.parquet(_))
    val live =
      if (es.isEmpty) None
      else Some(spark.read.parquet(es.map(e => s"$dir/epoch=$e"): _*))
    (base ++ live).reduceLeftOption(_ unionByName _)
      .getOrElse(sys.error(s"no rollup segments under $dir"))
  }

  /** Merge-on-read: one row per day regardless of how many micro-batches
    * touched it — schema-compatible with what
    * [[IncrementalRollup.distinctUsersOverRange]] consumes. O(sketch rows)
    * moved, zero event rows. */
  def dayRollup(spark: SparkSession, dir: String): DataFrame =
    mergeDays(readLive(spark, dir))

  private def mergeDays(rows: DataFrame): DataFrame =
    rows.groupBy("day")
      .agg(
        sum("n_events").as("n_events"),
        expr("hll_union_agg(sketch)").as("sketch"))

  /** Merge-on-read for the histogram table: exact counter addition per
    * (day, bin) — consumable by [[IncrementalRollup.quantileOverRange]]. */
  def histRollup(spark: SparkSession, dir: String): DataFrame =
    mergeHist(readLive(spark, dir))

  private def mergeHist(rows: DataFrame): DataFrame =
    rows.groupBy("day", "bin")
      .agg(sum("cnt").as("cnt"))

  /** Fold epochs up to `max(epoch) − keepLast` into one merged base
    * segment and raise the mark — LSM compaction for the sketch table.
    * The read answer is unchanged (union is associative); a full fold
    * (`keepLast = 0`) leaves reads merging nothing. */
  def compactDays(spark: SparkSession, dir: String, keepLast: Int = 0): Unit =
    compactWith(spark, dir, keepLast)(mergeDays)

  /** LSM compaction for the histogram table — same commit protocol, exact
    * counter-addition fold. */
  def compactHistDays(spark: SparkSession, dir: String, keepLast: Int = 0): Unit =
    compactWith(spark, dir, keepLast)(mergeHist)

  private def compactWith(spark: SparkSession, dir: String, keepLast: Int)(
      merge: DataFrame => DataFrame): Unit = {
    val st = EpochLog.state(spark, dir)
    val fold = EpochLog.epochs(spark, dir).filter(_ > st.mark).dropRight(keepLast)
    if (fold.isEmpty) return
    val foldedRows = spark.read.parquet(fold.map(e => s"$dir/epoch=$e"): _*)
    val withBase = st.baseDir(dir)
      .filter(DirCommit.exists(spark, _))
      .map(b => spark.read.parquet(b).unionByName(foldedRows))
      .getOrElse(foldedRows)
    val nextGen = st.gen + 1
    val nextBase = f"base-$nextGen%09d"
    merge(withBase).write.mode(SaveMode.Overwrite).parquet(s"$dir/$nextBase")
    // Monotone mark: folding a fold can never lower it — a lowered mark
    // would re-admit a late replay of an already-folded epoch (its sketch
    // would union away, but n_events would double-count).
    EpochLog.commit(
      spark,
      dir,
      EpochLog.State(nextGen, math.max(st.mark, fold.max), Some(nextBase)),
      fold.map(e => s"$dir/epoch=$e"),
      st.base)
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
