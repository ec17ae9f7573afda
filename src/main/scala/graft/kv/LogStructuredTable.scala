package graft.kv

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Log-structured wide-column table: the LSM-tree analog of the reference's
  * HBase store (HBaseClient.java), reproducing the COST PROFILE of `put`,
  * not just its semantics. [[WideColumnTable.put]] is semantically faithful
  * but read-merge-rewrites the touched family partitions — O(family), where
  * HBase `put` (HBaseClient.java:95-111) is O(batch): an append to the
  * WAL/memstore, later folded into HFiles by compaction. This class is that
  * design on parquet:
  *
  *  - [[putLog]] — O(batch) append: writes the batch (plus a monotone
  *    sequence number) as a new directory under `log/`; the base data is
  *    never read, never rewritten (asserted byte-identical in
  *    LogStructuredTableSpec). HBase analog: memstore flush → one new HFile.
  *  - [[readView]] — merge-on-read: base ∪ logs, newest sequence wins per
  *    cell, tombstones (NULL `value`) masked out. HBase analog: a scan
  *    merging HFiles + memstore by timestamp. Read amplification grows with
  *    the log count — exactly HBase's pre-compaction read cost.
  *  - [[compact]] — folds all logs into a new base, physically dropping
  *    shadowed cells and tombstones, and empties the log. HBase analog:
  *    major compaction. The view is value-identical before and after
  *    (asserted in the spec).
  *
  * Sequence allocation lists the `log/` directory on the driver — bounded by
  * batches-since-last-compaction, the same bookkeeping scale as HBase's
  * HFile count per store, never data-scale. Single-writer by design (an
  * HBase region has exactly one owning region server); concurrent-writer
  * deployments belong on a transactional table format (Delta/Iceberg), per
  * SURVEY §7.4.
  */
class LogStructuredTable(spark: SparkSession, warehouse: String, name: String) {

  private val root = s"$warehouse/$name"
  private val logPath = s"$warehouse/$name/log"
  private val schemaCols = Seq("row_key", "family", "qualifier", "value")

  /** Live state via the shared generation log ([[graft.streaming.EpochLog]]
    * — the round-8 crash-atomic commit discipline): the state file names
    * the live base segment and carries the compaction high-water mark, so
    * [[compact]] commits base + mark + log retirement in ONE atomic file
    * create instead of the old delete-base → rename → delete-logs → write-
    * marker sequence (whose crash windows left a missing base or a stale
    * mark that let replayed epochs shadow compacted values). A table
    * without a state file resolves to the legacy fixed `base/` dir and the
    * legacy `_compacted_through` marker; its first compaction migrates it. */
  private def lsmState: graft.streaming.EpochLog.State =
    graft.streaming.EpochLog.state(spark, root)

  private def basePath: String =
    lsmState.baseDir(root).getOrElse(s"$root/base")

  def baseDir: String = basePath
  def logDir: String = logPath

  /** DDL: materialize an empty base so the table exists (K5). */
  def create(): Unit =
    if (!exists) {
      spark.emptyDataFrame
        .withColumn("row_key", lit(""))
        .withColumn("family", lit(""))
        .withColumn("qualifier", lit(""))
        .withColumn("value", lit(""))
        .write.mode(SaveMode.Overwrite).parquet(basePath)
    }

  def exists: Boolean = Files.exists(Paths.get(basePath))

  /** LSM storage-status probe (K6 parity for the log-structured engine):
    * base vs outstanding-log footprint from filesystem metadata only —
    * the number an operator reads to decide "time to compact", the same
    * role as the reference's RegionServer heap log (HBaseClient.java:67-73;
    * HBase's analog pressure signal is memstore/HFile counts).
    * Returns (baseBytes, logBytes, outstandingLogSeqs, compactedThrough). */
  def status(): (Long, Long, Int, Long) = {
    def bytesUnder(p: String): Long = {
      val root = java.nio.file.Paths.get(p)
      if (!Files.exists(root)) 0L
      else {
        import scala.jdk.CollectionConverters._
        Files.walk(root).iterator().asScala
          .filter(f => Files.isRegularFile(f))
          .map(f => Files.size(f))
          .sum
      }
    }
    (bytesUnder(basePath), bytesUnder(logPath), logSeqs().size, compactedThrough)
  }

  /** LIVE sequence numbers, ascending — log dirs above the compaction
    * mark. Base is seq 0. Folded dirs a crashed compaction's GC left
    * behind sit at or below the mark and are ignored (their cells are in
    * the base), so a reader is consistent in every crash window. */
  private def logSeqs(): Seq[Long] =
    rawLogSeqs().filter(_ > compactedThrough)

  /** Every `seq=` dir on disk, folded or not. */
  private def rawLogSeqs(): Seq[Long] = {
    val d = new java.io.File(logPath)
    if (!d.exists()) Seq.empty
    else
      d.listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("seq="))
        .map(_.getName.stripPrefix("seq=").toLong)
        .toSeq
        .sorted
  }

  /** O(batch) upsert append (K1 with HBase's cost profile): the batch lands
    * as `log/seq=N/` parquet; nothing else on disk is read or touched. A
    * NULL `value` is a tombstone (HBase Delete). Within one batch a
    * DataFrame has no row order, so duplicate cells resolve deterministically
    * — a non-null value beats a tombstone, greatest value wins — rather than
    * by arrival order (which HBase's same-timestamp puts resolve by
    * memstore insertion order, i.e. arbitrarily from the caller's view).
    *
    * Sequences are GLOBALLY monotone, surviving compaction (continue past
    * the high-water mark, never restart at 1) — resolution only needs
    * log-order within a compaction generation, but [[readViewAsOf]]
    * snapshots are meaningless if a sequence number can name two different
    * writes across a compact. */
  def putLog(cells: DataFrame): Unit = {
    val seq = math.max(logSeqs().lastOption.getOrElse(0L), compactedThrough) + 1L
    cells
      .select(schemaCols.map(col): _*)
      .groupBy("row_key", "family", "qualifier")
      .agg(max("value").as("value")) // intra-batch: deterministic, non-null wins
      .withColumn("seq", lit(seq))
      .write.mode(SaveMode.ErrorIfExists).parquet(s"$logPath/seq=$seq")
  }

  /** Idempotent epoch-keyed append — the streaming write path
    * (`writeStream.foreachBatch((batch, id) => table.putLogEpoch(batch, id))`).
    * Structured Streaming's foreachBatch delivers each micro-batch
    * at-least-once (a crash between sink write and checkpoint commit
    * replays the epoch); here the epoch id IS the sequence number, so:
    *
    *  - a replayed epoch targets the same `seq=` directory and is skipped —
    *    exactly-once cell state on top of at-least-once delivery;
    *  - a partially-written first attempt can't be mistaken for complete:
    *    the batch stages to a dot-prefixed temp dir and moves into place as
    *    the last step (the move is the commit point);
    *  - an epoch already folded into the base by [[compact]] is skipped via
    *    the compaction high-water mark — without it, a replay of an old
    *    epoch would land ABOVE the base's seq 0 and shadow newer compacted
    *    values with stale ones.
    *
    * Epochs map to `seq = epoch + 1` (base is seq 0; streaming epochs start
    * at 0). Mixing manual [[putLog]] and epoch-keyed appends on one table
    * would collide sequence ranges — a table is either batch-fed or
    * stream-fed. */
  def putLogEpoch(cells: DataFrame, epoch: Long): Unit = {
    val seq = epoch + 1L
    val dst = Paths.get(s"$logPath/seq=$seq")
    if (seq <= compactedThrough || Files.exists(dst)) return
    val tmp = s"$logPath/.inflight-seq=$seq"
    cells
      .select(schemaCols.map(col): _*)
      .groupBy("row_key", "family", "qualifier")
      .agg(max("value").as("value"))
      .withColumn("seq", lit(seq))
      .write.mode(SaveMode.Overwrite).parquet(tmp)
    Files.move(Paths.get(tmp), dst)
  }

  /** Highest sequence folded into the base by [[compact]]; 0 before any
    * compaction. From the generation state file; a pre-round-8 table
    * falls back to its legacy `_compacted_through` marker. */
  def compactedThrough: Long = {
    val st = lsmState
    if (st.base.isDefined) math.max(0L, st.mark)
    else {
      val m = Paths.get(s"$warehouse/$name/_compacted_through")
      if (Files.exists(m)) Files.readString(m).trim.toLong else 0L
    }
  }

  /** All cell versions with their sequence: base at seq 0 plus every log. */
  private def versions(): DataFrame = {
    val schema = "row_key STRING, family STRING, qualifier STRING, value STRING"
    val base = spark.read.schema(schema).parquet(basePath).withColumn("seq", lit(0L))
    logSeqs().foldLeft(base) { (acc, s) =>
      acc.unionByName(
        spark.read.schema(s"$schema, seq BIGINT").parquet(s"$logPath/seq=$s"))
    }
  }

  /** Merge-on-read live view: newest write wins per cell, tombstones drop.
    *
    * With zero outstanding logs the resolution window is skipped entirely —
    * the base is only ever written by [[create]] (empty) or [[compact]]
    * (already resolved, tombstone-free), so a compacted table reads at
    * plain-scan cost with no shuffle (LsmBench, 10M-cell base: ~0.15 s
    * compacted vs ~5 s with 5 outstanding logs).
    *
    * With logs outstanding, read cost tracks the LOG, not the table — the
    * HBase merge-iterator property, recovered on parquet with broadcast
    * joins: the log cell KEYS broadcast, a broadcast anti join passes
    * untouched base cells through as-is (they are live by the compaction
    * invariant — the base never holds shadowed cells or tombstones), a
    * broadcast semi join carves out the touched sliver, and only
    * sliver+logs go through the resolution window. The base is scanned but
    * NEVER shuffles — at a 100 TB base with a day of appends, the exchange
    * carries the day, not the table. Logs past the broadcast budget fall
    * back to a full [[LogStructuredTable.resolve]] over base+logs (the
    * table is overdue for [[compact]] anyway — unbounded log growth
    * degrades every LSM store's reads). Value-identity of the split path
    * with plain resolve is pinned by a randomized fold-model property and
    * the no-base-exchange plan shape in LogStructuredTableSpec.
    *
    * Honest regime note (LsmBench, 10M skinny cells, local[32]): the split
    * path measures ~4.9 s vs ~2.9 s for the full-shuffle resolve — locally
    * a shuffle is a memory copy, and the split pays two base scans plus
    * per-read job overhead. The design targets the cluster regime the
    * local box cannot exhibit: there the full resolve serializes the
    * ENTIRE base through the network exchange on every read, while the
    * split path streams it from storage with only broadcast probes —
    * shuffle bytes scale with the table, split-path bytes with the log. */
  def readView(maxBroadcastLogCells: Long = 1000000L): DataFrame = {
    val schema = "row_key STRING, family STRING, qualifier STRING, value STRING"
    val seqs = logSeqs()
    val base = spark.read.schema(schema).parquet(basePath)
    if (seqs.isEmpty) return base
    // one metadata-only count over all log dirs (parquet row counts come
    // from footers, no data scan) decides split-path vs full resolve
    val logCells =
      spark.read.parquet(seqs.map(s => s"$logPath/seq=$s"): _*).count()
    if (logCells > maxBroadcastLogCells) return LogStructuredTable.resolve(versions())
    val logs = seqs
      .map(s => spark.read.schema(s"$schema, seq BIGINT").parquet(s"$logPath/seq=$s"))
      .reduce(_ unionByName _)
    val cellKey = Seq("row_key", "family", "qualifier")
    val logKeys = broadcast(logs.select(cellKey.map(col): _*).distinct())
    val untouched = base.join(logKeys, cellKey, "left_anti")
    val touched = base
      .join(logKeys, cellKey, "left_semi")
      .withColumn("seq", lit(0L))
    untouched.unionByName(LogStructuredTable.resolve(touched.unionByName(logs)))
  }

  /** Snapshot read as of sequence `asOfSeq` — the HBase timestamp-range
    * read (Get/Scan.setTimeRange): resolve only versions with
    * `seq <= asOfSeq`, so the view is exactly what [[readView]] returned
    * when that sequence was the newest. Version retention follows HBase
    * major-compaction semantics: [[compact]] physically discards shadowed
    * versions, so snapshots strictly BELOW the compaction mark are gone —
    * asking for one fails loudly rather than answering with the silently
    * post-compaction state. Snapshots at or above the mark remain exact:
    * the folded base holds the resolved state as of the mark, and later
    * logs layer on top. */
  def readViewAsOf(asOfSeq: Long): DataFrame = {
    require(
      asOfSeq >= compactedThrough,
      s"snapshot seq=$asOfSeq predates compaction (compacted through $compactedThrough); " +
        "versions below the mark are physically discarded")
    LogStructuredTable.resolve(versions().filter(col("seq") <= asOfSeq))
  }

  /** Version history of ONE cell, newest first — HBase `get` with
    * VERSIONS=n (HBaseClient.java's Result carries all requested cell
    * versions). Tombstones appear as NULL values: history reads show the
    * delete, unlike the resolved views which mask it. Retention caveat as
    * in [[readViewAsOf]]: [[compact]] collapses history below the mark to
    * the single surviving version. Driver-side pruning only — the filter
    * pushes down to every base/log scan; rows matching one cell key are
    * O(versions of that cell). */
  def cellVersions(
      rowKey: String,
      family: String,
      qualifier: String,
      maxVersions: Int = Int.MaxValue): DataFrame =
    versions()
      .filter(
        col("row_key") === rowKey &&
          col("family") === family &&
          col("qualifier") === qualifier)
      .orderBy(col("seq").desc)
      .limit(maxVersions)

  /** Major compaction: fold logs into the base, drop shadowed cells and
    * tombstones physically, retire the folded log dirs. One shuffle by
    * cell key over base+logs; the view is unchanged.
    *
    * Crash-atomic via the generation state file: the folded base is
    * written under the NEXT generation's name first, then one atomic
    * state-file create swaps base + high-water mark together — a crash
    * before it leaves the old base and logs fully live; a crash after it
    * leaves lingering folded log dirs that [[logSeqs]] ignores by mark
    * (and the next commit's GC sweeps). The mark also keeps a replayed
    * [[putLogEpoch]] of a folded epoch from shadowing compacted values. */
  def compact(): Unit = {
    import graft.streaming.EpochLog
    val seqs = logSeqs()
    if (seqs.isEmpty) return
    val prev = lsmState
    val nextGen = prev.gen + 1
    val nextBase = f"base-g$nextGen%09d"
    readView().write.mode(SaveMode.Overwrite).parquet(s"$root/$nextBase")
    val newMark = math.max(prev.mark, seqs.max)
    // sweep everything at or below the new mark — including folded dirs a
    // crashed earlier compaction's GC left behind
    val retire = rawLogSeqs().filter(_ <= newMark)
    EpochLog.commit(
      spark,
      root,
      EpochLog.State(nextGen, newMark, Some(nextBase)),
      retire.map(s => s"$logPath/seq=$s"),
      Some(prev.base.getOrElse("base")))
    // the legacy marker is superseded by the state file; best-effort tidy
    Files.deleteIfExists(Paths.get(s"$warehouse/$name/_compacted_through"))
    ()
  }
}

object LogStructuredTable {

  /** Merge-on-read resolution, as a pure plan over versioned cells
    * `(row_key, family, qualifier, value, seq)`: per cell key, the row with
    * the highest `seq` is the live version; a live NULL `value` is a
    * tombstone and masks the cell. One window (or, at scale, one
    * `max_by`-shaped aggregation — same shuffle) per read; ties broken by
    * `value` DESC NULLS LAST so resolution is deterministic even on inputs
    * that violate the writer's unique-(cell, seq) invariant. Registered as
    * the oracled `q_kv_log_view` (DuckDB recomputes the same window). */
  def resolve(versions: DataFrame): DataFrame = {
    val w = Window
      .partitionBy("row_key", "family", "qualifier")
      .orderBy(col("seq").desc, col("value").desc_nulls_last)
    versions
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1 && col("value").isNotNull)
      .select("row_key", "family", "qualifier", "value")
  }
}
