package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** LSM tombstone discipline shared by every persisted index family
  * (IVF / IVF×PQ in [[SimilaritySearch]], the minhash LSH and
  * semantic-dedup indexes in [[Dedup]]): a logical delete appends ids to
  * a tombstone segment under the index dir — O(ids) regardless of
  * corpus size, no index file touched — every read-side consumer
  * anti-joins them out, and the family's compaction applies them
  * physically. The shape mirrors [[graft.kv.LogStructuredTable]]'s delete
  * markers, applied to index artifacts instead of KV rows.
  *
  * The segment's physical dir name comes from the index's
  * [[IndexManifest]] state (generation-suffixed; legacy indexes resolve
  * to the fixed `tombstones/` name) — clearing after a compaction is no
  * longer a delete-in-place but a manifest bump to a fresh segment name,
  * so the crash window between "deletes applied physically" and
  * "segment cleared" is gone: one manifest commit swaps both.
  *
  * Contract (identical across families): ids are global — a tombstone
  * hides EVERY row of that id, including rows appended after the delete,
  * until a compaction clears it or an UPSERT of that very id replaces it.
  * Plain deletes are therefore always UNSCOPED (`ts_gen = Long.MaxValue`,
  * "kills every segment, present and future") — the takedown/licensing-
  * retraction guarantee survives any later unrelated mutation. Scoped
  * tombstones (`ts_gen` = a generation; hides copies only in segments
  * created at or before it) are written ONLY by the upserting families'
  * upsert paths, which is what lets an upsert kill a document's old
  * copies and commit its replacement in ONE manifest generation (the new
  * segment's higher generation is immune). An upsert carries pending
  * tombstones forward at their ORIGINAL scope and drops only the batch
  * ids' rows — the one sanctioned re-add path. (Round 9 fix: the previous
  * discipline — live-generation-scoped deletes plus clamp-on-carry —
  * opened a resurrection window: delete(X), unrelated upsert bumping the
  * generation, then a plain append(X) landed above X's scope and served.)
  * Tombstone rows persisted before the scope column existed read back as
  * unscoped (missing column coalesces to MaxValue). Rebuilds start from
  * a fresh segment. The
  * anti join carries no broadcast hint: AQE broadcasts the segment while
  * it is small (the expected state — compaction bounds it) and degrades
  * to a shuffled anti join rather than a driver OOM if deletes pile up.
  *
  * Compaction trigger heuristic: compact when the segment's row count
  * exceeds ~1% of the base (the anti-join build side stops being
  * trivially broadcastable long before that at corpus scale) or after a
  * fixed number of stream epochs — whichever comes first. Deletes are
  * correct at ANY tombstone volume; the trigger is purely a read-cost
  * knob (probed rows ∪ tombstones per search).
  */
private[graft] object Tombstones {
  val DefaultSegment = "tombstones"

  private def fsPath(spark: org.apache.spark.sql.SparkSession, dir: String, segment: String) = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/$segment")
    (p, p.getFileSystem(spark.sessionState.newHadoopConf()))
  }

  /** Logical delete: append the ids (first column, cast to long) to the
    * tombstone segment under a canonical `ts_id` column. `asOfGen` scopes
    * the tombstone to segments created at or before that generation
    * (see the contract above); the default MaxValue is the unscoped
    * "kills every segment, present and future" behavior every family
    * other than the upserting ones uses. */
  def delete(
      ids: DataFrame,
      dir: String,
      segment: String = DefaultSegment,
      asOfGen: Long = Long.MaxValue): Unit =
    ids.select(
      col(ids.columns.head).cast("long").as("ts_id"),
      lit(asOfGen).cast("long").as("ts_gen"))
      .write.mode("append").parquet(s"$dir/$segment")

  /** The tombstone set `(ts_id, ts_gen)`, or None when the segment
    * doesn't exist or holds no schema-carrying files (an empty-DataFrame
    * write). Pre-round-7 IVF/IVF×PQ segments wrote the id column as
    * `n_id`; read both (mergeSchema — the segment is KB-sized) so an
    * index persisted by the old version keeps its pending deletes
    * instead of throwing on the renamed column. Rows persisted before
    * the scope column read back unscoped (`ts_gen = MaxValue`). */
  def read(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      segment: String = DefaultSegment): Option[DataFrame] = {
    val (p, fs) = fsPath(spark, dir, segment)
    if (!fs.exists(p)) None
    else
      try {
        val df = spark.read.option("mergeSchema", "true").parquet(s"$dir/$segment")
        val id =
          if (df.columns.contains("ts_id") && df.columns.contains("n_id"))
            coalesce(col("ts_id"), col("n_id"))
          else if (df.columns.contains("ts_id")) col("ts_id")
          else col(df.columns.head)
        val gen =
          if (df.columns.contains("ts_gen"))
            coalesce(col("ts_gen").cast("long"), lit(Long.MaxValue))
          else lit(Long.MaxValue)
        Some(df.select(id.cast("long").as("ts_id"), gen.as("ts_gen")))
      } catch { case _: org.apache.spark.sql.AnalysisException => None }
  }

  /** Anti-join pending deletes out of `rows` on `idCol` — a no-op plan
    * when no tombstones exist. Apply AFTER any cell/bucket pruning so the
    * check touches pruned rows only. */
  def drop(
      rows: DataFrame,
      dir: String,
      idCol: String,
      segment: String = DefaultSegment): DataFrame =
    read(rows.sparkSession, dir, segment).fold(rows)(t =>
      rows.join(
        t.select(col("ts_id").as(idCol)).distinct(),
        Seq(idCol),
        "left_anti"))

  /** [[drop]] honoring tombstone scope: a row from a segment created at
    * generation `rows(genCol)` is hidden only by tombstones with
    * `ts_gen >=` that generation — rows in segments committed AFTER a
    * scoped delete (an upsert's replacement copies, a re-added document)
    * survive it. Unscoped tombstones (`ts_gen = MaxValue`, every family
    * without upserts, and all pre-scope persisted rows) hide every
    * segment, so this degenerates to [[drop]] exactly. Same plan shape:
    * one anti join, no broadcast hint, applied after pruning. */
  def dropScoped(
      rows: DataFrame,
      dir: String,
      idCol: String,
      genCol: String,
      segment: String = DefaultSegment): DataFrame =
    read(rows.sparkSession, dir, segment).fold(rows) { t =>
      // collapse per id to the strongest kill: visibility is monotone in
      // scope (a higher ts_gen hides a superset of segments), so max(ts_gen)
      // subsumes every weaker tombstone for the same id
      val ts = t.groupBy("ts_id").agg(max("ts_gen").as("ts_gen"))
      rows.join(
        ts,
        rows(idCol) === ts("ts_id") && ts("ts_gen") >= rows(genCol),
        "left_anti")
    }

  /** Loud-contract guard for BATCH appends: appended rows land in a base
    * segment created at generation `segGen`, so any SCOPED tombstone with
    * `ts_gen >= segGen` (an earlier upsert's kill, carried until the next
    * compaction) would hide them SILENTLY — the one outcome worse than an
    * error. The append refuses and names the ids: route a re-added or
    * replaced id through the family's upsert (whose replacement segment
    * commits above the scope), or compact first. Unscoped tombstones are
    * deliberately NOT flagged — hiding appends of taken-down ids is the
    * documented takedown contract, not an accident. Cost: one job joining
    * the batch ids against the KB-sized (compaction-bounded) scoped slice
    * of the tombstone segment, broadcast. Streaming appends skip the
    * guard: an ingest stream's arrivals are new ids by construction, and
    * a per-micro-batch guard job is the wrong trade there — the
    * after-the-fact backstop for a stream that violates that contract is
    * [[IndexManifest.audit]]'s opt-in visibility pass (fsck flags live
    * stream rows covered by a scoped tombstone). */
  def requireAppendable(
      ids: DataFrame,
      dir: String,
      idCol: String,
      segment: String,
      segGen: Long): Unit =
    read(ids.sparkSession, dir, segment).foreach { t =>
      val blocked = ids
        .select(col(idCol).cast("long").as("__app_id")).distinct()
        .join(
          broadcast(t
            .filter(col("ts_gen") =!= Long.MaxValue && col("ts_gen") >= segGen)
            .select(col("ts_id").as("__app_id")).distinct()),
          Seq("__app_id"), "left_semi")
        .limit(5).collect().map(_.getLong(0))
      require(
        blocked.isEmpty,
        s"append into $dir would be silently hidden for ids " +
          s"[${blocked.mkString(",")}]: an earlier upsert's generation-scoped " +
          "tombstone covers the segment these rows land in — route re-added " +
          "or replaced ids through upsert, or compact first")
    }

  def clear(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      segment: String = DefaultSegment): Unit = {
    val (p, fs) = fsPath(spark, dir, segment)
    if (fs.exists(p)) fs.delete(p, true)
  }
}

/** The documented compaction-trigger heuristic, decided from measured
  * segment sizes instead of left as prose (the [[graft.operators
  * .SimilaritySearch.filteredTopKAuto]] discipline applied to the
  * lifecycle knob): each family's `maybeCompact` counts its live base,
  * streamed segment, and pending tombstones — three cheap counts, the
  * tombstone/stream ones over segments compaction is meant to bound —
  * and compacts when pending deletes exceed ~1% of the base (the point
  * where the read-side anti-join's build stops being trivially
  * broadcastable at corpus scale) or the streamed segment has grown past
  * a quarter of the base (the union's two-branch scan and small files
  * are worth one rewrite). Deletes are CORRECT at any volume; this is
  * purely the read-cost knob, now self-applying. */
private[graft] object CompactionTrigger {

  /** Rows under a segment path; 0 for absent dirs and schema-less
    * (empty-write / zero-batch sink) dirs. */
  def rowsIn(spark: org.apache.spark.sql.SparkSession, path: String): Long = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) 0L
    else
      try spark.read.parquet(path).count()
      catch { case _: org.apache.spark.sql.AnalysisException => 0L }
  }

  def due(
      baseRows: Long,
      streamRows: Long,
      tombstoneRows: Long,
      ratio: Double,
      streamRatio: Double): Boolean =
    if (baseRows == 0L) streamRows > 0L || tombstoneRows > 0L
    else
      tombstoneRows.toDouble > ratio * baseRows ||
        streamRows.toDouble > streamRatio * baseRows
}

/** The REBUILD trigger — the staleness analog of [[CompactionTrigger]]
  * for the families that freeze a data-fitted model at build time (IVF /
  * IVF×PQ centroids+codebooks, semantic-dedup centroids, the text
  * index's length-normalization stats). Compaction folds segments but
  * deliberately never retrains: appends and deletes are served exactly
  * under the FROZEN model, degrading only in efficiency (centroid
  * balance) or score calibration (avgdl) as the live corpus drifts from
  * the training corpus. Each family's `maybeRebuild` measures that drift
  * as |live − trained_on| / trained_on — live rows from the same cheap
  * counts the compaction trigger uses, trained_on recorded as a manifest
  * property at every (re)build — and retrains when it exceeds the ratio.
  * A rebuild is the one O(corpus) lifecycle mutation; the trigger exists
  * so it runs when the model has measurably staled, not on a schedule.
  * Correctness is NEVER at stake — this is the model-quality knob,
  * self-applying. */
private[graft] object RebuildTrigger {
  val TrainedOnProp = "trained_on"

  /** Pre-props manifests (or legacy indexes) carry no trained_on: treat
    * as never-due — the operator keeps its pre-trigger behavior rather
    * than forcing an O(corpus) retrain on first probe. */
  def due(trainedOn: Option[Long], liveRows: Long, ratio: Double): Boolean =
    trainedOn.exists(t =>
      if (t == 0L) liveRows > 0L
      else math.abs(liveRows - t).toDouble > ratio * t)

  def trainedOn(state: IndexManifest.State): Option[Long] =
    state.props.get(TrainedOnProp).map(_.toLong)
}
