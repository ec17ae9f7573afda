package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** LSM tombstone discipline shared by every persisted index family
  * (IVF / IVF×PQ in [[SimilaritySearch]], the minhash LSH and
  * semantic-dedup indexes in [[Dedup]]): a logical delete appends ids to
  * an `tombstones/` segment under the index dir — O(ids) regardless of
  * corpus size, no index file touched — every read-side consumer
  * anti-joins them out, and the family's compaction applies them
  * physically then clears the segment. The shape mirrors
  * [[graft.kv.LogStructuredTable]]'s delete markers, applied to index
  * artifacts instead of KV rows.
  *
  * Contract (identical across families): ids are global — a tombstone
  * hides EVERY row of that id, including rows appended after the delete,
  * until a compaction clears it; re-inserting a deleted id therefore
  * requires compacting first. Rebuilds clear stale tombstones. The anti
  * join carries no broadcast hint: AQE broadcasts the segment while it is
  * small (the expected state — compaction bounds it) and degrades to a
  * shuffled anti join rather than a driver OOM if deletes pile up.
  *
  * Compaction trigger heuristic: compact when `tombstones/` row count
  * exceeds ~1% of the base (the anti-join build side stops being
  * trivially broadcastable long before that at corpus scale) or after a
  * fixed number of stream epochs — whichever comes first. Deletes are
  * correct at ANY tombstone volume; the trigger is purely a read-cost
  * knob (probed rows ∪ tombstones per search).
  */
private[graft] object Tombstones {
  private val Segment = "tombstones"

  private def fsPath(spark: org.apache.spark.sql.SparkSession, dir: String) = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/$Segment")
    (p, p.getFileSystem(spark.sessionState.newHadoopConf()))
  }

  /** Logical delete: append the ids (first column, cast to long) to the
    * tombstone segment under a canonical `ts_id` column. */
  def delete(ids: DataFrame, dir: String): Unit =
    ids.select(col(ids.columns.head).cast("long").as("ts_id"))
      .write.mode("append").parquet(s"$dir/$Segment")

  /** The tombstone set, or None when the segment doesn't exist or holds
    * no schema-carrying files (an empty-DataFrame write). */
  def read(
      spark: org.apache.spark.sql.SparkSession,
      dir: String): Option[DataFrame] = {
    val (p, fs) = fsPath(spark, dir)
    if (!fs.exists(p)) None
    else
      try Some(spark.read.parquet(s"$dir/$Segment"))
      catch { case _: org.apache.spark.sql.AnalysisException => None }
  }

  /** Anti-join pending deletes out of `rows` on `idCol` — a no-op plan
    * when no tombstones exist. Apply AFTER any cell/bucket pruning so the
    * check touches pruned rows only. */
  def drop(rows: DataFrame, dir: String, idCol: String): DataFrame =
    read(rows.sparkSession, dir).fold(rows)(t =>
      rows.join(
        t.select(col("ts_id").as(idCol)).distinct(),
        Seq(idCol),
        "left_anti"))

  def clear(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    val (p, fs) = fsPath(spark, dir)
    if (fs.exists(p)) fs.delete(p, true)
  }
}
