package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** The one rename-commit primitive for epoch-keyed outputs
  * ([[graft.streaming.StreamingSearch]] answers,
  * [[graft.streaming.StreamingRollup]] sketch epochs, the semantic
  * index's streamed survivor epochs): stage a directory, then publish it
  * by renaming to its final name — the rename is the commit point, an
  * existing destination means the epoch already committed (the
  * at-least-once replay skip).
  *
  * Everything goes through the Hadoop [[FileSystem]] API, NOT java.nio —
  * the epoch dirs live under the same roots as the index segments the
  * rest of the lifecycle addresses through Hadoop FS, so a serving tier
  * can point them at HDFS-style shared storage and the staging, replay
  * skip, and commit all still work.
  *
  * Atomicity caveat (shared with every rename-commit in the engine):
  * directory rename is atomic on POSIX filesystems and HDFS, but object
  * stores (S3-style) implement rename as copy+delete — there, a reader
  * can observe a partially-"renamed" directory. On such storage, commit
  * visibility must ride a marker written AFTER the data (the `_built`
  * marker-file-last protocol used for session artifacts, or the
  * [[IndexManifest]] generation file, which is a single-file CREATE and
  * therefore atomic everywhere). The epoch readers here tolerate that:
  * [[exists]]-based skip only ever skips fully-renamed epochs, and a
  * torn copy is re-staged (mode overwrite) on replay.
  */
private[graft] object DirCommit {

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  def exists(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(dir)
    fsOf(spark, p).exists(p)
  }

  def mkdirs(spark: SparkSession, dir: String): Unit = {
    val p = new Path(dir)
    fsOf(spark, p).mkdirs(p)
    ()
  }

  def delete(spark: SparkSession, dir: String): Unit = {
    val p = new Path(dir)
    val fs = fsOf(spark, p)
    if (fs.exists(p)) fs.delete(p, true)
    ()
  }

  /** Publish the fully-written `tmp` directory as `dst`. Fails loudly on
    * a false return (destination appeared concurrently, or the FS refused)
    * rather than leaving the epoch silently uncommitted. */
  def commitDir(spark: SparkSession, tmp: String, dst: String): Unit = {
    val src = new Path(tmp)
    val to = new Path(dst)
    if (!fsOf(spark, src).rename(src, to))
      sys.error(s"epoch commit failed: rename($tmp, $dst) returned false")
  }
}
