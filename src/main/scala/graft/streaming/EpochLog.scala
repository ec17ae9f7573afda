package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Retention state for epoch-keyed streaming output directories
  * ([[StreamingSearch]] answers, [[StreamingRollup]] sketch tables) — the
  * [[graft.operators.IndexManifest]] discipline scaled down to what a
  * fold needs: a generation-numbered state file naming (a) the live
  * folded-base segment and (b) the high-water epoch mark, committed by
  * atomically CREATING the next generation's file. One state read answers
  * "which base, and which epoch dirs are live"; readers ignore epoch dirs
  * at or below the mark, so a crash between the state commit and the
  * folded dirs' deletion never double-counts, and a crash before the
  * commit leaves the previous state fully live. The mark also keeps
  * at-least-once replays of already-folded epochs out (the writer-side
  * skip), and it is monotone — folding a fold can never lower it and
  * re-admit a late replay.
  *
  * Everything runs through the Hadoop FileSystem API so the output root
  * can sit on HDFS-style shared storage next to the index segments.
  */
private[graft] object EpochLog {

  /** gen 0 / mark −1 / no base = nothing folded yet. */
  final case class State(gen: Long, mark: Long, base: Option[String]) {
    def baseDir(root: String): Option[String] = base.map(b => s"$root/$b")
  }

  private val Dir = "_epochlog"
  private val StateFile = """state-(\d+)""".r

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  def state(spark: SparkSession, root: String): State = {
    val d = new Path(s"$root/$Dir")
    val fs = fsOf(spark, d)
    if (!fs.exists(d)) State(0L, -1L, None)
    else {
      val gens = fs.listStatus(d).flatMap(st =>
        st.getPath.getName match {
          case StateFile(g) => Some(g.toLong)
          case _ => None
        })
      if (gens.isEmpty) State(0L, -1L, None)
      else {
        val p = new Path(f"$root/$Dir/state-${gens.max}%09d")
        val in = fs.open(p)
        val bytes = new java.io.ByteArrayOutputStream()
        try org.apache.hadoop.io.IOUtils.copyBytes(in, bytes, 4096, false)
        finally in.close()
        val kv = new String(bytes.toByteArray, UTF_8).linesIterator
          .filter(_.contains('='))
          .map { l => val i = l.indexOf('='); l.take(i) -> l.drop(i + 1) }
          .toMap
        State(gens.max, kv("mark").toLong, kv.get("base").filter(_.nonEmpty))
      }
    }
  }

  /** Atomically publish the next state (gen must be prior gen + 1), then
    * best-effort GC: the epochs folded this round, the previous base, and
    * state history past the last two generations. */
  def commit(
      spark: SparkSession,
      root: String,
      next: State,
      foldedEpochDirs: Seq[String],
      oldBase: Option[String]): Unit = {
    val p = new Path(f"$root/$Dir/state-${next.gen}%09d")
    val fs = fsOf(spark, p)
    fs.mkdirs(new Path(s"$root/$Dir"))
    if (fs.exists(p))
      sys.error(s"epoch log at $root already has state generation ${next.gen} — " +
        "folds are single-writer; refusing to overwrite")
    val tmp = new Path(s"$root/$Dir/.tmp-state-${next.gen}")
    val out = fs.create(tmp, true)
    try out.write(
      s"mark=${next.mark}\nbase=${next.base.getOrElse("")}\n".getBytes(UTF_8))
    finally out.close()
    if (!fs.rename(tmp, p))
      sys.error(s"epoch-log commit failed: rename($tmp, $p) returned false")
    foldedEpochDirs.foreach { e =>
      val ep = new Path(e)
      if (fs.exists(ep)) fs.delete(ep, true)
    }
    oldBase.filterNot(next.base.contains).foreach { b =>
      val bp = new Path(s"$root/$b")
      if (fs.exists(bp)) fs.delete(bp, true)
    }
    fs.listStatus(new Path(s"$root/$Dir")).foreach { st =>
      st.getPath.getName match {
        case StateFile(g) if g.toLong < next.gen - 1 => fs.delete(st.getPath, false)
        case n if n.startsWith(".tmp-") => fs.delete(st.getPath, false)
        case _ => ()
      }
    }
  }

  /** The committed `epoch=N` dirs under `epochsDir`, ascending. */
  def epochs(spark: SparkSession, epochsDir: String): Seq[Long] = {
    val d = new Path(epochsDir)
    val fs = fsOf(spark, d)
    if (!fs.exists(d)) Seq.empty
    else
      fs.listStatus(d).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("epoch="))
        .map(_.getPath.getName.stripPrefix("epoch=").toLong)
        .sorted
  }
}
