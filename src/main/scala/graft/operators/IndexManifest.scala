package graft.operators

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Generation-numbered manifest for every persisted index directory — the
  * single source of truth for "what is the live state of this index".
  *
  * Before round 8 each family resolved its state from N existence probes
  * (base dir? stream segment? tombstones?) and compaction committed by
  * delete-then-rename, which left two crash windows: a crash between
  * `delete(base)` and `rename(tmp, base)` made readers silently treat the
  * missing base as an EMPTY index, and a crash between the rename and the
  * stream-segment delete double-counted folded rows. The manifest closes
  * both the Iceberg/Delta way: segment data is written FIRST under
  * generation-suffixed names that no current reader looks at, and the
  * mutation commits by atomically creating ONE new manifest file naming
  * the complete next state — base tables, stream segment, tombstone
  * segment, all at once. A crash before the manifest write leaves the old
  * generation fully live (its dirs untouched); a crash after it leaves
  * the new generation fully live (orphan dirs from the old one are
  * ignored by name and swept by the next commit's GC).
  *
  * Layout under an index root:
  *  - `manifest/gen-000000042.manifest` — properties-style lines
  *    (`generation=…`, `stream=…`, `tombstones=…`, `table.<name>=<dir>`);
  *    readers take the HIGHEST generation present. A new manifest file is
  *    staged dot-prefixed and renamed into place — and because each
  *    generation is a fresh filename, the commit is atomic on object
  *    stores too (create, not overwrite; the rename-onto-existing caveat
  *    never arises).
  *  - `<table>-g042/` etc. — the segment dirs the live manifest names.
  *
  * Indexes persisted before the manifest era carry none: [[resolve]]
  * falls back to the family's fixed legacy names as generation 0, so old
  * on-disk indexes stay readable, and their first lifecycle mutation
  * migrates them (commits generation 1 and GCs the legacy dirs).
  *
  * Concurrency contract (unchanged from the pre-manifest lifecycle):
  * lifecycle mutations on one index are single-writer — the exists-check
  * on the generation filename turns a concurrent second writer into a
  * loud error instead of silent last-write-wins. Readers never block.
  * Scope: the manifest gives SEGMENT-level consistency; a batch append
  * into a live segment dir still relies on the parquet job commit for
  * file-level atomicity, exactly as any Spark parquet append does.
  */
private[graft] object IndexManifest {

  /** The live state of an index dir: physical dir name (relative to the
    * index root) for each logical table, the streamed segment, the
    * tombstone segment, and free-form properties (`prop.<k>=<v>` lines —
    * e.g. `trained_on`, the row count a family's frozen model was fitted
    * over, which the rebuild trigger compares against live rows). Props
    * ride every generation commit; pre-props manifests parse with an
    * empty map. */
  final case class State(
      generation: Long,
      tables: Map[String, String],
      stream: String,
      tombstones: String,
      props: Map[String, String] = Map.empty) {
    def tableDir(root: String, name: String): String = s"$root/${tables(name)}"
    def streamDir(root: String): String = s"$root/$stream"
    def withProp(k: String, v: String): State = copy(props = props + (k -> v))
  }

  /** A family's segment layout: logical table names plus the stream-segment
    * base name. Doubles as the legacy (pre-manifest) physical layout.
    * `idCol` names the document/vector id column the family's STREAM
    * segment rows carry — the join key of [[audit]]'s opt-in visibility
    * pass (scoped-tombstone coverage of streamed rows). */
  final case class Layout(tables: Seq[String], streamBase: String, idCol: String = "id") {
    def legacyState: State =
      State(0L, tables.map(t => t -> t).toMap, streamBase, "tombstones")
    def names: Seq[String] = tables :+ streamBase :+ "tombstones"
    /** The fully-renamed next generation: every mutable segment moves to a
      * generation-suffixed dir; `carry` keeps named static tables (models)
      * at their current dirs instead. */
    def advance(prev: State, carry: Set[String] = Set.empty): State =
      State(
        prev.generation + 1,
        tables.map { t =>
          t -> (if (carry(t)) prev.tables(t) else genName(t, prev.generation + 1))
        }.toMap,
        genName(streamBase, prev.generation + 1),
        genName("tombstones", prev.generation + 1),
        prev.props)
  }

  object Layouts {
    val minhash: Layout = Layout(Seq("meta", "index"), "index-stream", "c_id")
    val semantic: Layout = Layout(Seq("model", "survivors"), "survivors-stream", "vec_id")
    val ivf: Layout = Layout(Seq("centroids", "vectors"), "vectors-stream", "n_id")
    val ivfpq: Layout =
      Layout(Seq("centroids", "codebooks", "codes", "vectors"), "arrivals-stream", "n_id")
    val text: Layout = Layout(Seq("stats", "postings"), "postings-stream", "doc_id")
    val clusters: Layout = Layout(Seq("assignments"), "assignments-delta", "doc_id")
  }

  def genName(logical: String, gen: Long): String = f"$logical%s-g$gen%03d"

  private val GenSuffix = """.*-g(\d+)$""".r

  /** The generation a segment dir was created at, parsed from its
    * [[genName]] suffix — legacy fixed-name dirs are generation 0. This
    * is the scope key for generation-scoped tombstones
    * ([[Tombstones.dropScoped]]): rows carry their segment's creation
    * generation, and a scoped delete hides only segments at or below
    * its `ts_gen`. */
  def segGen(segmentName: String): Long = segmentName match {
    case GenSuffix(g) => g.toLong
    case _ => 0L
  }

  private val Dir = "manifest"
  private val GenFile = """gen-(\d+)\.manifest""".r

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  private def genPath(root: String, gen: Long): Path =
    new Path(f"$root/$Dir/gen-$gen%09d.manifest")

  private def render(s: State): String = {
    val tables = s.tables.toSeq.sortBy(_._1).map { case (k, v) => s"table.$k=$v" }
    val props = s.props.toSeq.sortBy(_._1).map { case (k, v) => s"prop.$k=$v" }
    (Seq(s"generation=${s.generation}", s"stream=${s.stream}",
      s"tombstones=${s.tombstones}") ++ tables ++ props).mkString("", "\n", "\n")
  }

  private def parse(text: String): State = {
    val kv = text.linesIterator.filter(_.contains('=')).map { l =>
      val i = l.indexOf('='); l.take(i) -> l.drop(i + 1)
    }.toMap
    State(
      kv("generation").toLong,
      kv.collect { case (k, v) if k.startsWith("table.") => k.stripPrefix("table.") -> v },
      kv("stream"),
      kv("tombstones"),
      kv.collect { case (k, v) if k.startsWith("prop.") => k.stripPrefix("prop.") -> v })
  }

  /** Generations retained per index: the live one plus this many
    * predecessors — BOTH the manifest file and every segment dir it
    * references survive that long, so (a) a reader that resolved its
    * state just before a concurrent compaction's GC keeps scanning real
    * files instead of dying mid-query (readers never block; this is what
    * makes that safe), and (b) [[readAt]] can pin the previous
    * generation: reproduce yesterday's search after a rebuild retrained
    * the model, audit exactly what a compaction folded. The disk cost is
    * one extra base copy between lifecycle mutations — the standard
    * snapshot-retention trade; raise it for longer time travel, never
    * below 1 (a reader mid-scan at the commit instant needs the
    * outgoing generation intact). */
  val RetainedPriorGenerations = 1

  private def genNumbers(fs: FileSystem, root: String): Seq[Long] = {
    val dir = new Path(s"$root/$Dir")
    if (!fs.exists(dir)) Seq.empty
    else
      fs.listStatus(dir).flatMap(st =>
        st.getPath.getName match {
          case GenFile(g) => Some(g.toLong)
          case _ => None
        }).toSeq.sorted
  }

  private def readGen(fs: FileSystem, root: String, gen: Long): Option[State] = {
    val p = genPath(root, gen)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val bytes = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, bytes, 4096, false)
        Some(parse(new String(bytes.toByteArray, UTF_8)))
      } finally in.close()
    }
  }

  /** The committed state, or None when the index carries no manifest
    * (legacy layout or nothing built yet). Readers take the highest
    * generation — a half-written `.tmp-` stage file never matches. */
  def read(spark: SparkSession, root: String): Option[State] = {
    val fs = fsOf(spark, new Path(root))
    genNumbers(fs, root).lastOption.flatMap(readGen(fs, root, _))
  }

  /** The generations currently pinnable by [[readAt]], oldest first —
    * the live one and up to [[RetainedPriorGenerations]] predecessors
    * (older manifests and their segments are GC'd at commit). */
  def snapshots(spark: SparkSession, root: String): Seq[Long] =
    genNumbers(fsOf(spark, new Path(root)), root)

  /** Pin a specific retained generation — the time-travel read: the
    * returned state's segment dirs are exactly the files that generation
    * committed, immutable since (mutations only ever ADD dirs and swap
    * the manifest pointer). None when that generation has been GC'd (or
    * never existed): snapshot reads are explicitly bounded by the
    * retention window, never silently redirected to another state. */
  def readAt(spark: SparkSession, root: String, gen: Long): Option[State] =
    readGen(fsOf(spark, new Path(root)), root, gen)

  /** The live state: the committed manifest, else the family's legacy
    * fixed-name layout at generation 0. */
  def resolve(spark: SparkSession, root: String, layout: Layout): State =
    read(spark, root).getOrElse(layout.legacyState)

  /** Resolve one logical table to its live physical dir — for gates and
    * specs that assert physical segment state. */
  def liveTableDir(spark: SparkSession, root: String, layout: Layout, table: String): String =
    resolve(spark, root, layout).tableDir(root, table)

  /** The live tombstone segment name, family-agnostic (every family's
    * manifest carries one; a manifest-less index uses the legacy fixed
    * name) — for the delete/read paths shared across index families. */
  def liveTombstones(spark: SparkSession, root: String): String =
    read(spark, root).map(_.tombstones).getOrElse(Tombstones.DefaultSegment)

  /** THE commit point of every lifecycle mutation: atomically publish
    * `state` as the live generation, then garbage-collect segment dirs no
    * longer referenced (legacy names and older generations — including
    * orphans a crashed earlier attempt left behind). All data dirs named
    * by `state` must be fully written before calling. */
  def commit(spark: SparkSession, root: String, state: State, layout: Layout): Unit = {
    val p = genPath(root, state.generation)
    val fs = fsOf(spark, p)
    fs.mkdirs(new Path(s"$root/$Dir"))
    if (fs.exists(p))
      sys.error(
        s"index at $root already has a generation-${state.generation} manifest — " +
          "lifecycle mutations are single-writer; refusing to overwrite")
    val tmp = new Path(s"$root/$Dir/.tmp-gen-${state.generation}")
    val out = fs.create(tmp, true)
    try out.write(render(state).getBytes(UTF_8))
    finally out.close()
    if (!fs.rename(tmp, p))
      sys.error(s"manifest commit failed: rename($tmp, $p) returned false")
    gc(spark, root, state, layout)
  }

  /** What [[audit]] found in one index dir. `ok` is the serving-health
    * verdict: the live state resolves and every segment it names is
    * present (logical tables) and footer-readable. Orphans and stale tmp
    * files are NOT failures — they are exactly what the crash-recovery
    * contract promises to leave behind and what the next commit's GC
    * sweeps; the audit surfaces them so an operator can see recovery
    * debt instead of grepping dir listings. */
  final case class Audit(
      generation: Long,
      unbuilt: Boolean,
      missingTables: Seq[String],
      unreadable: Seq[String],
      orphans: Seq[String],
      staleTmp: Int,
      hiddenStreamIds: Seq[Long] = Seq.empty) {
    def ok: Boolean =
      missingTables.isEmpty && unreadable.isEmpty && hiddenStreamIds.isEmpty
  }

  /** Structural fsck of an index dir — the "is this index servable"
    * probe a maintenance sweep can run without touching data: manifest
    * parseability, presence of every live-named logical table
    * (stream/tombstone segments are optional by contract — and a
    * present-but-schema-less segment is the documented empty state, not
    * damage), parquet-footer readability of whatever is present, orphan
    * family dirs awaiting GC, and stale manifest staging files. Cost:
    * directory listings plus one footer/schema resolution per present
    * segment — never a data scan by default.
    *
    * `visibility = true` adds the one damage class structure can't see:
    * streamed rows silently hidden by a generation-scoped tombstone.
    * [[Tombstones.requireAppendable]] refuses BATCH appends of upserted
    * ids loudly, but streaming appends skip the guard by documented
    * contract ("arrivals are new ids by construction") — a stream that
    * violates it lands rows below an upsert's scoped kill and they never
    * serve, with no error anywhere. The pass semi-joins the live stream
    * segment's ids (column-pruned, one id column) against the scoped
    * tombstone slice with `ts_gen >=` the stream segment's creation
    * generation and reports up to 20 offending ids in
    * [[Audit.hiddenStreamIds]], which fails `ok` — remediation is the
    * same as the batch guard's message: route those ids through the
    * family's upsert, or compact (compaction applies the kill
    * physically, making the hidden state explicit). Unscoped tombstones
    * are deliberately NOT flagged: hiding streamed re-adds of taken-down
    * ids is the takedown contract working. Cost: one column-pruned scan
    * of the stream segment (compaction-bounded) joined against the
    * KB-sized scoped tombstone slice, broadcast. */
  def audit(
      spark: SparkSession,
      root: String,
      layout: Layout,
      visibility: Boolean = false): Audit = {
    val rootPath = new Path(root)
    val fs = fsOf(spark, rootPath)
    val states = genNumbers(fs, root).flatMap(readGen(fs, root, _))
    val live = states.lastOption.getOrElse(layout.legacyState)
    def existsDir(n: String) = fs.exists(new Path(s"$root/$n"))
    val unbuilt = states.isEmpty && !layout.tables.exists(existsDir)
    val missing =
      if (unbuilt) Seq.empty
      else live.tables.values.toSeq.distinct.filterNot(existsDir)
    val present =
      (live.tables.values.toSet + live.stream + live.tombstones).toSeq.filter(existsDir)
    val unreadable = present.filter { n =>
      try { spark.read.parquet(s"$root/$n").schema; false }
      catch {
        // no schema-carrying files = the documented empty-segment state
        case _: org.apache.spark.sql.AnalysisException => false
        case _: Throwable => true
      }
    }
    val referenced =
      (if (states.isEmpty) Seq(layout.legacyState) else states)
        .flatMap(s => s.tables.values.toSet + s.stream + s.tombstones).toSet
    val legacyNames = layout.names.toSet
    val genPattern =
      ("^(?:" + layout.names.map(java.util.regex.Pattern.quote).mkString("|") + ")-g\\d+$").r
    val orphans =
      if (!fs.exists(rootPath)) Seq.empty
      else fs.listStatus(rootPath).toSeq
        .filter(st => st.isDirectory && {
          val n = st.getPath.getName
          !referenced(n) && (legacyNames(n) || genPattern.matches(n))
        })
        .map(_.getPath.getName).sorted
    val mdir = new Path(s"$root/$Dir")
    val staleTmp =
      if (!fs.exists(mdir)) 0
      else fs.listStatus(mdir).count(_.getPath.getName.startsWith(".tmp-"))
    val hidden =
      if (!visibility || !existsDir(live.stream)) Seq.empty[Long]
      else hiddenStreamIds(spark, root, live, layout.idCol)
    Audit(live.generation, unbuilt, missing, unreadable, orphans, staleTmp, hidden)
  }

  /** The visibility pass of [[audit]] (see its scaladoc): distinct ids in
    * the live stream segment covered by a scoped tombstone whose
    * `ts_gen >=` the segment's creation generation — rows that will never
    * serve and never error. Capped at the 20 SMALLEST ids (evidence, not
    * an inventory; ordered before the cap so the reported set is
    * deterministic).
    *
    * Failure discipline: a schema-less stream dir (zero-batch sink run —
    * only a `_spark_metadata` log, no data files) is the documented clean
    * state, but a stream segment that HAS a schema lacking the layout's id
    * column fails loudly. Swallowing that case would turn the opt-in deep
    * audit into an unconditional pass — the exact silent-OK failure mode
    * this pass exists to catch. */
  private def hiddenStreamIds(
      spark: SparkSession,
      root: String,
      live: State,
      idCol: String): Seq[Long] = {
    import org.apache.spark.sql.functions._
    Tombstones.read(spark, root, live.tombstones).fold(Seq.empty[Long]) { t =>
      val streamGen = segGen(live.stream)
      val scoped = t
        .filter(col("ts_gen") =!= Long.MaxValue && col("ts_gen") >= streamGen)
        .select(col("ts_id").as("__vid")).distinct()
      val stream =
        // schema-less stream segment (zero-batch sink run): nothing hidden
        try Some(spark.read.parquet(live.streamDir(root)))
        catch { case _: org.apache.spark.sql.AnalysisException => None }
      stream.fold(Seq.empty[Long]) { s =>
        require(
          s.columns.contains(idCol),
          s"visibility audit: stream segment ${live.streamDir(root)} has " +
            s"schema (${s.columns.mkString(", ")}) without the layout's id " +
            s"column '$idCol' — the hidden-row check cannot run; fix the " +
            "layout's idCol or the segment writer")
        s.select(col(idCol).cast("long").as("__vid")).distinct()
          .join(broadcast(scoped), Seq("__vid"), "left_semi")
          .orderBy("__vid").limit(20).collect().map(_.getLong(0)).toSeq
      }
    }
  }

  /** A version string for the index's FULL live state — the cache key a
    * serving tier needs. The manifest generation alone is not one:
    * appends land in live segment dirs and deletes append tombstone rows
    * WITHOUT a generation bump, so two reads at the same generation can
    * legitimately differ. The fingerprint therefore hashes the live
    * state's recursive file listing (path + length per file, plus the
    * generation) — any mutation on any path (append, delete, upsert,
    * compact, rebuild, props) changes it, so equality of fingerprints
    * implies equality of answers. Cost: one recursive listing of the
    * live segments — the same metadata walk every UNCACHED query's scan
    * planning already performs, so a cache keyed on this is never more
    * expensive than the miss it avoids. */
  def fingerprint(spark: SparkSession, root: String, layout: Layout): String = {
    val st = resolve(spark, root, layout)
    val fs = fsOf(spark, new Path(root))
    val names = (st.tables.values.toSet + st.stream + st.tombstones).toSeq.sorted
    val sb = new StringBuilder
    sb.append(st.generation).append('\n')
    names.foreach { n =>
      val p = new Path(s"$root/$n")
      if (fs.exists(p)) {
        val it = fs.listFiles(p, true)
        val files = scala.collection.mutable.ArrayBuffer.empty[String]
        while (it.hasNext) {
          val f = it.next()
          // full path, not just the name: cell-partitioned segments can
          // repeat a file name across subdirectories
          files += s"${f.getPath.toUri.getPath}:${f.getLen}"
        }
        files.sorted.foreach(l => sb.append(l).append('\n'))
      } else sb.append(n).append(":absent\n")
    }
    val d = java.security.MessageDigest.getInstance("SHA-256")
      .digest(sb.toString.getBytes(UTF_8))
    st.generation + "-" + d.take(12).map("%02x".format(_)).mkString
  }

  /** Metadata-only commit: publish updated props as a new generation
    * naming the SAME segment dirs (calibration curves, trained_on
    * refreshes — anything that annotates the index without touching its
    * data). The data plane is untouched, in-flight readers unaffected
    * (every dir stays referenced), and the single-writer guard applies
    * exactly as for data commits. */
  def commitProps(spark: SparkSession, root: String, state: State, layout: Layout): Unit =
    commit(spark, root, state.copy(generation = state.generation + 1), layout)

  /** Drop every segment dir that matches a family name (legacy or any
    * generation) but is not referenced by a RETAINED manifest (the live
    * one plus [[RetainedPriorGenerations]] predecessors — keeping the
    * prior generation's segments is what makes [[readAt]] snapshots and
    * in-flight readers safe across this very GC), and thin the manifest
    * history to the retained window. Best-effort: a crash here just
    * leaves orphans for the next commit's sweep. Legacy (manifest-less)
    * dirs are the one exception: no gen-0 manifest exists to pin them,
    * so a migration commit sweeps them immediately. */
  private def gc(spark: SparkSession, root: String, live: State, layout: Layout): Unit = {
    val rootPath = new Path(root)
    val fs = fsOf(spark, rootPath)
    val oldestKept = live.generation - RetainedPriorGenerations
    val retained = live +: (oldestKept until live.generation)
      .flatMap(g => readGen(fs, root, g))
    val referenced = retained
      .flatMap(s => s.tables.values.toSet + s.stream + s.tombstones).toSet
    val legacyNames = layout.names.toSet
    val genPattern =
      ("^(?:" + layout.names.map(java.util.regex.Pattern.quote).mkString("|") + ")-g\\d+$").r
    fs.listStatus(rootPath).foreach { st =>
      val n = st.getPath.getName
      if (!referenced(n) && st.isDirectory &&
        (legacyNames(n) || genPattern.matches(n)))
        fs.delete(st.getPath, true)
    }
    val mdir = new Path(s"$root/$Dir")
    fs.listStatus(mdir).foreach { st =>
      st.getPath.getName match {
        case GenFile(g) if g.toLong < oldestKept => fs.delete(st.getPath, false)
        case n if n.startsWith(".tmp-") => fs.delete(st.getPath, false)
        case _ => ()
      }
    }
  }
}
