package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contract of the one-call [[IndexMaintenance.sweep]]: each registered
  * index is probed with its own family triggers (rebuild first — a
  * retrain subsumes the compaction — then compaction), quiet indexes are
  * untouched, a due knob fires exactly as it would standalone, and one
  * index's failure is isolated to its report row. */
class IndexMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog near the river bank at dawn every single day"

  private def docs = Seq(
    (0L, base),
    (1L, base + " vector stream filter"),
    (2L, "completely different content about spark query engines and vector execution"),
    (3L, base + " filter probe"),
    (4L, "vector vector stream filter table scan"),
    (5L, base + " table stream")
  ).toDF("doc_id", "text")

  private def vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
    (3L, Array(0.0f, 0.0f, 1.0f, 0.0f)),
    (4L, Array(0.0f, 0.0f, 0.9f, 0.1f))
  ).toDF("vec_id", "embedding")

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-maint-$tag").toString

  private def gen(idx: String): Long =
    IndexManifest.read(spark, idx).map(_.generation).getOrElse(0L)

  test("quiet fleet: nothing fires, generations unchanged, corpus unscanned") {
    val txt = tmp("quiet-text")
    val mh = tmp("quiet-mh")
    val ivf = tmp("quiet-ivf")
    TextSearchIndex.build(docs, txt)
    Dedup.minhashIndexBuild(docs, mh)
    SimilaritySearch.ivfIndexBuild(vecs, ivf, nlist = 2, iters = 1)
    val gens = Seq(txt, mh, ivf).map(gen)
    // a corpus thunk whose SCAN would blow up: a quiet probe must never
    // force data through it (plan construction alone is fine)
    val poisoned = () => docs.filter(
      udf(() => sys.error("corpus scanned on a quiet sweep"): Boolean).apply())
    val reports = IndexMaintenance.sweep(spark, Seq(
      IndexMaintenance.TextIndexReg(txt, poisoned),
      IndexMaintenance.MinhashIndex(mh),
      IndexMaintenance.IvfIndex(ivf, poisoned, nlist = 2, iters = 1)))
    assert(reports.forall(r => !r.rebuilt && !r.compacted && r.failed.isEmpty))
    assert(Seq(txt, mh, ivf).map(gen) === gens)
  }

  test("due knobs fire inside the sweep exactly as standalone: text rebuild " +
    "(growth past ratio), minhash compaction (delete wave), ivf hold") {
    val txt = tmp("due-text")
    val mh = tmp("due-mh")
    val ivf = tmp("due-ivf")
    TextSearchIndex.build(docs.filter(col("doc_id") % 2 === 0), txt)
    TextSearchIndex.append(docs.filter(col("doc_id") % 2 === 1), txt) // growth ≈ 1.0
    Dedup.minhashIndexBuild(docs, mh)
    Dedup.minhashIndexDelete(docs.select("doc_id").filter(col("doc_id") % 2 === 0), mh) // 50%
    SimilaritySearch.ivfIndexBuild(vecs, ivf, nlist = 2, iters = 1)
    val (tg, mg, ig) = (gen(txt), gen(mh), gen(ivf))
    val reports = IndexMaintenance.sweep(spark, Seq(
      IndexMaintenance.TextIndexReg(txt, () => docs, growthRatio = 0.5),
      IndexMaintenance.MinhashIndex(mh),
      IndexMaintenance.IvfIndex(ivf, () => vecs, nlist = 2, iters = 1)))
    val byDir = reports.map(r => r.dir -> r).toMap
    assert(byDir(txt).rebuilt && !byDir(txt).compacted && gen(txt) === tg + 1)
    assert(byDir(txt).generation === tg + 1, "report carries the post-sweep generation")
    assert(!byDir(mh).rebuilt && byDir(mh).compacted && gen(mh) === mg + 1)
    assert(!byDir(ivf).rebuilt && !byDir(ivf).compacted && gen(ivf) === ig)
    // post-rebuild text state is a fresh full-corpus build
    val fresh = tmp("due-fresh")
    TextSearchIndex.build(docs, fresh)
    def top(d: String) = TextSearchIndex.search(spark, d, Seq("vector", "stream"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(top(txt) === top(fresh))
    // the compacted minhash retired its tombstones and keeps masking
    val live = Dedup.minhashIndexRows(spark, mh)
      .select("c_id").distinct().collect().map(_.getLong(0)).toSet
    assert(live.forall(_ % 2 == 1))
    // a second sweep is a no-op: the knobs restored their invariants
    val again = IndexMaintenance.sweep(spark, Seq(
      IndexMaintenance.TextIndexReg(txt, () => docs, growthRatio = 0.5),
      IndexMaintenance.MinhashIndex(mh),
      IndexMaintenance.IvfIndex(ivf, () => vecs, nlist = 2, iters = 1)))
    assert(again.forall(r => !r.rebuilt && !r.compacted && r.failed.isEmpty))
  }

  test("fsck: a healthy fleet audits ok; a lost segment and a truncated file " +
    "are flagged; orphans and stale staging are reported as debt, not damage") {
    val txt = tmp("fsck-text")
    val ivf = tmp("fsck-ivf")
    TextSearchIndex.build(docs, txt)
    SimilaritySearch.ivfIndexBuild(vecs, ivf, nlist = 2, iters = 1)
    val regs = Seq(
      IndexMaintenance.TextIndexReg(txt, () => docs),
      IndexMaintenance.IvfIndex(ivf, () => vecs, nlist = 2, iters = 1))
    val healthy = IndexMaintenance.fsck(spark, regs).map(_._2)
    assert(healthy.forall(a => a.ok && !a.unbuilt && a.orphans.isEmpty))
    assert(healthy.forall(_.generation === 1L))
    // an unbuilt dir is reported as such, not as damage
    val eAudit = IndexMaintenance
      .fsck(spark, Seq(IndexMaintenance.MinhashIndex(tmp("fsck-empty")))).head._2
    assert(eAudit.unbuilt && eAudit.ok && eAudit.generation === 0L)
    // crash debt: an orphan next-gen dir and a stale staging file — audit
    // surfaces both, verdict stays ok (the recovery contract owns them)
    Seq((0L, 1L)).toDF("a", "b").write
      .parquet(s"$txt/${IndexManifest.genName("postings-stream", 9)}")
    val mdir = new java.io.File(s"$txt/manifest"); mdir.mkdirs()
    new java.io.File(mdir, ".tmp-gen-9").createNewFile()
    val debt = IndexMaintenance
      .fsck(spark, Seq(IndexMaintenance.TextIndexReg(txt, () => docs))).head._2
    assert(debt.ok && debt.orphans === Seq(IndexManifest.genName("postings-stream", 9)))
    assert(debt.staleTmp === 1)
    // real damage: the live stats table vanishes → missing + not ok
    val stats = IndexManifest.liveTableDir(spark, txt, IndexManifest.Layouts.text, "stats")
    val p = new org.apache.hadoop.fs.Path(stats)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    val damaged = IndexMaintenance
      .fsck(spark, Seq(IndexMaintenance.TextIndexReg(txt, () => docs))).head._2
    assert(!damaged.ok && damaged.missingTables.nonEmpty)
    // a truncated parquet footer in a live segment → unreadable + not ok
    val vdir = IndexManifest.liveTableDir(spark, ivf, IndexManifest.Layouts.ivf, "centroids")
    val victim = new java.io.File(vdir).listFiles().filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.write(victim.toPath, Array[Byte](1, 2, 3))
    val torn = IndexMaintenance
      .fsck(spark, Seq(IndexMaintenance.IvfIndex(ivf, () => vecs, nlist = 2, iters = 1))).head._2
    assert(!torn.ok && torn.unreadable.nonEmpty)
  }

  test("failure isolation: a broken registration reports failed and the " +
    "sweep continues to the rest") {
    val broken = tmp("broken") // an empty dir: no stats table to probe
    val mh = tmp("iso-mh")
    Dedup.minhashIndexBuild(docs, mh)
    Dedup.minhashIndexDelete(docs.select("doc_id").filter(col("doc_id") % 2 === 0), mh)
    val mg = gen(mh)
    val reports = IndexMaintenance.sweep(spark, Seq(
      IndexMaintenance.TextIndexReg(broken, () => docs),
      IndexMaintenance.MinhashIndex(mh)))
    assert(reports.head.failed.nonEmpty, "probing a dir with no index must fail loudly")
    assert(!reports.head.rebuilt && !reports.head.compacted)
    assert(reports(1).failed.isEmpty && reports(1).compacted && gen(mh) === mg + 1,
      "the failure must not stop the rest of the fleet")
  }

  test("visibility audit: streamed rows under a live-generation-scoped kill " +
    "are flagged (the damage class requireAppendable can't see for streams); " +
    "unscoped takedowns and upsert-then-stream re-adds stay clean") {
    val baseDir = tmp("vis")
    val (idx, arrivals, ckpt) = (s"$baseDir/idx", s"$baseDir/in", s"$baseDir/ckpt")
    val docs5 = docs
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    Dedup.minhashIndexBuild(docs.filter(col("doc_id") <= 2), idx)
    docs5.filter(col("doc_id") >= 3).coalesce(1).write.mode("append").parquet(arrivals)
    Dedup.minhashIndexAppendStream(spark, idx, arrivals, ckpt)
    val reg = IndexMaintenance.MinhashIndex(idx)
    def deep() = IndexMaintenance.fsck(spark, Seq(reg), visibility = true).head._2
    assert(deep().ok, "streamed rows alone are healthy")
    // an UNSCOPED takedown of a streamed id hides it by documented
    // contract — the visibility pass must NOT flag the contract working
    Dedup.minhashIndexDelete(Seq(4L).toDF("doc_id"), idx)
    assert(deep().ok)
    // the hidden class: a scoped kill at the live generation covers the
    // live stream segment (the "retract existing copies, future re-adds
    // serve" takedown variant — also what any future regression of the
    // upsert discipline would produce): streamed doc 3 stops serving
    // with no error anywhere
    val st = IndexManifest.resolve(spark, idx, IndexManifest.Layouts.minhash)
    Tombstones.delete(Seq(3L).toDF("doc_id"), idx, st.tombstones,
      asOfGen = IndexManifest.segGen(st.stream))
    assert(Dedup.minhashIndexRows(spark, idx).filter(col("c_id") === 3L).isEmpty,
      "the planted condition really is silent: the row just stops serving")
    val shallow = IndexMaintenance.fsck(spark, Seq(reg)).head._2
    assert(shallow.ok && shallow.hiddenStreamIds.isEmpty,
      "structural fsck can't see visibility damage — that's the gap")
    val flagged = deep()
    assert(!flagged.ok && flagged.hiddenStreamIds === Seq(3L))
    // the turnkey path: a DEFAULT sweep carries the same evidence — read
    // before its mutation probes, so even the compaction it fires here
    // (tombstone ratio past the trigger) cannot erase it from the report
    val swept = IndexMaintenance.sweep(spark, Seq(reg)).head
    assert(swept.failed.isEmpty && swept.hidden === Seq(3L),
      "a scheduled fleet catches the hidden-stream class without hand-run fsck")
    // remediation per the audit contract: compaction applies the kill
    // physically, making the hidden state explicit — audit returns to ok
    if (!swept.compacted) Dedup.minhashIndexCompact(spark, idx)
    assert(deep().ok)
    assert(IndexMaintenance.sweep(spark, Seq(reg)).head.hidden.isEmpty,
      "post-fold sweeps report a clean fleet")
    // the sanctioned re-add path stays clean: upsert doc 5 (scoped kill at
    // the pre-upsert generation), then stream it again — the streamed copy
    // lands in the NEXT generation's stream segment, above the scope
    Dedup.minhashIndexUpsert(docs.filter(col("doc_id") === 5L), idx)
    docs5.filter(col("doc_id") === 5L).coalesce(1).write.mode("append").parquet(arrivals)
    // the upsert moved the stream segment; a parquet sink's metadata log is
    // per-directory, so continuing the OLD checkpoint against the new dir
    // fails loudly — a fresh checkpoint is the re-attach contract
    Dedup.minhashIndexAppendStream(spark, idx, arrivals, s"$ckpt-2")
    assert(Dedup.minhashIndexRows(spark, idx).filter(col("c_id") === 5L).count() > 0)
    assert(deep().ok, "a streamed re-add above the upsert's scope is served, not hidden")
  }

  test("a lost single-writer race inside the sweep is retried once against " +
    "the moved state; a persistent loser reports failed honestly") {
    val injectUdf = udf { (t: String) => SweepRaceInjector.fire(); t }
    // corpus whose SCAN publishes a competing next-generation manifest —
    // armed from the thunk, i.e. after the sweep committed to this
    // attempt but before the rebuild's own commit: exactly the
    // concurrent-ingest interleaving. `loseAttempts` bounds how many
    // attempts lose; the thunk call count observes the retry directly.
    def racing(idx: String, loseAttempts: Int, calls: java.util.concurrent.atomic.AtomicInteger) =
      () => {
        if (calls.incrementAndGet() <= loseAttempts)
          SweepRaceInjector.arm(idx, gen(idx))
        docs.withColumn("text", injectUdf(col("text")))
      }
    def dueIndex(tag: String): String = {
      val idx = tmp(tag)
      TextSearchIndex.build(docs.filter(col("doc_id") % 2 === 0), idx)
      TextSearchIndex.append(docs.filter(col("doc_id") % 2 === 1), idx) // growth ≈ 1.0
      idx
    }
    // lose the FIRST attempt only: the retry re-probes the moved state
    // (the competitor's manifest) and lands its rebuild above it
    val txt = dueIndex("race-text")
    val g0 = gen(txt)
    val calls = new java.util.concurrent.atomic.AtomicInteger
    val reports = IndexMaintenance.sweep(spark, Seq(
      IndexMaintenance.TextIndexReg(txt, racing(txt, 1, calls), growthRatio = 0.5)))
    assert(calls.get === 2, "the lost race must trigger exactly one re-probe")
    assert(reports.head.failed.isEmpty && reports.head.rebuilt,
      s"retry must succeed, got ${reports.head}")
    assert(gen(txt) === g0 + 2, "the competing commit, then the retried rebuild above it")
    // the rebuilt index answers like a fresh full-corpus build
    val fresh = tmp("race-fresh")
    TextSearchIndex.build(docs, fresh)
    def top(d: String) = TextSearchIndex.search(spark, d, Seq("vector", "stream"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(top(txt) === top(fresh))
    // lose EVERY attempt: after the bounded retry the sweep reports
    // failed honestly — and the index stays fully servable (the commit
    // is the atomic point; losers leave only GC-able orphans)
    val txt2 = dueIndex("race-text2")
    val calls2 = new java.util.concurrent.atomic.AtomicInteger
    val r2 = IndexMaintenance.sweep(spark, Seq(
      IndexMaintenance.TextIndexReg(txt2, racing(txt2, Int.MaxValue, calls2), growthRatio = 0.5)))
    assert(calls2.get === 2, "retries are bounded: one re-probe, then report")
    assert(r2.head.failed.exists(_.contains("single-writer")) && !r2.head.rebuilt)
    assert(TextSearchIndex.search(spark, txt2, Seq("vector"), 10).collect().nonEmpty,
      "a doubly-lost sweep leaves the index serving")
    // the next cadence (no competitor) recovers without intervention
    val calls3 = new java.util.concurrent.atomic.AtomicInteger
    val r3 = IndexMaintenance.sweep(spark, Seq(
      IndexMaintenance.TextIndexReg(txt2, racing(txt2, 0, calls3), growthRatio = 0.5)))
    assert(r3.head.failed.isEmpty && r3.head.rebuilt)
    assert(top(txt2) === top(fresh))
  }
}

/** Deterministic stand-in for a concurrent single-writer: when armed, the
  * first corpus row scanned publishes the index's NEXT-generation manifest
  * as a raw copy of the live one with the generation bumped — byte-wise
  * what a concurrent metadata-only commit leaves behind — so the in-flight
  * rebuild's own commit of that generation loses the race. One-shot per
  * arm (CAS), so attempt counts in the spec are exact. */
private object SweepRaceInjector {
  import java.nio.charset.StandardCharsets.UTF_8
  import java.nio.file.{Files, Paths}
  private val pending =
    new java.util.concurrent.atomic.AtomicReference[(String, Long)](null)

  def arm(dir: String, liveGen: Long): Unit = pending.set((dir, liveGen))

  def fire(): Unit = {
    val p = pending.get()
    if (p != null && pending.compareAndSet(p, null)) {
      val (dir, liveGen) = p
      val mdir = Paths.get(dir, "manifest")
      val text = new String(
        Files.readAllBytes(mdir.resolve(f"gen-$liveGen%09d.manifest")), UTF_8)
      Files.write(
        mdir.resolve(f"gen-${liveGen + 1}%09d.manifest"),
        text.replace(s"generation=$liveGen", s"generation=${liveGen + 1}").getBytes(UTF_8))
    }
  }
}
