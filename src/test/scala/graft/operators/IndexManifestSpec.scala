package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Crash-consistency contract of the generation-numbered [[IndexManifest]]
  * across all four persisted index families: segment data written without
  * the manifest bump is INVISIBLE (a killed compaction leaves the old
  * generation fully live, never a silently-empty or mixed index), the next
  * real mutation recovers by overwriting the orphan and committing, and a
  * manifest-less (pre-round-8) index resolves through the legacy fixed
  * names until its first mutation migrates it. */
class IndexManifestSpec extends SparkSpec {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog near the river bank at dawn every single day"

  private def docs = Seq(
    (0L, base),
    (1L, base + " extra"),
    (2L, "completely different content about spark query engines and columnar execution plans"),
    (3L, base + " probe text")
  ).toDF("doc_id", "text")

  private def vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
    (3L, Array(0.0f, 0.0f, 1.0f, 0.0f)),
    (4L, Array(0.0f, 0.0f, 0.9f, 0.1f))
  ).toDF("vec_id", "embedding")

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-manifest-$tag").toString

  private def gen(idx: String): Long =
    IndexManifest.read(spark, idx).map(_.generation).getOrElse(0L)

  test("minhash: garbage next-gen base without a manifest bump is invisible; " +
    "the real compact recovers over it") {
    val idx = tmp("mh")
    Dedup.minhashIndexBuild(docs.filter(col("doc_id") <= 2), idx)
    Dedup.minhashIndexAppend(docs.filter(col("doc_id") === 3), idx)
    Dedup.minhashIndexDelete(Seq(0L).toDF("doc_id"), idx)
    def rows(): Set[(Int, Long)] =
      Dedup.minhashIndexRows(spark, idx).collect()
        .map(r => (r.getInt(0), r.getLong(1))).toSet
    val live = rows()
    assert(gen(idx) === 1L)
    // a compaction killed between its segment write and the manifest
    // commit: the next generation's base exists, full of garbage
    Seq((12345, 999L, Seq(1L, 2L, 3L, 4L)))
      .toDF("bucket", "c_id", "c_sig")
      .write.mode("overwrite").parquet(s"$idx/${IndexManifest.genName("index", 2L)}")
    assert(rows() === live, "reader must still serve the OLD generation")
    assert(gen(idx) === 1L)
    // recovery: the real compact overwrites the orphan and commits gen 2
    Dedup.minhashIndexCompact(spark, idx)
    assert(gen(idx) === 2L)
    assert(rows() === live)
    assert(!rows().exists(_._2 == 999L), "the garbage rows must be gone")
    // snapshot retention: the outgoing generation's segments survive ONE
    // commit (readers mid-scan + readAt time travel), then the next
    // commit's GC sweeps them
    assert(new java.io.File(s"$idx/${IndexManifest.genName("index", 1L)}").exists(),
      "gen-1 base must be RETAINED after the gen-2 commit (snapshot window)")
    assert(IndexManifest.readAt(spark, idx, 1L).exists(_.generation == 1L))
    Dedup.minhashIndexDelete(Seq(1L).toDF("doc_id"), idx)
    Dedup.minhashIndexCompact(spark, idx)
    assert(gen(idx) === 3L)
    assert(!new java.io.File(s"$idx/${IndexManifest.genName("index", 1L)}").exists(),
      "gen-1 base must be GC'd once it leaves the retention window")
    assert(IndexManifest.readAt(spark, idx, 1L).isEmpty,
      "an expired snapshot reads as None, never a redirect")
  }

  test("semantic: garbage next-gen survivors without a manifest bump are invisible") {
    val idx = tmp("sem")
    Dedup.semanticIndexBuild(vecs, idx, k = 2, rounds = 1)
    Dedup.semanticIndexDelete(Seq(0L).toDF("vec_id"), idx)
    def ids(): Set[Long] =
      Dedup.semanticIndexSurvivors(spark, idx).select("vec_id")
        .collect().map(_.getLong(0)).toSet
    val live = ids()
    Seq((999L, Seq(1.0f, 0f, 0f, 0f), 0L))
      .toDF("vec_id", "embedding", "cluster")
      .write.mode("overwrite").partitionBy("cluster")
      .parquet(s"$idx/${IndexManifest.genName("survivors", 2L)}")
    assert(ids() === live)
    Dedup.semanticIndexCompact(spark, idx)
    assert(gen(idx) === 2L)
    assert(ids() === live)
  }

  test("ivf: garbage next-gen vectors without a manifest bump are invisible") {
    val idx = tmp("ivf")
    SimilaritySearch.ivfIndexBuild(vecs, idx, nlist = 2, iters = 1)
    SimilaritySearch.indexDelete(Seq(4L).toDF("vec_id"), idx)
    def res(): Set[(Long, Long)] =
      SimilaritySearch.ivfIndexSearch(spark, idx, vecs.filter(col("vec_id") === 0L), 3, nprobe = 2)
        .select("n_id", "rank").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val live = res()
    assert(!live.exists(_._1 == 4L))
    Seq((999L, Seq(1.0, 0.0, 0.0, 0.0), 1.0, 0))
      .toDF("n_id", "nv", "nn", "cell")
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$idx/${IndexManifest.genName("vectors", 2L)}")
    assert(res() === live)
    SimilaritySearch.ivfIndexCompact(spark, idx)
    assert(gen(idx) === 2L)
    assert(res() === live)
  }

  test("ivfpq: a crash after writing only ONE of the two next-gen tables " +
    "leaves the old generation fully live — never a mixed state") {
    val idx = tmp("ivfpq")
    SimilaritySearch.ivfPqIndexBuild(vecs, idx, nlist = 2, iters = 1, m = 2, dim = 4, pqNlist = 2)
    SimilaritySearch.indexDelete(Seq(4L).toDF("vec_id"), idx)
    def res(): Set[Long] =
      SimilaritySearch
        .ivfPqIndexSearch(spark, idx, vecs.filter(col("vec_id") === 0L), 3, nprobe = 2)
        .select("n_id").collect().map(_.getLong(0)).toSet
    val live = res()
    assert(!live.contains(4L))
    // the round-7 nightmare: one table's next generation written, the other
    // not, then a crash — with the manifest unbumped BOTH stay invisible
    Seq((999L, Seq(1.0, 0.0, 0.0, 0.0), 1.0, 0))
      .toDF("n_id", "nv", "nn", "cell")
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$idx/${IndexManifest.genName("vectors", 2L)}")
    assert(res() === live, "half-written next generation must be invisible")
    assert(gen(idx) === 1L)
    SimilaritySearch.ivfPqIndexCompact(spark, idx)
    assert(gen(idx) === 2L)
    assert(res() === live)
    // both gen-1 tables sit inside the retention window after the gen-2
    // commit — the snapshot keeps the PAIR, never a mixed half
    assert(new java.io.File(s"$idx/${IndexManifest.genName("vectors", 1L)}").exists())
    assert(new java.io.File(s"$idx/${IndexManifest.genName("codes", 1L)}").exists())
    val snap = IndexManifest.readAt(spark, idx, 1L).get
    assert(snap.tables("vectors") === IndexManifest.genName("vectors", 1L))
    assert(snap.tables("codes") === IndexManifest.genName("codes", 1L))
  }

  test("legacy manifest-less index resolves fixed names; first mutation migrates and GCs them") {
    val idx = tmp("legacy")
    // hand-build the pre-round-8 on-disk layout: fixed dir names, no manifest
    Seq((16, 4, 2000)).toDF("num_perm", "bands", "max_bucket")
      .coalesce(1).write.parquet(s"$idx/meta")
    Dedup.minhashIndex(docs).write.parquet(s"$idx/index")
    def rows(): Set[Long] =
      Dedup.minhashIndexRows(spark, idx).select("c_id").collect().map(_.getLong(0)).toSet
    assert(rows() === Set(0L, 1L, 2L, 3L), "legacy layout must read without a manifest")
    assert(IndexManifest.read(spark, idx).isEmpty)
    // first lifecycle mutation migrates: delete + compact commit generation 1
    Dedup.minhashIndexDelete(Seq(0L).toDF("doc_id"), idx)
    assert(rows() === Set(1L, 2L, 3L), "tombstone in the legacy segment applies")
    Dedup.minhashIndexCompact(spark, idx)
    assert(gen(idx) === 1L)
    assert(rows() === Set(1L, 2L, 3L))
    assert(!new java.io.File(s"$idx/index").exists(), "legacy base GC'd after migration")
    assert(new java.io.File(s"$idx/meta").exists(), "carried static table keeps its legacy dir")
  }

  test("pre-round-7 tombstone segments wrote n_id: pending deletes still apply") {
    val idx = tmp("oldts")
    SimilaritySearch.ivfIndexBuild(vecs, idx, nlist = 2, iters = 1)
    // an old-version delete: the id column named n_id, not ts_id
    val seg = IndexManifest.liveTombstones(spark, idx)
    Seq(4L).toDF("n_id").write.mode("append").parquet(s"$idx/$seg")
    val hits = SimilaritySearch
      .ivfIndexSearch(spark, idx, vecs.filter(col("vec_id") === 3L), 3, nprobe = 2)
      .select("n_id").collect().map(_.getLong(0)).toSet
    assert(!hits.contains(4L), "old-format tombstone must hide the id")
    // and a MIXED segment (old n_id file + new ts_id append) applies both
    SimilaritySearch.indexDelete(Seq(1L).toDF("vec_id"), idx)
    val hits2 = SimilaritySearch
      .ivfIndexSearch(spark, idx, vecs.filter(col("vec_id") === 0L), 4, nprobe = 2)
      .select("n_id").collect().map(_.getLong(0)).toSet
    assert(!hits2.contains(4L) && !hits2.contains(1L))
  }

  test("maybeCompact: the measured trigger holds off below the tombstone " +
    "ratio and fires above it; reads identical either way") {
    val idx = tmp("trigger")
    Dedup.minhashIndexBuild(docs, idx) // 4 docs × 4 bands = 16 base rows
    def live(): Set[Long] =
      Dedup.minhashIndexRows(spark, idx).select("c_id").collect().map(_.getLong(0)).toSet
    // one tombstone over 16 rows = 6% — above the default 1%, so it fires;
    // first verify a high ratio holds off
    Dedup.minhashIndexDelete(Seq(3L).toDF("doc_id"), idx)
    val expected = live()
    assert(!Dedup.minhashIndexMaybeCompact(spark, idx, ratio = 0.5), "6% < 50% must hold off")
    assert(gen(idx) === 1L, "holding off must not bump the generation")
    assert(live() === expected)
    assert(Dedup.minhashIndexMaybeCompact(spark, idx), "6% > 1% must compact")
    assert(gen(idx) === 2L)
    assert(live() === expected)
    assert(!Dedup.minhashIndexMaybeCompact(spark, idx), "nothing pending after the fold")

    val ivfIdx = tmp("trigger-ivf")
    SimilaritySearch.ivfIndexBuild(vecs, ivfIdx, nlist = 2, iters = 1) // 5 base rows
    SimilaritySearch.indexDelete(Seq(4L).toDF("vec_id"), ivfIdx) // 20%
    assert(!SimilaritySearch.ivfIndexMaybeCompact(spark, ivfIdx, ratio = 0.5))
    assert(SimilaritySearch.ivfIndexMaybeCompact(spark, ivfIdx))
    assert(gen(ivfIdx) === 2L)
    assert(!SimilaritySearch.ivfIndexMaybeCompact(spark, ivfIdx))
  }

  test("manifest props round-trip: trained_on survives parse and rides " +
    "advance() across mutations; pre-props manifests read as empty") {
    val idx = tmp("props")
    val layout = IndexManifest.Layouts.ivf
    val s1 = layout.advance(layout.legacyState).withProp("trained_on", "42")
    // data dirs must exist before commit GC runs; stats table not needed here
    new java.io.File(s"$idx/${s1.tables("vectors")}").mkdirs()
    IndexManifest.commit(spark, idx, s1, layout)
    val read1 = IndexManifest.read(spark, idx).get
    assert(read1.props === Map("trained_on" -> "42"))
    assert(RebuildTrigger.trainedOn(read1) === Some(42L))
    // a compaction-style advance carries props unless overwritten
    val s2 = layout.advance(read1, carry = Set("centroids"))
    assert(s2.props === Map("trained_on" -> "42"))
    // a rebuild-style overwrite replaces it
    assert(s2.withProp("trained_on", "99").props("trained_on") === "99")
    // pre-props manifest text (no prop. lines) parses with an empty map
    assert(layout.legacyState.props === Map.empty)
    assert(RebuildTrigger.trainedOn(layout.legacyState) === None)
    assert(!RebuildTrigger.due(None, 1000000L, 0.01), "legacy index never fires")
    assert(RebuildTrigger.due(Some(10L), 16L, 0.5))
    assert(!RebuildTrigger.due(Some(10L), 15L, 0.5))
    assert(RebuildTrigger.due(Some(10L), 4L, 0.5), "shrinkage is drift too")
    assert(RebuildTrigger.due(Some(0L), 1L, 0.5), "empty training set: any data is due")
  }

  test("ivfpq + semantic maybeRebuild: hold off below the growth ratio, " +
    "fire above it, retrained state answers like a fresh build") {
    val pq = tmp("pq-rebuild")
    val evens = vecs.filter(col("vec_id") % 2 === 0)
    SimilaritySearch.ivfPqIndexBuild(evens, pq, nlist = 2, m = 2, dim = 4, pqNlist = 4)
    val g0 = gen(pq)
    SimilaritySearch.ivfPqIndexAppend(vecs.filter(col("vec_id") % 2 === 1), pq)
    assert(!SimilaritySearch.ivfPqIndexMaybeRebuild(
      vecs, pq, nlist = 2, m = 2, dim = 4, pqNlist = 4, ratio = 2.0))
    assert(gen(pq) === g0)
    assert(SimilaritySearch.ivfPqIndexMaybeRebuild(
      vecs, pq, nlist = 2, m = 2, dim = 4, pqNlist = 4, ratio = 0.5))
    assert(gen(pq) === g0 + 1)
    val fresh = tmp("pq-fresh")
    SimilaritySearch.ivfPqIndexBuild(vecs, fresh, nlist = 2, m = 2, dim = 4, pqNlist = 4)
    def top(d: String): Seq[(Long, Long, Long)] =
      SimilaritySearch.ivfPqIndexSearch(spark, d, vecs.filter(col("vec_id") <= 1), 3, nprobe = 2)
        .select("q_id", "n_id", "rank")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(top(pq) === top(fresh), "post-rebuild index must equal a fresh full build")

    // threshold ≈ 1 so the odd arrivals (near-dups of the evens) SURVIVE
    // the append — the trigger measures survivor-set growth
    val sem = tmp("sem-rebuild")
    Dedup.semanticIndexBuild(evens, sem, k = 2, rounds = 1, threshold = 0.9999)
    val sg0 = gen(sem)
    Dedup.semanticIndexAppend(vecs.filter(col("vec_id") % 2 === 1), sem, threshold = 0.9999)
    assert(!Dedup.semanticIndexMaybeRebuild(
      vecs, sem, k = 2, rounds = 1, threshold = 0.9999, ratio = 5.0))
    assert(gen(sem) === sg0)
    assert(Dedup.semanticIndexMaybeRebuild(
      vecs, sem, k = 2, rounds = 1, threshold = 0.9999, ratio = 0.1))
    assert(gen(sem) === sg0 + 1)
    // retrained over the full corpus: survivors equal a fresh build's
    val freshSem = tmp("sem-fresh")
    Dedup.semanticIndexBuild(vecs, freshSem, k = 2, rounds = 1, threshold = 0.9999)
    def surv(d: String): Set[Long] =
      Dedup.semanticIndexSurvivors(spark, d).select("vec_id")
        .collect().map(_.getLong(0)).toSet
    assert(surv(sem) === surv(freshSem))
  }

  test("manifest commit refuses a duplicate generation (single-writer guard)") {
    val idx = tmp("dup")
    Dedup.minhashIndexBuild(docs, idx)
    val layout = IndexManifest.Layouts.minhash
    val st = IndexManifest.resolve(spark, idx, layout)
    val err = intercept[RuntimeException] {
      IndexManifest.commit(spark, idx, st, layout)
    }
    assert(err.getMessage.contains("single-writer"))
  }
}
