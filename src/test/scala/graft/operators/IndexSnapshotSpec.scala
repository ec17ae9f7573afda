package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Snapshot (time-travel) contract of the [[IndexManifest]] retention
  * window: the outgoing generation's manifest AND segment dirs survive
  * exactly [[IndexManifest.RetainedPriorGenerations]] further commits, so
  * a pinned [[TextSearchIndex.searchAsOf]] reproduces the old ranking
  * after a rebuild, an in-flight reader that resolved its state just
  * before a concurrent compaction keeps scanning real files, and an
  * EXPIRED generation fails loudly instead of answering from the wrong
  * state. */
class IndexSnapshotSpec extends SparkSpec {
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
    java.nio.file.Files.createTempDirectory(s"graft-snapshot-$tag").toString

  private val terms = Seq("vector", "stream", "filter")

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Double, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq

  test("searchAsOf reproduces the pre-rebuild ranking; live search moves on") {
    val idx = tmp("text")
    val even = docs.filter(col("doc_id") % 2 === 0)
    TextSearchIndex.build(even, idx)
    val g1 = IndexManifest.read(spark, idx).get.generation
    val before = rows(TextSearchIndex.search(spark, idx, terms, 10))
    TextSearchIndex.build(docs, idx) // rebuild: new corpus AND new frozen stats
    assert(rows(TextSearchIndex.searchAsOf(spark, idx, terms, 10, g1)) === before,
      "the pinned generation must serve its own postings and frozen stats")
    val fresh = tmp("text-fresh")
    TextSearchIndex.build(docs, fresh)
    assert(rows(TextSearchIndex.search(spark, idx, terms, 10)) ===
      rows(TextSearchIndex.search(spark, fresh, terms, 10)),
      "the live search answers under the rebuilt full-corpus state")
    assert(IndexManifest.snapshots(spark, idx) === Seq(g1, g1 + 1))
  }

  test("a snapshot pins pending tombstones too: asOf before a compaction " +
    "sees the delete logically, not physically") {
    val idx = tmp("text-del")
    TextSearchIndex.build(docs, idx)
    TextSearchIndex.delete(Seq(4L).toDF("doc_id"), idx)
    val g1 = IndexManifest.read(spark, idx).get.generation
    val withPending = rows(TextSearchIndex.search(spark, idx, terms, 10))
    assert(!withPending.exists(_._2 == 4L))
    TextSearchIndex.compact(spark, idx) // applies the tombstone physically
    assert(rows(TextSearchIndex.searchAsOf(spark, idx, terms, 10, g1)) === withPending,
      "the old generation still anti-joins its own tombstone segment")
    assert(rows(TextSearchIndex.search(spark, idx, terms, 10)) === withPending,
      "compaction changes no answers")
  }

  test("an expired generation errors loudly and names the retained window") {
    val idx = tmp("text-exp")
    TextSearchIndex.build(docs.filter(col("doc_id") % 2 === 0), idx)
    val g1 = IndexManifest.read(spark, idx).get.generation
    TextSearchIndex.build(docs.filter(col("doc_id") % 3 === 0), idx)
    TextSearchIndex.build(docs, idx) // g1 now outside the retention window
    val err = intercept[RuntimeException] {
      TextSearchIndex.searchAsOf(spark, idx, terms, 10, g1)
    }
    assert(err.getMessage.contains("retains no generation"))
    assert(err.getMessage.contains(s"${g1 + 1},${g1 + 2}"),
      "the error must list what IS retained")
    assert(IndexManifest.readAt(spark, idx, g1).isEmpty)
  }

  test("vector-lane searchAsOf: an upsert moves the live index, the prior " +
    "generation still serves the old ranking (model + segments + " +
    "tombstones), expiry errors loudly — both IVF and IVF×PQ") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 4)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
      df.select("q_id", "n_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val wave1 = emb.filter(col("vec_id") % 10 === 3)
      .withColumn("embedding", transform(col("embedding"), x => -x))
    val wave2 = emb.filter(col("vec_id") % 10 === 6)
      .withColumn("embedding", transform(col("embedding"), x => -x))
    for (pq <- Seq(false, true)) {
      val idx = tmp(s"vec-asof-pq$pq")
      if (pq) SimilaritySearch.ivfPqIndexBuild(emb, idx, nlist = 4, iters = 2)
      else SimilaritySearch.ivfIndexBuild(emb, idx, nlist = 4, iters = 2)
      def live() = pairs(
        if (pq) SimilaritySearch.ivfPqIndexSearch(spark, idx, q, 5, nprobe = 4,
          rerank = 1000000)
        else SimilaritySearch.ivfIndexSearch(spark, idx, q, 5, nprobe = 4))
      def asOf(g: Long) = pairs(
        if (pq) SimilaritySearch.ivfPqIndexSearchAsOf(spark, idx, q, 5, g, nprobe = 4,
          rerank = 1000000)
        else SimilaritySearch.ivfIndexSearchAsOf(spark, idx, q, 5, g, nprobe = 4))
      val g1 = IndexManifest.read(spark, idx).get.generation
      val pre = live()
      if (pq) SimilaritySearch.ivfPqIndexUpsert(wave1, idx)
      else SimilaritySearch.ivfIndexUpsert(wave1, idx)
      val mid = live()
      assert(mid !== pre, s"pq=$pq: the negated wave must move the ranking")
      assert(asOf(g1) === pre, s"pq=$pq: the prior generation still serves")
      if (pq) SimilaritySearch.ivfPqIndexUpsert(wave2, idx)
      else SimilaritySearch.ivfIndexUpsert(wave2, idx)
      assert(asOf(g1 + 1) === mid, s"pq=$pq: the retained predecessor serves")
      val e = intercept[RuntimeException](asOf(g1))
      assert(e.getMessage.contains("retains no generation"), s"pq=$pq: $e")
    }
  }

  test("dedup-family AsOf: minhashIndexCandidatesAsOf replays a pre-upsert " +
    "generation's candidate set; expiry errors loudly") {
    val idx = tmp("mh-asof")
    Dedup.minhashIndexBuild(docs, idx)
    val g0 = IndexManifest.read(spark, idx).get.generation
    // probe: a new doc with doc 0's exact text — at g0 it near-dups doc 0
    val probe = Seq((100L, base)).toDF("doc_id", "text")
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("doc_id", "c_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val atG0 = pairs(Dedup.minhashIndexCandidates(probe, idx))
    assert(atG0.contains((100L, 0L)), "sanity: the probe collides with doc 0 at g0")
    // re-crawl replaces doc 0's text: the live candidate set moves on
    Dedup.minhashIndexUpsert(
      Seq((0L, "a thoroughly rewritten document about engines and turbines"))
        .toDF("doc_id", "text"), idx)
    assert(!pairs(Dedup.minhashIndexCandidates(probe, idx)).contains((100L, 0L)))
    // ...but the reproducibility audit replays g0 exactly — its segments,
    // its banding, its (then-empty) tombstones
    assert(pairs(Dedup.minhashIndexCandidatesAsOf(probe, idx, g0)) === atG0)
    // one more mutation pushes g0 out of the retention window
    Dedup.minhashIndexUpsert(
      Seq((1L, "another fully different replacement text body")).toDF("doc_id", "text"), idx)
    val err = intercept[RuntimeException] {
      Dedup.minhashIndexCandidatesAsOf(probe, idx, g0).collect()
    }
    assert(err.getMessage.contains(s"generation-$g0"))
  }

  test("dedup-family AsOf: semanticIndexSurvivorsAsOf reproduces the survivor " +
    "set a pre-rebuild generation served") {
    val idx = tmp("sem-asof")
    // near-orthogonal vectors at threshold 0.9999: everything survives
    Dedup.semanticIndexBuild(
      vecs.filter(col("vec_id") < 3), idx, k = 2, rounds = 1, threshold = 0.9999)
    val g0 = IndexManifest.read(spark, idx).get.generation
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("vec_id").collect().map(_.getLong(0)).toSet
    val atG0 = ids(Dedup.semanticIndexSurvivors(spark, idx))
    assert(atG0 === Set(0L, 1L, 2L))
    // a rebuild over the larger corpus commits the next generation with a
    // different (history-dependent) survivor set
    Dedup.semanticIndexBuild(vecs, idx, k = 2, rounds = 1, threshold = 0.9999)
    assert(ids(Dedup.semanticIndexSurvivors(spark, idx)) === Set(0L, 1L, 2L, 3L, 4L))
    assert(ids(Dedup.semanticIndexSurvivorsAsOf(spark, idx, g0)) === atG0,
      "the audit lane answers from the pinned generation's segments")
    // pinned tombstones ride along: a delete into the LIVE segment of a
    // still-retained generation is visible to its snapshot (segment
    // state, not wall-clock, is what a generation pins)
    Dedup.semanticIndexDelete(Seq(2L).toDF("vec_id"), idx)
    assert(ids(Dedup.semanticIndexSurvivorsAsOf(
      spark, idx, IndexManifest.read(spark, idx).get.generation)) === Set(0L, 1L, 3L, 4L))
  }

  test("family-agnostic: a reader's resolved state survives one concurrent " +
    "compaction (segments intact), expires after two") {
    val idx = tmp("ivf")
    SimilaritySearch.ivfIndexBuild(vecs, idx, nlist = 2, iters = 1)
    val layout = IndexManifest.Layouts.ivf
    val pinned = IndexManifest.resolve(spark, idx, layout) // the in-flight reader
    val pinnedRows = spark.read.parquet(pinned.tableDir(idx, "vectors")).count()
    // concurrent mutation: delete + compact commits the next generation
    SimilaritySearch.indexDelete(Seq(4L).toDF("vec_id"), idx)
    SimilaritySearch.ivfIndexCompact(spark, idx)
    assert(spark.read.parquet(pinned.tableDir(idx, "vectors")).count() === pinnedRows,
      "the reader's files must still exist after the commit's GC")
    // a second mutation pushes the pinned generation out of the window
    SimilaritySearch.indexDelete(Seq(3L).toDF("vec_id"), idx)
    SimilaritySearch.ivfIndexCompact(spark, idx)
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(!fs.exists(new org.apache.hadoop.fs.Path(pinned.tableDir(idx, "vectors"))),
      "segments leave disk only when their generation leaves the retention window")
  }
}
