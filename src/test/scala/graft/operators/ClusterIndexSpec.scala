package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contract of the persisted duplicate-cluster index: batch-incremental
  * maintenance ([[Dedup.clusterIndexAppend]] contracting only the
  * batch-touched component subgraph) produces EXACTLY the assignments a
  * from-scratch [[Dedup.duplicateClusters]] computes over the unioned
  * pair set — growth, fresh components, and cross-component merges
  * (a member's rep is non-increasing; the merged component takes the
  * global min) — and compaction folds the delta without changing any
  * answer. */
class ClusterIndexSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-clusteridx-$tag").toString

  private def resolved(dir: String): Map[Long, Long] =
    Dedup.clusterIndexAssignments(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def pairsDf(ps: (Long, Long)*) = ps.toDF("a_id", "b_id")

  test("incremental appends equal from-scratch recompute: growth, fresh " +
    "components, cross-component merge to the global min; compaction and " +
    "post-compaction appends preserve the closure") {
    val dir = tmp("walk")
    // base: {1,2,3} (rep 1) and {10,11} (rep 10); 20 unpaired (implicit)
    val base = Seq((1L, 2L), (2L, 3L), (10L, 11L))
    Dedup.clusterIndexBuild(pairsDf(base: _*), dir)
    assert(resolved(dir) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    val g0 = IndexManifest.read(spark, dir).map(_.generation).getOrElse(0L)

    // batch 1: 30 grows component 10; 40–41 form a fresh component
    val b1 = Seq((30L, 11L), (40L, 41L))
    Dedup.clusterIndexAppend(pairsDf(b1: _*), dir)
    assert(resolved(dir) === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 30L -> 10L,
      40L -> 40L, 41L -> 40L))
    assert(IndexManifest.read(spark, dir).map(_.generation).getOrElse(0L) === g0,
      "appends are delta stripes, not manifest commits")

    // batch 2: 50 BRIDGES components 1 and 10 — every member of the losing
    // component relabels to the global min; 40/41 untouched
    val b2 = Seq((50L, 3L), (50L, 11L))
    Dedup.clusterIndexAppend(pairsDf(b2: _*), dir)
    val afterMerge = Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 1L, 11L -> 1L, 30L -> 1L, 50L -> 1L,
      40L -> 40L, 41L -> 40L)
    assert(resolved(dir) === afterMerge)

    // the incremental state IS the from-scratch closure over all pairs
    def fromScratch(ps: Seq[(Long, Long)]): Map[Long, Long] =
      Dedup.duplicateClusters(pairsDf(ps: _*))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(resolved(dir) === fromScratch(base ++ b1 ++ b2))

    // compaction folds the delta into a seq-0 base: answers unchanged,
    // delta segment retired, one manifest commit
    Dedup.clusterIndexCompact(spark, dir)
    assert(resolved(dir) === afterMerge)
    val st = IndexManifest.resolve(spark, dir, IndexManifest.Layouts.clusters)
    assert(st.generation === g0 + 1)
    assert(!new java.io.File(s"$dir/${st.stream}").exists())

    // appends after compaction restart cleanly on the folded base —
    // including a second merge (40's component into 1's via 2–41)
    val b3 = Seq((60L, 41L), (2L, 41L))
    Dedup.clusterIndexAppend(pairsDf(b3: _*), dir)
    assert(resolved(dir) === fromScratch(base ++ b1 ++ b2 ++ b3))
    assert(resolved(dir)(60L) === 1L && resolved(dir)(40L) === 1L)

    // time travel: the pre-compact generation still answers its frozen
    // state (delta stripes land in the LIVE segment — nothing leaks into
    // a frozen prior here); the live pin equals the live read; an
    // expired generation refuses loudly
    def resolvedAsOf(g: Long): Map[Long, Long] =
      Dedup.clusterIndexAssignmentsAsOf(spark, dir, g)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(resolvedAsOf(g0) === afterMerge,
      "the retained prior generation replays its frozen assignments")
    assert(resolvedAsOf(g0 + 1) === resolved(dir))
    val ex = intercept[RuntimeException](resolvedAsOf(g0 - 1))
    assert(ex.getMessage.contains("retains no generation"))
  }

  test("touched-subgraph scoping: an append relabels ONLY docs in touched " +
    "components — the delta stripe holds no rows for untouched components") {
    val dir = tmp("scope")
    Dedup.clusterIndexBuild(pairsDf((1L, 2L), (10L, 11L), (20L, 21L)), dir)
    Dedup.clusterIndexAppend(pairsDf((30L, 11L)), dir)
    val st = IndexManifest.resolve(spark, dir, IndexManifest.Layouts.clusters)
    val delta = spark.read.parquet(s"$dir/${st.stream}")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(delta === Set(10L, 11L, 30L),
      "the arrival's cost surface is the touched component + batch, not the corpus")
    assert(resolved(dir) ===
      Map(1L -> 1L, 2L -> 1L, 10L -> 10L, 11L -> 10L, 30L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("minhash wiring: clusterIndexAppendFromMinhash keeps the two indexes " +
    "in lockstep — arrivals classified by the persisted LSH index land in " +
    "the right clusters, and the state equals a from-scratch closure over " +
    "the index's own candidate pairs") {
    val baseDir = tmp("mh-wire")
    val (mh, ci) = (s"$baseDir/mh", s"$baseDir/ci")
    val base = Seq(
      (1L, "aa bb cc dd"), (2L, "aa bb cc dd"), // dups of each other
      (3L, "zz yy xx ww"), (10L, "mm nn oo pp") // singletons
    ).toDF("doc_id", "text")
    Dedup.minhashIndexBuild(base, mh)
    def candPairs(probe: org.apache.spark.sql.DataFrame) =
      Dedup.minhashIndexCandidates(probe, mh)
        .filter(col("est") >= 0.5)
        .select(col("doc_id").as("a_id"), col("c_id").as("b_id"))
    Dedup.clusterIndexBuild(candPairs(base), ci)
    assert(resolved(ci) === Map(1L -> 1L, 2L -> 1L))
    // arrivals: a dup of 3, a third copy of 1's text, an unrelated doc —
    // minhash append FIRST, then the wired cluster append
    val batch = Seq(
      (4L, "zz yy xx ww"), (5L, "aa bb cc dd"), (6L, "qq rr ss tt")
    ).toDF("doc_id", "text")
    Dedup.minhashIndexAppend(batch, mh)
    Dedup.clusterIndexAppendFromMinhash(batch, mh, ci)
    assert(resolved(ci) === Map(1L -> 1L, 2L -> 1L, 5L -> 1L, 3L -> 3L, 4L -> 3L),
      "paired arrivals join/form clusters; pairless docs stay implicit singletons")
    // from-scratch over the index's own candidate pairs agrees
    val scratch = Dedup.duplicateClusters(candPairs(base.unionByName(batch)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(resolved(ci) === scratch)
    // the one-call loop form: a further arrival through arrivalDedupStep
    // lands in both indexes and returns the BATCH's survivor slice —
    // first-doc-wins across time (7 dups the kept rep 1 and drops; 8 is
    // fresh and survives)
    val batch2 = Seq((7L, "aa bb cc dd"), (8L, "uu vv ww xx")).toDF("doc_id", "text")
    val kept = Dedup.arrivalDedupStep(batch2, mh, ci)
    assert(kept.select("doc_id").collect().map(_.getLong(0)).toSet === Set(8L))
    assert(resolved(ci) ===
      Map(1L -> 1L, 2L -> 1L, 5L -> 1L, 7L -> 1L, 3L -> 3L, 4L -> 3L))
  }

  test("index-backed survivors: dropDuplicateClustersFromIndex equals the " +
    "from-scratch closure drop, serves one anti-join (no CC recompute), " +
    "and the AsOf lane replays a retained generation's survivor corpus") {
    val dir = tmp("survivors")
    val docs = Seq(
      (1L, "a"), (2L, "b"), (3L, "c"), (10L, "d"), (11L, "e"), (20L, "f")
    ).toDF("doc_id", "lang")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L))
    Dedup.clusterIndexBuild(pairsDf(pairs: _*), dir)
    val g0 = IndexManifest.read(spark, dir).map(_.generation).getOrElse(0L)
    val fromIdx = Dedup.dropDuplicateClustersFromIndex(docs, dir)
    assert(fromIdx.select("doc_id").collect().map(_.getLong(0)).toSet ===
      Set(1L, 10L, 20L),
      "representatives survive, members drop, singletons pass through")
    assert(fromIdx.collect().toSet ===
      Dedup.dropDuplicateClusters(docs, pairsDf(pairs: _*)).collect().toSet)
    // plan guard: the read is ONE anti-join over the resolved assignments
    // — no star-contraction loop, no Except-based convergence probes
    val plan = fromIdx.queryExecution.optimizedPlan.toString
    assert(plan.contains("LeftAnti"), s"expected an anti-join read:\n$plan")
    assert(!plan.contains("Except"),
      s"the index-backed read must not re-run the CC fixed point:\n$plan")
    // a later append relabels the live read (20 joins component 1)
    Dedup.clusterIndexAppend(pairsDf((20L, 3L)), dir)
    assert(Dedup.dropDuplicateClustersFromIndex(docs, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet === Set(1L, 10L))
    // freeze g0 (build + its delta stripe) behind a compaction, then merge
    // the components in the NEW generation: the AsOf lane still replays
    // the survivor corpus g0 served at freeze time
    Dedup.clusterIndexCompact(spark, dir)
    Dedup.clusterIndexAppend(pairsDf((10L, 1L)), dir)
    assert(Dedup.dropDuplicateClustersFromIndex(docs, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet === Set(1L))
    assert(Dedup.dropDuplicateClustersFromIndexAsOf(docs, dir, g0)
      .select("doc_id").collect().map(_.getLong(0)).toSet === Set(1L, 10L),
      "the retained generation replays the survivor corpus it served")
  }

  test("bucketed layout: answers identical to the plain layout across the " +
    "whole lifecycle; the layout survives compaction; and the base serves " +
    "a doc_id semi-join with ZERO exchanges on its side (broadcast " +
    "disabled, so the plan can't cheat)") {
    val dir = tmp("bucketed")
    val base = Seq((1L, 2L), (2L, 3L), (10L, 11L))
    Dedup.clusterIndexBuildBucketed(pairsDf(base: _*), dir, buckets = 4)
    assert(resolved(dir) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    // appends and merges behave exactly as on the plain layout
    val b1 = Seq((30L, 11L), (50L, 3L), (50L, 11L))
    Dedup.clusterIndexAppend(pairsDf(b1: _*), dir)
    val expect = Dedup.duplicateClusters(pairsDf(base ++ b1: _*))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(resolved(dir) === expect)
    // the fold rewrites the base BUCKETED (props ride the generation)
    Dedup.clusterIndexCompact(spark, dir)
    assert(resolved(dir) === expect)
    val st = IndexManifest.resolve(spark, dir, IndexManifest.Layouts.clusters)
    assert(st.props.get("bucket_n") === Some("4"))
    // plan guard: the per-doc resolution's base-side probe is
    // exchange-free — only the (batch-bounded) candidate side shuffles
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val Seq(bucketedBase) = Dedup.clustersRawParts(spark, dir, st)
      val candidates = Seq(2L, 30L).toDF("doc_id")
      val probe = bucketedBase.join(candidates, Seq("doc_id"), "left_semi")
      val p = probe.queryExecution.executedPlan.toString
      assert("Exchange (hash|range|Single)".r.findAllIn(p).size === 1,
        s"only the candidate side may shuffle on the bucketed path, plan:\n$p")
      assert(p.contains("SelectedBucketsCount"),
        s"the base side must be a bucketed scan, plan:\n$p")
      assert(probe.collect().map(_.getLong(0)).toSet === Set(2L, 30L))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    // a catalog that has never seen this index (a new JVM's in-memory
    // catalog) re-registers the external table from the manifest props +
    // the existing bucketed files: drop the entry, read again — the read
    // path recreates it and answers unchanged
    spark.sql(s"DROP TABLE IF EXISTS ${Dedup.clusterBucketTableName(dir, st.generation)}")
    assert(resolved(dir) === expect,
      "a fresh catalog re-registers the bucketed base from props + files")
    assert(spark.catalog.tableExists(Dedup.clusterBucketTableName(dir, st.generation)))
    // a PLAIN rebuild of a bucketed index keeps the layout (bucketing is
    // an index property — a plain-written base under a carried bucket_n
    // prop would brick every read with 'Invalid bucket file')
    val rebuilt = Seq((100L, 101L), (101L, 102L))
    Dedup.clusterIndexBuild(pairsDf(rebuilt: _*), dir)
    val st2 = IndexManifest.resolve(spark, dir, IndexManifest.Layouts.clusters)
    assert(st2.props.get("bucket_n") === Some("4"))
    assert(resolved(dir) === Map(100L -> 100L, 101L -> 100L, 102L -> 100L))
    Dedup.clusterIndexAppend(pairsDf((103L, 102L)), dir)
    assert(resolved(dir)(103L) === 100L)
  }

  test("single-writer enforcement: a claimed delta seq makes the next " +
    "append fail loudly instead of writing a conflicting stripe, and " +
    "compaction resets the claim ledger with the generation") {
    val dir = tmp("claims")
    Dedup.clusterIndexBuild(pairsDf((1L, 2L)), dir)
    val st = IndexManifest.resolve(spark, dir, IndexManifest.Layouts.clusters)
    // simulate a racing (or crashed-after-claim) writer: seq 1 pre-claimed
    val delta = new java.io.File(s"$dir/${st.stream}")
    delta.mkdirs()
    assert(new java.io.File(delta, "_claim-seq-000001").createNewFile())
    val ex = intercept[IllegalArgumentException](
      Dedup.clusterIndexAppend(pairsDf((3L, 2L)), dir))
    assert(ex.getMessage.contains("already claimed"))
    assert(resolved(dir) === Map(1L -> 1L, 2L -> 1L),
      "the refused append wrote nothing")
    // the documented recovery: compact -> fresh generation -> clean ledger
    Dedup.clusterIndexCompact(spark, dir)
    Dedup.clusterIndexAppend(pairsDf((3L, 2L)), dir)
    assert(resolved(dir) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("maintenance integration: the sweep compacts a delta-heavy cluster " +
    "index via its trigger and leaves a quiet one untouched; fsck audits it") {
    val dir = tmp("sweep")
    Dedup.clusterIndexBuild(pairsDf((1L, 2L), (3L, 4L), (5L, 6L), (7L, 8L)), dir)
    val quiet = IndexMaintenance.sweep(spark, Seq(IndexMaintenance.ClusterIndex(dir)))
    assert(quiet.head.failed.isEmpty && !quiet.head.compacted && !quiet.head.rebuilt)
    // grow the delta past the ratio: two appends touching everything
    Dedup.clusterIndexAppend(pairsDf((2L, 3L), (6L, 7L)), dir)
    val before = resolved(dir)
    val report = IndexMaintenance.sweep(spark, Seq(IndexMaintenance.ClusterIndex(dir))).head
    assert(report.failed.isEmpty && report.compacted && !report.rebuilt)
    assert(resolved(dir) === before, "the fold changes no answer")
    val audit = IndexMaintenance.fsck(
      spark, Seq(IndexMaintenance.ClusterIndex(dir)), visibility = true).head._2
    assert(audit.ok && !audit.unbuilt)
  }
}
