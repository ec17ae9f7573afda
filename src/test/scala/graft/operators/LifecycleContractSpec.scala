package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Randomized model-based test of the index-lifecycle CONTRACT across
  * ALL SIX persisted families (text, IVF, IVF×PQ, minhash, semantic, and
  * the duplicate-cluster assignment index against a union-find model) —
  * the executable form of the [[Tombstones]] scaladoc, checked against a
  * trivially-correct in-memory model over a random interleaving of every
  * mutation class. The model is deliberately written at the contract
  * level (what a reader may observe), NOT at the mechanism level
  * (segments, generations, scopes), so a mechanism bug cannot hide by
  * being faithfully mirrored:
  *
  *   - `delete(X)`: X invisible from now on — INCLUDING rows appended
  *     later — until a compaction applies it physically (X's rows gone,
  *     tombstone cleared; a FRESH append then serves) or an `upsert(X)`
  *     replaces it (the one sanctioned re-add).
  *   - `append(X, t)`: adds t to X's rows; serves iff X has no pending
  *     tombstone. EXCEPT: an id upserted since the last compaction
  *     refuses LOUDLY ([[Tombstones.requireAppendable]] — its appended
  *     copy would land below the upsert's generation-scoped kill and
  *     silently not serve; the guard turns the one silent outcome into
  *     an error). The random walk asserts the refusal fires exactly for
  *     those ids and changes nothing.
  *   - `upsert(X, t)`: X's rows become exactly {t}; pending tombstone on
  *     X (if any) dropped; X serves.
  *   - `compact`: rows of pending ids removed physically; tombstones
  *     cleared (append-refusals lift); every other answer unchanged.
  *
  * The round-8 takedown-resurrection bug (delete scoped to the live
  * generation + clamp-on-carry: delete(X) → unrelated upsert → append(X)
  * silently served) is exactly a divergence this spec finds mechanically
  * — the directed regression tests in TextIndexSpec /
  * SimilarityAndMultimodalSpec pin that one interleaving; this spec
  * sweeps the neighborhood.
  *
  * Observation channel, text family: every version of every document
  * carries ONE unique token, so a single BM25 search over ALL tokens ever
  * issued checks (a) id-level visibility (the served doc set) and (b)
  * version-level retirement (each doc's `n_hit` = its live version
  * count; a stale un-retired row would inflate it). Minhash family: the
  * live banded row set's distinct `c_id`s. Fixed seeds — reproducible,
  * no flake surface.
  *
  * The walk also probes the SNAPSHOT (AsOf) lanes after every op — the
  * retained prior generation against a spec-side frozen model
  * ([[SnapModel]]: freeze-at-advance plus the documented base-sharing
  * leak of later appends through an upsert's carried base), the
  * live-pinned generation against the live read, and expired
  * generations for the loud refusal — so snapshot×mutation
  * interleavings on all five families have a mechanical finder too. */
class LifecycleContractSpec extends SparkSpec {
  import spark.implicits._

  private val Ids = 0L to 7L

  /** Spec-side model of the retained PRIOR generation's AsOf answer,
    * maintained alongside [[Model]] so the random walk also covers
    * snapshot×mutation interleavings (where a scoping bug in the AsOf
    * lanes would hide). The documented sharing rules, contract-level:
    *
    *   - At each MANIFEST-ADVANCING mutation (upsert, firing compaction)
    *     the outgoing live state freezes: its AsOf answer is the live
    *     visible map captured just before the op (the new kill/fold
    *     commits into the NEXT generation's segments, out of its sight).
    *   - An upsert CARRIES the base segment, so a later batch append
    *     leaks into the frozen snapshot — unless the id was pending at
    *     freeze (the frozen tombstone segment keeps hiding it). A
    *     compaction rewrites the base: nothing leaks.
    *   - Later plain deletes append to the LIVE tombstone segment and
    *     never reach a frozen prior generation (the takedown carve-out
    *     reaches only the generation that is still live — covered by the
    *     live-pinned probe, which must equal the live read).
    *   - Once the manifest advances again, the generation leaves the
    *     retention window and its AsOf probe must error loudly. */
  private final class SnapModel {
    var gen: Long = -1L
    var visible: Map[Long, Set[String]] = Map.empty
    private var sharesBase = false
    private var pendingAtFreeze: Set[Long] = Set.empty
    def freeze(g: Long, vis: Map[Long, Set[String]], shares: Boolean, pending: Set[Long]): Unit = {
      gen = g; visible = vis; sharesBase = shares; pendingAtFreeze = pending
    }
    def leakAppend(id: Long, t: String): Unit =
      if (gen >= 0 && sharesBase && !pendingAtFreeze(id))
        visible = visible.updated(id, visible.getOrElse(id, Set.empty) + t)
    def has: Boolean = gen >= 0
  }

  private def liveGen(idx: String): Long =
    IndexManifest.read(spark, idx).map(_.generation).getOrElse(0L)

  private def assertExpired(probe: Long => Any, gen: Long): Unit =
    if (gen >= 0) {
      val ex = intercept[RuntimeException](probe(gen))
      assert(ex.getMessage.contains("retains no generation"),
        s"an expired generation must refuse loudly, got: ${ex.getMessage}")
    }

  /** Contract-level model state: per-id live version tokens + the
    * pending-takedown set. */
  private final class Model {
    val rows = scala.collection.mutable.Map.empty[Long, Set[String]].withDefaultValue(Set.empty)
    val pending = scala.collection.mutable.Set.empty[Long]
    def build(init: Map[Long, String]): Unit = {
      rows.clear(); pending.clear()
      init.foreach { case (id, t) => rows(id) = Set(t) }
    }
    def append(id: Long, t: String): Unit = rows(id) = rows(id) + t
    def delete(id: Long): Unit = pending += id
    def upsert(id: Long, t: String): Unit = { rows(id) = Set(t); pending -= id }
    def compact(): Unit = { pending.foreach(rows.remove); pending.clear() }
    def visible: Map[Long, Set[String]] =
      rows.toMap.filter { case (id, ts) => ts.nonEmpty && !pending(id) }
  }

  test("text index: random mutation interleavings match the contract model " +
    "(visibility AND version retirement via n_hit)") {
    val idx = java.nio.file.Files.createTempDirectory("graft-contract-text").toString
    val rnd = new Random(20260816L)
    val model = new Model
    var allTokens = Vector.empty[String]
    var nextTok = 0
    def freshTok(): String = { nextTok += 1; val t = s"tk$nextTok"; allTokens :+= t; t }

    val init = (0L to 4L).map(id => id -> freshTok()).toMap
    TextSearchIndex.build(
      init.toSeq.map { case (id, t) => (id, t, "s") }.toDF("doc_id", "text", "source"), idx)
    model.build(init)

    def observed(): Map[Long, Long] =
      TextSearchIndex.search(spark, idx, allTokens, 100)
        .select("doc_id", "n_hit").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def observedAsOf(g: Long): Map[Long, Long] =
      TextSearchIndex.searchAsOf(spark, idx, allTokens, 100, g)
        .select("doc_id", "n_hit").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap

    // ids upserted since the last compaction — exactly the set whose
    // batch appends must refuse loudly (spec-side bookkeeping, not model
    // semantics: the guard's trigger is the carried scoped tombstone)
    val upserted = scala.collection.mutable.Set.empty[Long]
    val snap = new SnapModel
    for (op <- 1 to 36) {
      val id = Ids(rnd.nextInt(Ids.size))
      val (g0, vis0, pend0) = (liveGen(idx), model.visible, model.pending.toSet)
      var shares = false
      rnd.nextInt(10) match {
        case 0 | 1 | 2 =>
          val t = freshTok()
          val batch = Seq((id, t, "s")).toDF("doc_id", "text", "source")
          if (upserted(id)) {
            val ex = intercept[IllegalArgumentException] {
              TextSearchIndex.append(batch, idx)
            }
            assert(ex.getMessage.contains("silently hidden"), s"op #$op")
          } else {
            TextSearchIndex.append(batch, idx)
            model.append(id, t)
            snap.leakAppend(id, t)
          }
        case 3 | 4 =>
          TextSearchIndex.delete(Seq(id).toDF("doc_id"), idx)
          model.delete(id)
        case 5 | 6 | 7 =>
          val t = freshTok()
          TextSearchIndex.upsert(Seq((id, t, "s")).toDF("doc_id", "text", "source"), idx)
          model.upsert(id, t)
          upserted += id
          shares = true // the upsert carries the postings base
        case _ =>
          TextSearchIndex.compact(spark, idx)
          model.compact()
          upserted.clear()
      }
      if (liveGen(idx) != g0) snap.freeze(g0, vis0, shares, pend0)
      val want = model.visible.map { case (k, ts) => k -> ts.size.toLong }
      assert(observed() === want, s"divergence after op #$op (id=$id)")
      // snapshot lanes: the retained prior generation answers its frozen
      // state (plus documented leaks); the live-pinned probe equals the
      // live read; an expired generation refuses loudly
      if (snap.has)
        assert(observedAsOf(snap.gen) ===
          snap.visible.map { case (k, ts) => k -> ts.size.toLong },
          s"snapshot divergence after op #$op (gen=${snap.gen})")
      if (op % 6 == 0) {
        assert(observedAsOf(liveGen(idx)) === want, s"live-pinned AsOf, op #$op")
        assertExpired(observedAsOf, (if (snap.has) snap.gen else liveGen(idx)) - 1)
      }
    }
  }

  test("ivf index: random mutation interleavings match the contract model " +
    "(id-level visibility via an all-cells corpus-sized search)") {
    val idx = java.nio.file.Files.createTempDirectory("graft-contract-ivf").toString
    val rnd = new Random(4242L)
    val model = new Model
    var nextV = 0
    // distinct deterministic 4-d vectors; versions differ in the last dim
    def freshVec(id: Long): Array[Float] = {
      nextV += 1
      Array(1.0f + id, 2.0f + (id % 3), 3.0f, 0.25f * nextV)
    }
    def df(rows: Seq[(Long, Array[Float])]) = rows.toDF("vec_id", "embedding")

    val init = (0L to 4L).map(id => id -> freshVec(id))
    SimilaritySearch.ivfIndexBuild(df(init), idx, nlist = 2, iters = 1)
    model.build(init.map { case (id, _) => id -> "v" }.toMap)

    val probe = df(Seq(99L -> Array(1.0f, 1.0f, 1.0f, 1.0f)))
    def observed(): Set[Long] =
      SimilaritySearch.ivfIndexSearch(spark, idx, probe, 1000, nprobe = 2)
        .select("n_id").collect().map(_.getLong(0)).toSet
    def observedAsOf(g: Long): Set[Long] =
      SimilaritySearch.ivfIndexSearchAsOf(spark, idx, probe, 1000, g, nprobe = 2)
        .select("n_id").collect().map(_.getLong(0)).toSet

    val upserted = scala.collection.mutable.Set.empty[Long]
    val snap = new SnapModel
    for (op <- 1 to 30) {
      val id = Ids(rnd.nextInt(Ids.size))
      val (g0, vis0, pend0) = (liveGen(idx), model.visible, model.pending.toSet)
      var shares = false
      rnd.nextInt(10) match {
        case 0 | 1 | 2 =>
          val batch = df(Seq(id -> freshVec(id)))
          if (upserted(id)) {
            val ex = intercept[IllegalArgumentException] {
              SimilaritySearch.ivfIndexAppend(batch, idx)
            }
            assert(ex.getMessage.contains("silently hidden"), s"op #$op")
          } else {
            SimilaritySearch.ivfIndexAppend(batch, idx)
            model.append(id, "v")
            snap.leakAppend(id, "v")
          }
        case 3 | 4 =>
          SimilaritySearch.indexDelete(Seq(id).toDF("vec_id"), idx)
          model.delete(id)
        case 5 | 6 | 7 =>
          SimilaritySearch.ivfIndexUpsert(df(Seq(id -> freshVec(id))), idx)
          model.upsert(id, "v")
          upserted += id
          shares = true // the upsert carries the vectors base
        case _ =>
          SimilaritySearch.ivfIndexCompact(spark, idx)
          model.compact()
          upserted.clear()
      }
      if (liveGen(idx) != g0) snap.freeze(g0, vis0, shares, pend0)
      assert(observed() === model.visible.keySet,
        s"divergence after op #$op (id=$id)")
      if (snap.has)
        assert(observedAsOf(snap.gen) === snap.visible.keySet,
          s"snapshot divergence after op #$op (gen=${snap.gen})")
      if (op % 6 == 0) {
        assert(observedAsOf(liveGen(idx)) === model.visible.keySet, s"live-pinned AsOf, op #$op")
        assertExpired(observedAsOf, (if (snap.has) snap.gen else liveGen(idx)) - 1)
      }
    }
  }

  test("ivfpq index: random mutation interleavings match the contract model " +
    "(the composed family's carry code under the same sweep)") {
    val idx = java.nio.file.Files.createTempDirectory("graft-contract-ivfpq").toString
    val rnd = new Random(777L)
    val model = new Model
    // random 4-d directions: no two versions near-parallel, all distinct
    def freshVec(): Array[Float] = Array.fill(4)(rnd.nextFloat() * 2 - 1)
    def df(rows: Seq[(Long, Array[Float])]) = rows.toDF("vec_id", "embedding")

    val init = (0L to 4L).map(id => id -> freshVec())
    SimilaritySearch.ivfPqIndexBuild(
      df(init), idx, nlist = 2, iters = 1, m = 2, dim = 4, pqNlist = 2, pqIters = 1)
    model.build(init.map { case (id, _) => id -> "v" }.toMap)

    val probe = df(Seq(99L -> Array(0.5f, 0.5f, 0.5f, 0.5f)))
    def observed(): Set[Long] =
      SimilaritySearch.ivfPqIndexSearch(spark, idx, probe, 1000, nprobe = 2,
        rerank = 1000000)
        .select("n_id").collect().map(_.getLong(0)).toSet
    def observedAsOf(g: Long): Set[Long] =
      SimilaritySearch.ivfPqIndexSearchAsOf(spark, idx, probe, 1000, g, nprobe = 2,
        rerank = 1000000)
        .select("n_id").collect().map(_.getLong(0)).toSet

    val upserted = scala.collection.mutable.Set.empty[Long]
    val snap = new SnapModel
    for (op <- 1 to 30) {
      val id = Ids(rnd.nextInt(Ids.size))
      val (g0, vis0, pend0) = (liveGen(idx), model.visible, model.pending.toSet)
      var shares = false
      rnd.nextInt(10) match {
        case 0 | 1 | 2 =>
          val batch = df(Seq(id -> freshVec()))
          if (upserted(id)) {
            val ex = intercept[IllegalArgumentException] {
              SimilaritySearch.ivfPqIndexAppend(batch, idx)
            }
            assert(ex.getMessage.contains("silently hidden"), s"op #$op")
          } else {
            SimilaritySearch.ivfPqIndexAppend(batch, idx)
            model.append(id, "v")
            snap.leakAppend(id, "v")
          }
        case 3 | 4 =>
          SimilaritySearch.indexDelete(Seq(id).toDF("vec_id"), idx)
          model.delete(id)
        case 5 | 6 | 7 =>
          SimilaritySearch.ivfPqIndexUpsert(df(Seq(id -> freshVec())), idx)
          model.upsert(id, "v")
          upserted += id
          shares = true // the upsert carries the codes+vectors base
        case _ =>
          SimilaritySearch.ivfPqIndexCompact(spark, idx)
          model.compact()
          upserted.clear()
      }
      if (liveGen(idx) != g0) snap.freeze(g0, vis0, shares, pend0)
      assert(observed() === model.visible.keySet,
        s"divergence after op #$op (id=$id)")
      if (snap.has)
        assert(observedAsOf(snap.gen) === snap.visible.keySet,
          s"snapshot divergence after op #$op (gen=${snap.gen})")
      if (op % 6 == 0) {
        assert(observedAsOf(liveGen(idx)) === model.visible.keySet, s"live-pinned AsOf, op #$op")
        assertExpired(observedAsOf, (if (snap.has) snap.gen else liveGen(idx)) - 1)
      }
    }
  }

  test("semantic index: random append/delete/compact interleavings match the " +
    "contract model (the upsert-less family; appends dedup vs LIVE survivors)") {
    val idx = java.nio.file.Files.createTempDirectory("graft-contract-sem").toString
    val rnd = new Random(31337L)
    val model = new Model
    // random directions + threshold 0.9999: nothing ever dedups, so the
    // survivor set reduces to the shared visibility model
    def freshVec(): Array[Float] = Array.fill(4)(rnd.nextFloat() * 2 - 1)
    def df(rows: Seq[(Long, Array[Float])]) = rows.toDF("vec_id", "embedding")

    val init = (0L to 4L).map(id => id -> freshVec())
    Dedup.semanticIndexBuild(df(init), idx, k = 2, rounds = 1, threshold = 0.9999)
    model.build(init.map { case (id, _) => id -> "v" }.toMap)

    def observed(): Set[Long] =
      Dedup.semanticIndexSurvivors(spark, idx)
        .select("vec_id").distinct().collect().map(_.getLong(0)).toSet
    def observedAsOf(g: Long): Set[Long] =
      Dedup.semanticIndexSurvivorsAsOf(spark, idx, g)
        .select("vec_id").distinct().collect().map(_.getLong(0)).toSet

    val snap = new SnapModel
    for (op <- 1 to 24) {
      val id = Ids(rnd.nextInt(Ids.size))
      val (g0, vis0, pend0) = (liveGen(idx), model.visible, model.pending.toSet)
      rnd.nextInt(10) match {
        case 0 | 1 | 2 | 3 =>
          Dedup.semanticIndexAppend(df(Seq(id -> freshVec())), idx, threshold = 0.9999)
          model.append(id, "v")
        case 4 | 5 | 6 =>
          Dedup.semanticIndexDelete(Seq(id).toDF("vec_id"), idx)
          model.delete(id)
        case _ =>
          Dedup.semanticIndexCompact(spark, idx)
          model.compact()
      }
      // the upsert-less family: only a firing compaction advances, and a
      // compaction rewrites the survivor base — frozen snapshots never leak
      if (liveGen(idx) != g0) snap.freeze(g0, vis0, shares = false, pend0)
      assert(observed() === model.visible.keySet,
        s"divergence after op #$op (id=$id)")
      if (snap.has)
        assert(observedAsOf(snap.gen) === snap.visible.keySet,
          s"snapshot divergence after op #$op (gen=${snap.gen})")
      if (op % 6 == 0) {
        assert(observedAsOf(liveGen(idx)) === model.visible.keySet, s"live-pinned AsOf, op #$op")
        assertExpired(observedAsOf, (if (snap.has) snap.gen else liveGen(idx)) - 1)
      }
    }
  }

  test("cluster index: random pair-append/compact interleavings match a " +
    "union-find model — including direct old↔old merges — with snapshot " +
    "probes on the retained prior generation") {
    clusterWalk(bucketed = false, seed = 55701L)
  }

  test("cluster index, BUCKETED layout: the same random walk against the " +
    "same union-find model — appends, folds (which rewrite the base " +
    "bucketed), and snapshot probes are layout-invariant") {
    clusterWalk(bucketed = true, seed = 77313L)
  }

  private def clusterWalk(bucketed: Boolean, seed: Long): Unit = {
    val idx = java.nio.file.Files.createTempDirectory("graft-contract-ci").toString
    val rnd = new Random(seed)
    // trivially-correct model: union-find with min-id representatives
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: Long, b: Long): Unit = {
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    def modelAssignments: Map[Long, Long] =
      parent.keys.map(id => id -> find(id)).toMap

    def randomPairs(n: Int): Seq[(Long, Long)] =
      Seq.fill(n) {
        val a = rnd.nextInt(24).toLong
        var b = rnd.nextInt(24).toLong
        while (b == a) b = rnd.nextInt(24).toLong
        (a, b)
      }

    val init = randomPairs(4)
    if (bucketed) Dedup.clusterIndexBuildBucketed(init.toDF("a_id", "b_id"), idx, buckets = 4)
    else Dedup.clusterIndexBuild(init.toDF("a_id", "b_id"), idx)
    init.foreach { case (a, b) => union(a, b) }

    def observed(): Map[Long, Long] =
      Dedup.clusterIndexAssignments(spark, idx)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def observedAsOf(g: Long): Map[Long, Long] =
      Dedup.clusterIndexAssignmentsAsOf(spark, idx, g)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // frozen prior snapshot: delta stripes land in the LIVE generation's
    // segment and this family writes no tombstones, so a frozen prior
    // generation NEVER changes (no leak rule, no carve-out)
    var snapGen = -1L
    var snapVisible = Map.empty[Long, Long]
    for (op <- 1 to 18) {
      val g0 = liveGen(idx)
      val vis0 = modelAssignments
      if (rnd.nextInt(10) < 7) {
        // appends may merge two OLD components directly (no batch-ness
        // required): the operator treats every pair endpoint as a partner
        val ps = randomPairs(1 + rnd.nextInt(3))
        Dedup.clusterIndexAppend(ps.toDF("a_id", "b_id"), idx)
        ps.foreach { case (a, b) => union(a, b) }
      } else {
        Dedup.clusterIndexCompact(spark, idx)
      }
      if (liveGen(idx) != g0) { snapGen = g0; snapVisible = vis0 }
      assert(observed() === modelAssignments, s"divergence after op #$op")
      if (snapGen >= 0)
        assert(observedAsOf(snapGen) === snapVisible,
          s"snapshot divergence after op #$op (gen=$snapGen)")
      if (op % 6 == 0) {
        assert(observedAsOf(liveGen(idx)) === modelAssignments, s"live-pinned AsOf, op #$op")
        assertExpired(observedAsOf, (if (snapGen >= 0) snapGen else liveGen(idx)) - 1)
      }
    }
  }

  test("minhash index: random mutation interleavings match the contract model " +
    "(id-level visibility of the banded rows)") {
    val idx = java.nio.file.Files.createTempDirectory("graft-contract-mh").toString
    val rnd = new Random(971L)
    val model = new Model
    var nextTxt = 0
    // >= 3 tokens so every version shingles; all tokens version-unique
    def freshText(): String = { nextTxt += 1; s"w$nextTxt x$nextTxt y$nextTxt z$nextTxt" }

    val init = (0L to 4L).map(id => id -> freshText()).toMap
    Dedup.minhashIndexBuild(init.toSeq.toDF("doc_id", "text"), idx)
    // model tokens ARE the version texts here, so the AsOf probe below can
    // check VERSION-level visibility (each version's banded rows), not
    // just id presence
    model.build(init)
    var allVersions: Vector[(Long, String)] = init.toVector

    def observed(): Set[Long] =
      Dedup.minhashIndexRows(spark, idx)
        .select("c_id").distinct().collect().map(_.getLong(0)).toSet
    // version-level snapshot observation through the public AsOf lane:
    // probe every version text ever issued — a version is visible at the
    // pinned generation iff its probe collides with its own id at full
    // signature equality (est = 1.0; texts are version-unique, so no
    // cross-version full-signature collisions exist)
    def observedAsOf(g: Long): Set[(Long, String)] = {
      val probe = allVersions.zipWithIndex
        .map { case ((_, t), k) => (1000L + k, t) }.toDF("doc_id", "text")
      val hits = Dedup.minhashIndexCandidatesAsOf(probe, idx, g)
        .filter(col("est") === 1.0)
        .select("doc_id", "c_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      allVersions.zipWithIndex.collect {
        case ((vid, t), k) if hits((1000L + k, vid)) => (vid, t)
      }.toSet
    }
    def versionsOf(vis: Map[Long, Set[String]]): Set[(Long, String)] =
      vis.toSeq.flatMap { case (vid, ts) => ts.map(t => (vid, t)) }.toSet

    val upserted = scala.collection.mutable.Set.empty[Long]
    val snap = new SnapModel
    for (op <- 1 to 36) {
      val id = Ids(rnd.nextInt(Ids.size))
      val (g0, vis0, pend0) = (liveGen(idx), model.visible, model.pending.toSet)
      var shares = false
      rnd.nextInt(10) match {
        case 0 | 1 | 2 =>
          val t = freshText()
          val batch = Seq((id, t)).toDF("doc_id", "text")
          if (upserted(id)) {
            val ex = intercept[IllegalArgumentException] {
              Dedup.minhashIndexAppend(batch, idx)
            }
            assert(ex.getMessage.contains("silently hidden"), s"op #$op")
          } else {
            Dedup.minhashIndexAppend(batch, idx)
            model.append(id, t)
            snap.leakAppend(id, t)
            allVersions :+= (id -> t)
          }
        case 3 | 4 =>
          Dedup.minhashIndexDelete(Seq(id).toDF("doc_id"), idx)
          model.delete(id)
        case 5 | 6 | 7 =>
          val t = freshText()
          Dedup.minhashIndexUpsert(Seq((id, t)).toDF("doc_id", "text"), idx)
          model.upsert(id, t)
          upserted += id
          allVersions :+= (id -> t)
          shares = true // the upsert carries the banded base
        case _ =>
          Dedup.minhashIndexCompact(spark, idx)
          model.compact()
          upserted.clear()
      }
      if (liveGen(idx) != g0) snap.freeze(g0, vis0, shares, pend0)
      assert(observed() === model.visible.keySet,
        s"divergence after op #$op (id=$id)")
      if (snap.has)
        assert(observedAsOf(snap.gen) === versionsOf(snap.visible),
          s"snapshot divergence after op #$op (gen=${snap.gen})")
      if (op % 6 == 0) {
        assert(observedAsOf(liveGen(idx)) === versionsOf(model.visible),
          s"live-pinned AsOf, op #$op")
        assertExpired(observedAsOf, (if (snap.has) snap.gen else liveGen(idx)) - 1)
      }
    }
  }
}
