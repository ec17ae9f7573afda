package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Randomized model-based test of the index-lifecycle CONTRACT across
  * ALL FIVE persisted families (text, IVF, IVF×PQ, minhash, semantic) —
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
  * no flake surface. */
class LifecycleContractSpec extends SparkSpec {
  import spark.implicits._

  private val Ids = 0L to 7L

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

    // ids upserted since the last compaction — exactly the set whose
    // batch appends must refuse loudly (spec-side bookkeeping, not model
    // semantics: the guard's trigger is the carried scoped tombstone)
    val upserted = scala.collection.mutable.Set.empty[Long]
    for (op <- 1 to 36) {
      val id = Ids(rnd.nextInt(Ids.size))
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
          }
        case 3 | 4 =>
          TextSearchIndex.delete(Seq(id).toDF("doc_id"), idx)
          model.delete(id)
        case 5 | 6 | 7 =>
          val t = freshTok()
          TextSearchIndex.upsert(Seq((id, t, "s")).toDF("doc_id", "text", "source"), idx)
          model.upsert(id, t)
          upserted += id
        case _ =>
          TextSearchIndex.compact(spark, idx)
          model.compact()
          upserted.clear()
      }
      val want = model.visible.map { case (k, ts) => k -> ts.size.toLong }
      assert(observed() === want, s"divergence after op #$op (id=$id)")
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

    val upserted = scala.collection.mutable.Set.empty[Long]
    for (op <- 1 to 30) {
      val id = Ids(rnd.nextInt(Ids.size))
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
          }
        case 3 | 4 =>
          SimilaritySearch.indexDelete(Seq(id).toDF("vec_id"), idx)
          model.delete(id)
        case 5 | 6 | 7 =>
          SimilaritySearch.ivfIndexUpsert(df(Seq(id -> freshVec(id))), idx)
          model.upsert(id, "v")
          upserted += id
        case _ =>
          SimilaritySearch.ivfIndexCompact(spark, idx)
          model.compact()
          upserted.clear()
      }
      assert(observed() === model.visible.keySet,
        s"divergence after op #$op (id=$id)")
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

    val upserted = scala.collection.mutable.Set.empty[Long]
    for (op <- 1 to 30) {
      val id = Ids(rnd.nextInt(Ids.size))
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
          }
        case 3 | 4 =>
          SimilaritySearch.indexDelete(Seq(id).toDF("vec_id"), idx)
          model.delete(id)
        case 5 | 6 | 7 =>
          SimilaritySearch.ivfPqIndexUpsert(df(Seq(id -> freshVec())), idx)
          model.upsert(id, "v")
          upserted += id
        case _ =>
          SimilaritySearch.ivfPqIndexCompact(spark, idx)
          model.compact()
          upserted.clear()
      }
      assert(observed() === model.visible.keySet,
        s"divergence after op #$op (id=$id)")
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

    for (op <- 1 to 24) {
      val id = Ids(rnd.nextInt(Ids.size))
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
      assert(observed() === model.visible.keySet,
        s"divergence after op #$op (id=$id)")
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
    model.build(init)

    def observed(): Set[Long] =
      Dedup.minhashIndexRows(spark, idx)
        .select("c_id").distinct().collect().map(_.getLong(0)).toSet

    val upserted = scala.collection.mutable.Set.empty[Long]
    for (op <- 1 to 36) {
      val id = Ids(rnd.nextInt(Ids.size))
      rnd.nextInt(10) match {
        case 0 | 1 | 2 =>
          val batch = Seq((id, freshText())).toDF("doc_id", "text")
          if (upserted(id)) {
            val ex = intercept[IllegalArgumentException] {
              Dedup.minhashIndexAppend(batch, idx)
            }
            assert(ex.getMessage.contains("silently hidden"), s"op #$op")
          } else {
            Dedup.minhashIndexAppend(batch, idx)
            model.append(id, "v")
          }
        case 3 | 4 =>
          Dedup.minhashIndexDelete(Seq(id).toDF("doc_id"), idx)
          model.delete(id)
        case 5 | 6 | 7 =>
          Dedup.minhashIndexUpsert(Seq((id, freshText())).toDF("doc_id", "text"), idx)
          model.upsert(id, "v")
          upserted += id
        case _ =>
          Dedup.minhashIndexCompact(spark, idx)
          model.compact()
          upserted.clear()
      }
      assert(observed() === model.visible.keySet,
        s"divergence after op #$op (id=$id)")
    }
  }
}
