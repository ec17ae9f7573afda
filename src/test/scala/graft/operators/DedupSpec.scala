package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  // Physical-state assertions resolve segment dirs through the live
  // manifest — the generation-suffixed layout moves on every build/compact.
  private def mhDir(idx: String, t: String): String =
    IndexManifest.liveTableDir(spark, idx, IndexManifest.Layouts.minhash, t)
  private def semDir(idx: String, t: String): String =
    IndexManifest.liveTableDir(spark, idx, IndexManifest.Layouts.semantic, t)
  private def liveStream(idx: String, layout: IndexManifest.Layout): String =
    IndexManifest.resolve(spark, idx, layout).streamDir(idx)
  private def liveTombs(idx: String): String =
    s"$idx/${IndexManifest.liveTombstones(spark, idx)}"
  private def dirExists(p: String): Boolean = new java.io.File(p).exists()

  private val base =
    "the quick brown fox jumps over the lazy dog and runs far away into the woods tonight"

  private def docs = Seq(
    (0L, base),
    (1L, base + " extra"), // near-dup of 0 (shares prefix + most shingles)
    (2L, "completely different content about spark query engines and columnar execution plans"),
    (3L, "  " + base.toUpperCase.toLowerCase + "  "), // exact dup of 0 after normalization
    (4L, "short text")
  ).toDF("doc_id", "text")

  test("exact dedup: normalized duplicates collapse, keeper = min id") {
    val out = Dedup.exact(docs).collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    // doc 3 normalizes to doc 0's text -> one group of 2 kept by id 0
    assert(out.contains((0L, 2L)))
    assert(Dedup.exact(docs).count() === 4) // 5 docs, one merged pair
  }

  test("exactKeepLongest: fullest copy survives, ties break to lowest id") {
    val d = Seq(
      (0L, base, 10L),
      (3L, base, 25L), // same fingerprint, longest -> keeper
      (5L, base, 25L), // ties doc 3 on length -> lower id wins
      (2L, "unique text", 6L)
    ).toDF("doc_id", "text", "n_chars")
    val out = Dedup
      .exactKeepLongest(d)
      .collect()
      .map(r => r.getAs[Long]("keep_id") -> ((r.getAs[Long]("n_members"), r.getAs[Long]("max_chars"))))
      .toMap
    assert(out === Map(3L -> ((3L, 25L)), 2L -> ((1L, 6L))))
  }

  test("ngram jaccard pairs: finds the prefix-blocked near-dup with high jac") {
    val pairs = Dedup.ngramJaccardPairs(docs, 0.3).collect()
    val ids = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ids.contains((0L, 1L)))
    assert(ids.contains((0L, 3L)))
    val jac01 = pairs.find(r => r.getLong(0) == 0L && r.getLong(1) == 1L).get.getAs[Double]("jac")
    assert(jac01 > 0.8 && jac01 < 1.0)
  }

  test("crossSourceDupMatrix: pair cells keyed by normalized source pair") {
    // docs 0/1/3 are mutual near-dups; give 0,1 source sB and 3 source sA:
    // pairs (0,1) -> (sB,sB); (0,3),(1,3) -> (sA,sB) after least/greatest.
    val withSrc = docs.withColumn(
      "source",
      when(col("doc_id") === 3L, lit("sA")).otherwise(lit("sB")))
    val cells = Dedup
      .crossSourceDupMatrix(withSrc, 0.3)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(cells(("sB", "sB")) === 1L)
    assert(cells(("sA", "sB")) === 2L)
  }

  test("minhash LSH pairs: near-dups surface, distinct docs do not") {
    val pairs = Dedup.minhashLshPairs(docs, 0.5)
    val ids = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ids.contains((0L, 1L)))
    assert(ids.contains((0L, 3L)))
    assert(!ids.exists { case (a, b) => a == 2L || b == 2L }) // unrelated doc never paired
  }

  test("simhash: identical token streams get distance 0, near-dups small distance") {
    val pairs = Dedup.simhashPairs(docs, 3).collect()
    val d03 = pairs.find(r => r.getLong(0) == 0L && r.getLong(1) == 3L)
    assert(d03.isDefined && d03.get.getAs[Long]("dist") === 0L)
  }

  test("embedding cosine pairs: exact variant finds planted duplicate vector") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.001f, 0.0f, 0.0f)), // near-identical to 0
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val exact = Dedup.embeddingCosinePairs(vecs, 0.99).collect()
    assert(exact.length === 1)
    assert((exact.head.getLong(0), exact.head.getLong(1)) === (0L, 1L))

    val lsh = Dedup.embeddingCosinePairsLsh(vecs, 0.99, bands = 4, planesPerBand = 3, dim = 4)
      .collect()
    assert(lsh.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((0L, 1L)))
  }

  test("semanticDedup: near-dup in the same cell drops the higher id; distinct cells both survive") {
    // Two tight groups on orthogonal axes + one lone vector. k=2, so the
    // groups separate; within each group the near-identical pair collapses
    // to the smaller id.
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.001f, 0.0f, 0.0f)), // near-dup of 0
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.002f, 0.0f)), // near-dup of 2
      (4L, Array(0.5f, 0.5f, 0.5f, 0.5f))
    ).toDF("vec_id", "embedding")
    val out = Dedup.semanticDedup(vecs, k = 2, rounds = 2, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val survivors = out.map(_._1).toSet
    assert(survivors.contains(0L) && survivors.contains(2L), s"keepers dropped: $out")
    assert(!survivors.contains(1L) && !survivors.contains(3L), s"dups kept: $out")
    assert(survivors.contains(4L), s"singleton dropped: $out")
  }

  test("semanticDedup maxCell: an over-cap cell skips the pair stage, members all kept") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.001f, 0.0f, 0.0f)), // near-dup of 0 (same cell)
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.002f, 0.0f)) // near-dup of 2 (same cell)
    ).toDF("vec_id", "embedding")
    // uncapped: 1 and 3 drop
    val full = Dedup.semanticDedup(vecs, k = 2, rounds = 2, threshold = 0.99)
      .collect().map(_.getLong(0)).toSet
    assert(full === Set(0L, 2L))
    // cap of 1: every 2-member cell is over cap → nothing pairs, all kept
    val capped = Dedup.semanticDedup(vecs, k = 2, rounds = 2, threshold = 0.99, maxCell = 1)
      .collect().map(_.getLong(0)).toSet
    assert(capped === Set(0L, 1L, 2L, 3L))
  }

  test("semanticDedupAppend: arrivals drop vs same-cell survivors and smaller-id batchmates") {
    // Base: two orthogonal groups; survivor set keeps 0 and 2. Batch: 10 is
    // a near-dup of survivor 0 (dropped vs base), 11 is orthogonal to
    // everything (kept), 12 is a near-dup of 11 (dropped vs its smaller-id
    // batchmate), 13 is near survivor 2's axis but in a genuinely new
    // direction (kept).
    val base = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.001f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.002f, 0.0f))
    ).toDF("vec_id", "embedding")
    val model = Dedup.semanticModel(base, k = 2, rounds = 2)
    val kept = Dedup.semanticDedup(base, k = 2, rounds = 2, threshold = 0.99)
      .join(base, Seq("vec_id"))
      .select("vec_id", "embedding", "cluster")
    assert(kept.collect().map(_.getLong(0)).toSet === Set(0L, 2L))
    val batch = Seq(
      (10L, Array(1.0f, 0.002f, 0.0f, 0.0f)), // near-dup of base survivor 0
      (11L, Array(0.0f, 0.0f, 1.0f, 0.0f)),   // novel direction
      (12L, Array(0.0f, 0.001f, 1.0f, 0.0f)), // near-dup of batchmate 11
      (13L, Array(0.0f, 0.0f, 0.0f, 1.0f))    // novel direction
    ).toDF("vec_id", "embedding")
    val out = Dedup.semanticDedupAppend(kept, batch, model, threshold = 0.99)
      .collect().map(_.getLong(0)).toSet
    assert(out === Set(11L, 13L), s"got $out")
  }

  test("semantic index: build/append lifecycle is cumulative — batch 2 drops vs batch 1's survivor") {
    val base = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.001f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.002f, 0.0f))
    ).toDF("vec_id", "embedding")
    val idx = java.nio.file.Files.createTempDirectory("graft-semidx").toString
    Dedup.semanticIndexBuild(base, idx, k = 2, rounds = 2, threshold = 0.99)
    def ids() = Dedup.semanticIndexSurvivors(spark, idx)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    assert(ids() === Set(0L, 2L))

    // batch 1: 11 is a novel direction → appended as a survivor
    val b1 = Seq((11L, Array(0.0f, 0.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
    Dedup.semanticIndexAppend(b1, idx, threshold = 0.99)
    assert(ids() === Set(0L, 2L, 11L))

    // batch 2: 12 duplicates batch-1's survivor 11 — only the PERSISTED
    // cumulative state can know that; 13 is novel
    val b2 = Seq(
      (12L, Array(0.0f, 0.001f, 1.0f, 0.0f)),
      (13L, Array(0.0f, 0.0f, 0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    Dedup.semanticIndexAppend(b2, idx, threshold = 0.99)
    assert(ids() === Set(0L, 2L, 11L, 13L))
  }

  test("semanticDedup: cross-cell near-dups are NOT dropped (the SemDeDup recall trade)") {
    // Force k = number of vectors so every vector sits alone: nothing can
    // pair, everything survives — the operator's cell boundary is real.
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(1.0f, 0.001f)) // distinct after quantization, cosine ~1
    ).toDF("vec_id", "embedding")
    val out = Dedup.semanticDedup(vecs, k = 2, rounds = 1, threshold = 0.9)
      .collect().map(_.getLong(0)).toSet
    assert(out === Set(0L, 1L), s"got $out")
  }

  test("embedding LSH: recall vs exact >= 0.8 on clustered vectors, precision exact") {
    // 20 cluster centers in dim 16, three small-noise copies each: every
    // within-cluster pair has cosine near 1, cross-cluster pairs are far.
    val rng = new scala.util.Random(7)
    val vecs = (0 until 20).flatMap { c =>
      val center = Array.fill(16)(rng.nextGaussian())
      (0 until 3).map { j =>
        val v = center.map(x => (x + 0.02 * rng.nextGaussian()).toFloat)
        ((c * 3 + j).toLong, v)
      }
    }.toDF("vec_id", "embedding")
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairSet(Dedup.embeddingCosinePairs(vecs, 0.9))
    val lsh = pairSet(Dedup.embeddingCosinePairsLsh(vecs, 0.9, dim = 16))
    assert(exact.nonEmpty)
    // precision is exact by construction: candidates are re-verified
    assert(lsh.subsetOf(exact))
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall (${lsh.size}/${exact.size})")
  }

  test("skew guard: buckets above maxBucket are dropped from candidate generation") {
    // docs 0 and 3 are identical post-normalization -> every shared bucket
    // has >= 2 members, so maxBucket = 1 suppresses all their candidates.
    val capped = Dedup.minhashLshPairs(docs, 0.5, maxBucket = 1)
    assert(capped.count() === 0)
    // default cap is a no-op on small buckets
    assert(Dedup.minhashLshPairs(docs, 0.5).count() > 0)
  }

  test("contamination pairs: benchmark doc rediscovers its corpus source, clean docs don't") {
    val bench = docs
      .filter(col("doc_id") === 0L)
      .select((col("doc_id") + 100L).as("doc_id"), col("text"))
    val pairs = Dedup.contaminationPairs(docs, bench, 0.3).collect()
    val ids = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ids.contains((0L, 100L))) // exact source at jac 1.0
    assert(ids.contains((3L, 100L))) // normalized dup of the source
    assert(!ids.exists(_._1 == 2L)) // unrelated content never pairs
    val jac0 = pairs.find(r => r.getLong(0) == 0L).get.getAs[Double]("jac")
    assert(jac0 === 1.0)
  }

  test("incrementalDedup: batch docs classified exact_dup / near_dup / kept against the corpus") {
    val corpus = Seq((0L, base), (1L, "unrelated corpus doc about columnar engines and such")).toDF("doc_id", "text")
    val batch = Seq(
      (100L, "  " + base.toUpperCase.toLowerCase + "  "), // exact after normalization
      (101L, base + " extra"), // near-dup of corpus 0 (shares prefix block + shingles)
      (102L, "fresh novel content never seen in any corpus before this moment arrived here")
    ).toDF("doc_id", "text")
    val out = Dedup
      .incrementalDedup(batch, corpus, 0.3, expectedCorpusDocs = 10L)
      .collect()
      .map(r => r.getLong(0) -> r.getString(1))
      .toMap
    assert(out === Map(100L -> "exact_dup", 101L -> "near_dup", 102L -> "kept"))
  }

  test("incrementalDedup: empty batch and batch-only duplicates stay kept") {
    val corpus = Seq((0L, base)).toDF("doc_id", "text")
    // Two batch docs that duplicate EACH OTHER but not the corpus: incremental
    // dedup is vs the corpus only (intra-batch dedup is exact()'s job).
    val t = "twin text payload repeated within the same batch twice over and over again tonight"
    val batch = Seq((200L, t), (201L, t)).toDF("doc_id", "text")
    val out = Dedup
      .incrementalDedup(batch, corpus, 0.3, expectedCorpusDocs = 10L)
      .collect()
      .map(r => r.getLong(0) -> r.getString(1))
      .toMap
    assert(out === Map(200L -> "kept", 201L -> "kept"))
    val empty = Dedup.incrementalDedup(batch.limit(0), corpus, 0.3, expectedCorpusDocs = 10L)
    assert(empty.count() === 0L)
  }

  test("dropNearDuplicates: greedy drop of each pair's higher id, keepers survive") {
    val pairs = Seq((0L, 1L), (0L, 3L)).toDF("a_id", "b_id")
    val kept = Dedup.dropNearDuplicates(docs, pairs).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(0L, 2L, 4L)) // 1 and 3 dropped; 0 (keeper) and unpaired docs stay
    // empty pair set is the identity
    val none = Seq.empty[(Long, Long)].toDF("a_id", "b_id")
    assert(Dedup.dropNearDuplicates(docs, none).count() === docs.count())
  }

  test("duplicateClusters: chains close transitively to the min id, components stay separate") {
    // 0-1, 1-2, 2-3 is a diameter-3 chain (multiple propagation rounds);
    // 7-8 is a separate component; 9 appears in no pair.
    val pairs = Seq((0L, 1L), (1L, 2L), (2L, 3L), (7L, 8L)).toDF("a_id", "b_id")
    val out = Dedup.duplicateClusters(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((0L, 0L), (1L, 0L), (2L, 0L), (3L, 0L), (7L, 7L), (8L, 7L)))
    // empty pair set yields an empty (not failing) cluster map
    val none = Seq.empty[(Long, Long)].toDF("a_id", "b_id")
    assert(Dedup.duplicateClusters(none).count() === 0)
  }

  test("duplicateClusters: pair order and direction don't matter") {
    val fwd = Seq((1L, 5L), (5L, 9L)).toDF("a_id", "b_id")
    val rev = Seq((9L, 5L), (5L, 1L)).toDF("a_id", "b_id")
    val a = Dedup.duplicateClusters(fwd).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Dedup.duplicateClusters(rev).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a === b)
    assert(a === Set((1L, 1L), (5L, 1L), (9L, 1L)))
  }

  test("leakage-safe split: every near-dup pair lands in one split; singletons match the plain split") {
    val dir = "/root/testdata/sf0.001"
    val docs = graft.sources.Tables.documents(spark, dir)
    val split = graft.SparkEntry.queries("q_train_split_leakfree")(spark, dir)
      .select("doc_id", "split")
    val pairs = Dedup.ngramJaccardPairs(docs, 0.3).select("a_id", "b_id")
    assert(pairs.count() > 0, "fixture has no near-dup pairs; property vacuous")
    // the property the operator exists for: no pair straddles splits
    val straddlers = pairs
      .join(split.withColumnRenamed("doc_id", "a_id").withColumnRenamed("split", "sa"), "a_id")
      .join(split.withColumnRenamed("doc_id", "b_id").withColumnRenamed("split", "sb"), "b_id")
      .filter(col("sa") =!= col("sb"))
    assert(straddlers.count() === 0)
    // docs in no pair keep exactly the plain hash-split assignment
    val plain = graft.SparkEntry.queries("q_train_split")(spark, dir)
      .withColumnRenamed("split", "plain_split")
    val paired = pairs.select(col("a_id").as("doc_id"))
      .union(pairs.select(col("b_id").as("doc_id"))).distinct()
    val singletonDiffs = split
      .join(paired, Seq("doc_id"), "left_anti")
      .join(plain, "doc_id")
      .filter(col("split") =!= col("plain_split"))
    assert(singletonDiffs.count() === 0)
  }

  test("duplicateClusters: a 64-deep chain converges well inside the default round cap") {
    // BFS alone would need 63 rounds; pointer halving must close the chain
    // within the default maxIter = 25.
    val chain = (0L until 63L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val (out, rounds) = Dedup.duplicateClustersWithRounds(chain)
    assert(rounds < 25, s"took $rounds rounds — halving not engaging")
    val labels = out.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(labels.length === 64)
    assert(labels.forall(_._2 === 0L))
  }

  test("dropDuplicateClusters: one survivor per component, unpaired docs untouched") {
    // Greedy dropNearDuplicates on pairs (0,1),(1,3) drops BOTH 1 and 3 even
    // though 3's only partner (1) is itself dropped; the cluster policy keeps
    // exactly one representative (0) and drops the rest of the component.
    val pairs = Seq((0L, 1L), (1L, 3L)).toDF("a_id", "b_id")
    val kept = Dedup.dropDuplicateClusters(docs, pairs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(0L, 2L, 4L))
    val none = Seq.empty[(Long, Long)].toDF("a_id", "b_id")
    assert(Dedup.dropDuplicateClusters(docs, none).count() === docs.count())
  }

  test("shingles/jaccard edges: docs shorter than n produce no pairs and no errors") {
    val tiny = Seq((0L, "one two"), (1L, "one two")).toDF("doc_id", "text")
    assert(Dedup.ngramJaccardPairs(tiny, 0.1).count() === 0) // empty shingle sets -> null jac
    assert(Dedup.minhashLshPairs(tiny, 0.1).count() === 0)
  }

  test("duplicatedSpanStats: cross-doc windows flagged, unique and short docs are not") {
    val span = "alpha beta gamma delta epsilon zeta eta theta" // exactly one 8-token window
    val d = Seq(
      (0L, span + " iota"), // 9 tokens -> 2 windows, the first shared with doc 1
      (1L, span),
      (2L, "one two three four five six seven eight nine ten"), // 3 unique windows
      (3L, "short text") // below window size -> n_win = 0, frac = 0.0 (not NULL)
    ).toDF("doc_id", "text")
    val out = Dedup
      .duplicatedSpanStats(d, 8)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out(0L) === ((2L, 1L, 0.5)))
    assert(out(1L) === ((1L, 1L, 1.0)))
    assert(out(2L) === ((3L, 0L, 0.0)))
    assert(out(3L) === ((0L, 0L, 0.0)))
  }

  test("minhash index lifecycle: build → append → delete → compact; tombstone " +
    "hides the doc from candidates, compaction applies it physically") {
    val idx = java.nio.file.Files.createTempDirectory("graft-mhidx").toString
    Dedup.minhashIndexBuild(docs.filter(col("doc_id") <= 2), idx)
    // append under the STORED parameters: doc 3 (near-dup of 0) joins later
    Dedup.minhashIndexAppend(docs.filter(col("doc_id") >= 3), idx)
    val probe = Seq((100L, base + " probe")).toDF("doc_id", "text")
    def cands(): Set[Long] =
      Dedup.minhashIndexCandidates(probe, idx)
        .collect().map(_.getAs[Long]("c_id")).toSet
    val before = cands()
    assert(before.contains(0L), s"probe should hit the base near-dup, got $before")
    assert(before.contains(3L), s"probe should hit the APPENDED near-dup, got $before")
    // logical delete: candidates lose doc 0 instantly, physical rows remain
    Dedup.minhashIndexDelete(Seq(0L).toDF("doc_id"), idx)
    val after = cands()
    assert(!after.contains(0L))
    assert(after === before - 0L)
    assert(spark.read.parquet(mhDir(idx, "index")).filter(col("c_id") === 0L).count() > 0L)
    // compaction applies physically and clears the segment; answers unchanged
    Dedup.minhashIndexCompact(spark, idx)
    assert(spark.read.parquet(mhDir(idx, "index")).filter(col("c_id") === 0L).count() === 0L)
    assert(!dirExists(liveTombs(idx)))
    assert(cands() === after)
    // rebuild invalidates stale tombstones
    Dedup.minhashIndexDelete(Seq(3L).toDF("doc_id"), idx)
    Dedup.minhashIndexBuild(docs, idx)
    assert(cands().contains(3L))
  }

  test("minhash index streaming append: streamed segment equals the batch append; " +
    "checkpoint resume skips processed files; compaction folds it into the base") {
    val docs5 = docs
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val baseDir = java.nio.file.Files.createTempDirectory("graft-mh-stream").toString
    val (idxA, idxB, arrivals, ckpt) =
      (s"$baseDir/a", s"$baseDir/b", s"$baseDir/in", s"$baseDir/ckpt")
    Dedup.minhashIndexBuild(docs.filter(col("doc_id") <= 2), idxA)
    Dedup.minhashIndexBuild(docs.filter(col("doc_id") <= 2), idxB)
    // batch path on A, streamed path on B — same stored parameters
    Dedup.minhashIndexAppend(docs.filter(col("doc_id") >= 3), idxA)
    docs5.filter(col("doc_id") >= 3).coalesce(1).write.mode("append").parquet(arrivals)
    Dedup.minhashIndexAppendStream(spark, idxB, arrivals, ckpt)
    def rows(idx: String): Set[(Int, Long, Seq[Long])] =
      Dedup.minhashIndexRows(spark, idx).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Long](2).toSeq)).toSet
    assert(rows(idxB) === rows(idxA))
    assert(rows(idxB).exists(_._2 == 3L))
    // same checkpoint, no new files -> nothing ingested twice
    val n = Dedup.minhashIndexRows(spark, idxB).count()
    Dedup.minhashIndexAppendStream(spark, idxB, arrivals, ckpt)
    assert(Dedup.minhashIndexRows(spark, idxB).count() === n)
    // tombstones apply across base AND stream segment; compaction folds both
    Dedup.minhashIndexDelete(Seq(3L).toDF("doc_id"), idxB)
    val live = rows(idxB)
    assert(!live.exists(_._2 == 3L))
    Dedup.minhashIndexCompact(spark, idxB)
    assert(!dirExists(liveStream(idxB, IndexManifest.Layouts.minhash)))
    assert(!dirExists(liveTombs(idxB)))
    assert(rows(idxB) === live)
  }

  test("semantic index streaming append: cumulative across epochs, equal to " +
    "chained batch appends; replay skipped; compaction folds the segment") {
    val baseVecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.001f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val b1 = Seq((11L, Array(0.0f, 0.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
    val b2 = Seq(
      (12L, Array(0.0f, 0.001f, 1.0f, 0.0f)), // dup of STREAMED survivor 11
      (13L, Array(0.0f, 0.0f, 0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    def withLabel(df: org.apache.spark.sql.DataFrame) = df.withColumn("label", lit(0))
    val baseDir = java.nio.file.Files.createTempDirectory("graft-sem-stream").toString
    val (idxA, idxB, arrivals, ckpt) =
      (s"$baseDir/a", s"$baseDir/b", s"$baseDir/in", s"$baseDir/ckpt")
    Dedup.semanticIndexBuild(baseVecs, idxA, k = 2, rounds = 2, threshold = 0.99)
    Dedup.semanticIndexBuild(baseVecs, idxB, k = 2, rounds = 2, threshold = 0.99)
    // batch chain on A
    Dedup.semanticIndexAppend(b1, idxA, threshold = 0.99)
    Dedup.semanticIndexAppend(b2, idxA, threshold = 0.99)
    // streamed chain on B: two drains -> two epochs, the second must see
    // the first's committed survivors (cumulative)
    withLabel(b1).coalesce(1).write.mode("append").parquet(arrivals)
    Dedup.semanticIndexAppendStream(spark, idxB, arrivals, ckpt, threshold = 0.99)
    withLabel(b2).coalesce(1).write.mode("append").parquet(arrivals)
    Dedup.semanticIndexAppendStream(spark, idxB, arrivals, ckpt, threshold = 0.99)
    def ids(idx: String): Set[Long] =
      Dedup.semanticIndexSurvivors(spark, idx)
        .collect().map(_.getAs[Long]("vec_id")).toSet
    assert(ids(idxB) === ids(idxA))
    assert(ids(idxB) === Set(0L, 2L, 11L, 13L))
    // replay with the same checkpoint: nothing re-appended
    Dedup.semanticIndexAppendStream(spark, idxB, arrivals, ckpt, threshold = 0.99)
    assert(ids(idxB) === Set(0L, 2L, 11L, 13L))
    // compaction folds the streamed segment into the cell-partitioned base
    Dedup.semanticIndexCompact(spark, idxB)
    assert(!dirExists(liveStream(idxB, IndexManifest.Layouts.semantic)))
    assert(ids(idxB) === Set(0L, 2L, 11L, 13L))
  }

  test("minhash compaction restores the maxBucket invariant that uncapped " +
    "streamed appends can violate (compacted index == fresh build of the live corpus)") {
    val baseDir = java.nio.file.Files.createTempDirectory("graft-mh-cap").toString
    val (idx, arrivals, ckpt) = (s"$baseDir/idx", s"$baseDir/in", s"$baseDir/ckpt")
    // identical text => identical band buckets for every doc id
    Dedup.minhashIndexBuild(Seq((1L, base)).toDF("doc_id", "text"), idx, maxBucket = 2)
    Seq((2L, base), (3L, base))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("append").parquet(arrivals)
    Dedup.minhashIndexAppendStream(spark, idx, arrivals, ckpt)
    // uncapped until compaction: every bucket now holds 3 members (> cap 2)
    assert(Dedup.minhashIndexRows(spark, idx).count() === 12L) // 3 docs x 4 bands
    Dedup.minhashIndexCompact(spark, idx)
    // a fresh build of the 3-doc corpus at cap 2 would drop every bucket —
    // compaction must converge to the same state
    assert(Dedup.minhashIndexRows(spark, idx).count() === 0L)
  }

  test("minhash index: compacting a fully-tombstoned index reads back as EMPTY, not broken") {
    val idx = java.nio.file.Files.createTempDirectory("graft-mhidx-empty").toString
    Dedup.minhashIndexBuild(docs, idx)
    Dedup.minhashIndexDelete(docs.select("doc_id"), idx)
    Dedup.minhashIndexCompact(spark, idx)
    assert(Dedup.minhashIndexRows(spark, idx).count() === 0L)
    val probe = Seq((100L, base)).toDF("doc_id", "text")
    assert(Dedup.minhashIndexCandidates(probe, idx).count() === 0L)
  }

  test("semantic index delete: a retracted survivor stops suppressing arrivals; " +
    "compaction applies physically; full tombstoning reads back empty") {
    val baseVecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.001f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val idx = java.nio.file.Files.createTempDirectory("graft-semidx-del").toString
    Dedup.semanticIndexBuild(baseVecs, idx, k = 2, rounds = 2, threshold = 0.99)
    def ids() = Dedup.semanticIndexSurvivors(spark, idx)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    assert(ids() === Set(0L, 2L))
    // takedown of survivor 0: live view loses it instantly
    Dedup.semanticIndexDelete(Seq(0L).toDF("vec_id"), idx)
    assert(ids() === Set(2L))
    assert(spark.read.parquet(semDir(idx, "survivors")).filter(col("vec_id") === 0L).count() === 1L)
    // an arrival that duplicated ONLY the retracted survivor is now kept —
    // the semantics a takedown wants (nothing live suppresses it)
    val b1 = Seq((10L, Array(1.0f, 0.002f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    Dedup.semanticIndexAppend(b1, idx, threshold = 0.99)
    assert(ids() === Set(2L, 10L))
    // physical apply + clean segment; answers unchanged
    Dedup.semanticIndexCompact(spark, idx)
    assert(spark.read.parquet(semDir(idx, "survivors")).filter(col("vec_id") === 0L).count() === 0L)
    assert(!dirExists(liveTombs(idx)))
    assert(ids() === Set(2L, 10L))
    // retract everything: the compacted index is EMPTY, not broken
    Dedup.semanticIndexDelete(Seq(2L, 10L).toDF("vec_id"), idx)
    Dedup.semanticIndexCompact(spark, idx)
    assert(ids() === Set.empty[Long])
    // and a fresh arrival into the empty live set is kept under the frozen model
    val b2 = Seq((20L, Array(0.0f, 0.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
    Dedup.semanticIndexAppend(b2, idx, threshold = 0.99)
    assert(ids() === Set(20L))
  }
}
