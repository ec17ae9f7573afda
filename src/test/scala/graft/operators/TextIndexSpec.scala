package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VectorFunctions

class TextIndexSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "apple banana apple cherry", "src0"),
    (1L, "banana banana date", "src0"),
    (2L, "apple elderberry", "src1"),
    (3L, "", "src1")
  ).toDF("doc_id", "text", "source")

  test("TextSearchIndex: freshly-built search reproduces bm25TopK bit-for-bit; " +
    "append moves df, delete retracts, compact preserves, trigger self-applies") {
    val idx = java.nio.file.Files.createTempDirectory("graft-textidx").toString
    val terms = Seq("apple", "banana")
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Double, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    TextSearchIndex.build(docs, idx)
    assert(
      rows(TextSearchIndex.search(spark, idx, terms, 10)) ===
        rows(TextIndex.bm25TopK(docs, terms, 10)))
    // append: a new apple-heavy doc is findable; df(apple) moved 2 → 3, so
    // surviving docs' scores change too (live idf under frozen stats)
    val before = rows(TextSearchIndex.search(spark, idx, terms, 10))
    TextSearchIndex.append(
      Seq((9L, "apple apple apple", "srcX")).toDF("doc_id", "text", "source"), idx)
    val after = rows(TextSearchIndex.search(spark, idx, terms, 10))
    assert(after.exists(_._2 == 9L))
    assert(after.filterNot(_._2 == 9L).map(_._2).toSet.subsetOf(before.map(_._2).toSet + 9L))
    // delete: doc 0 leaves the hit list at the next query
    TextSearchIndex.delete(Seq(0L).toDF("doc_id"), idx)
    val postDel = rows(TextSearchIndex.search(spark, idx, terms, 10))
    assert(!postDel.exists(_._2 == 0L) && postDel.nonEmpty)
    // trigger: 1 tombstone over the postings base — hold off at 50%, fire
    // at the point it genuinely exceeds
    assert(!TextSearchIndex.maybeCompact(spark, idx, ratio = 0.5))
    assert(rows(TextSearchIndex.search(spark, idx, terms, 10)) === postDel)
    assert(TextSearchIndex.maybeCompact(spark, idx, ratio = 0.001))
    assert(rows(TextSearchIndex.search(spark, idx, terms, 10)) === postDel)
    assert(!TextSearchIndex.maybeCompact(spark, idx, ratio = 0.001))
  }

  test("TextSearchIndex staleness: growth and avgdl drift measured vs frozen " +
    "stats; maybeRebuild holds/fires on them and re-freezes") {
    val idx = java.nio.file.Files.createTempDirectory("graft-textidx-stale").toString
    val two = docs.filter(col("doc_id") <= 1)
    TextSearchIndex.build(two, idx)
    val (g0, d0) = TextSearchIndex.staleness(spark, idx)
    assert(g0 === 0.0 && d0 === 0.0)
    // +1 doc over a 2-doc build set: growth 0.5; its length moves avgdl
    TextSearchIndex.append(
      Seq((7L, "apple apple apple apple apple apple apple apple", "s"))
        .toDF("doc_id", "text", "source"), idx)
    val (g1, d1) = TextSearchIndex.staleness(spark, idx)
    assert(g1 === 0.5 && d1 > 0.0)
    val full = two.unionByName(
      Seq((7L, "apple apple apple apple apple apple apple apple", "s"))
        .toDF("doc_id", "text", "source"))
    assert(!TextSearchIndex.maybeRebuild(full, idx, growthRatio = 1.0, driftRatio = 10.0))
    assert(TextSearchIndex.maybeRebuild(full, idx, growthRatio = 0.4, driftRatio = 10.0))
    val (g2, d2) = TextSearchIndex.staleness(spark, idx)
    assert(g2 === 0.0 && d2 === 0.0, "rebuild re-freezes the stats over the live corpus")
    // deletes count as drift too (shrinkage)
    TextSearchIndex.delete(Seq(7L).toDF("doc_id"), idx)
    val (g3, _) = TextSearchIndex.staleness(spark, idx)
    assert(math.abs(g3 - 1.0 / 3.0) < 1e-9)
  }

  test("TextSearchIndex.phraseSearch: positional postings reproduce the " +
    "in-memory phrase operator; appends join in, deletes retract, compact preserves") {
    val idx = java.nio.file.Files.createTempDirectory("graft-textidx-phrase").toString
    val corpus = Seq(
      (0L, "apple banana cherry apple banana", "s"),
      (1L, "banana apple banana apple", "s"),
      (2L, "apple apple banana", "s"),
      (3L, "banana", "s")
    ).toDF("doc_id", "text", "source")
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    TextSearchIndex.build(corpus, idx)
    assert(
      rows(TextSearchIndex.phraseSearch(spark, idx, "apple banana")) ===
        rows(TextIndex.phraseSearch(corpus, "apple banana")))
    // multi-occurrence counting and a 3-token phrase
    assert(
      rows(TextSearchIndex.phraseSearch(spark, idx, "apple banana")) ===
        Seq((0L, 2L), (1L, 1L), (2L, 1L)))
    assert(
      rows(TextSearchIndex.phraseSearch(spark, idx, "apple banana cherry")) ===
        Seq((0L, 1L)))
    // append: new doc's phrases are findable immediately
    TextSearchIndex.append(
      Seq((9L, "apple banana apple banana", "s")).toDF("doc_id", "text", "source"), idx)
    assert(
      rows(TextSearchIndex.phraseSearch(spark, idx, "apple banana"))
        .contains((9L, 2L)))
    // delete retracts from phrase results too; compact preserves them
    TextSearchIndex.delete(Seq(0L).toDF("doc_id"), idx)
    val postDel = rows(TextSearchIndex.phraseSearch(spark, idx, "apple banana"))
    assert(postDel === Seq((1L, 1L), (2L, 1L), (9L, 2L)))
    TextSearchIndex.compact(spark, idx)
    assert(rows(TextSearchIndex.phraseSearch(spark, idx, "apple banana")) === postDel)
  }

  test("TextSearchIndex.searchTerms: single-query parity with search(); a " +
    "multi-query batch answers each query as if alone; deletes apply") {
    val idx = java.nio.file.Files.createTempDirectory("graft-textidx-terms").toString
    TextSearchIndex.build(docs, idx)
    def single(terms: Seq[String]): Seq[(Long, Long, Double, Long)] =
      TextSearchIndex.search(spark, idx, terms, 10).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    def multi(qs: Seq[(Long, Seq[String])]): Map[Long, Seq[(Long, Long, Double, Long)]] =
      TextSearchIndex.searchTerms(spark, idx, qs.toDF("q_id", "toks"), 10)
        .collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4))))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sortBy(_._1)).toMap
    val qs = Seq(1L -> Seq("apple", "banana"), 2L -> Seq("cherry"))
    val m = multi(qs)
    assert(m(1L) === single(Seq("apple", "banana")),
      "batched query 1 must equal its solo search bit-for-bit")
    assert(m(2L) === single(Seq("cherry")))
    // duplicate terms in a query count once (term-set semantics)
    assert(multi(Seq(1L -> Seq("apple", "apple", "banana")))(1L) ===
      single(Seq("apple", "banana")))
    TextSearchIndex.delete(Seq(0L).toDF("doc_id"), idx)
    assert(!multi(qs)(1L).exists(_._2 == 0L))
  }

  test("TextSearchIndex.upsert: atomic replace in one generation — old copies " +
    "out, new copies in, deleted ids resurrect, later deletes still bite") {
    val idx = java.nio.file.Files.createTempDirectory("graft-textidx-upsert").toString
    def genOf(): Long =
      IndexManifest.read(spark, idx).map(_.generation).getOrElse(0L)
    def hitDocs(terms: Seq[String]): Set[Long] =
      TextSearchIndex.search(spark, idx, terms, 100).collect().map(_.getLong(1)).toSet
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Double, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    // upsert before build: nothing to normalize scores under — loud error
    intercept[IllegalArgumentException] {
      TextSearchIndex.upsert(Seq((0L, "x", "s")).toDF("doc_id", "text", "source"), idx)
    }
    TextSearchIndex.build(docs, idx)
    val g0 = genOf()
    val preUpsert = rows(TextSearchIndex.search(spark, idx, Seq("apple", "banana"), 10))
    // replace doc 0 (was "apple banana apple cherry") with a grape-rich text
    TextSearchIndex.upsert(
      Seq((0L, "grape grape banana", "src0")).toDF("doc_id", "text", "source"), idx)
    assert(genOf() === g0 + 1, "upsert is exactly one generation commit")
    assert(!hitDocs(Seq("apple")).contains(0L), "old copy's postings stopped serving")
    assert(hitDocs(Seq("cherry")).isEmpty, "term unique to the old copy hits nothing")
    assert(hitDocs(Seq("grape")) === Set(0L), "replacement copy serves")
    assert(hitDocs(Seq("banana")).contains(0L))
    // the pre-upsert generation is still snapshot-readable (retention = 1)
    assert(rows(TextSearchIndex.searchAsOf(spark, idx, Seq("apple", "banana"), 10, g0))
      === preUpsert)
    // phrase search reads the replacement positions
    assert(TextSearchIndex.phraseSearch(spark, idx, "grape grape")
      .collect().map(_.getLong(0)).toSet === Set(0L))
    assert(TextSearchIndex.phraseSearch(spark, idx, "apple banana")
      .collect().isEmpty)
    // delete-then-upsert resurrects WITHOUT a compaction (the old contract
    // required compacting first)
    TextSearchIndex.delete(Seq(2L).toDF("doc_id"), idx)
    assert(!hitDocs(Seq("elderberry")).contains(2L))
    TextSearchIndex.upsert(
      Seq((2L, "elderberry fig", "src1")).toDF("doc_id", "text", "source"), idx)
    assert(hitDocs(Seq("elderberry")) === Set(2L), "deleted id re-added by upsert")
    // a LATER delete still kills the upserted copy (scope moves forward)
    TextSearchIndex.delete(Seq(2L).toDF("doc_id"), idx)
    assert(!hitDocs(Seq("elderberry")).contains(2L))
    // bystander doc untouched through it all; searchTerms shares the pruning
    assert(hitDocs(Seq("date")) === Set(1L))
    assert(TextSearchIndex.searchTerms(
      spark, idx, Seq((7L, Seq("grape", "date"))).toDF("q_id", "toks"), 10)
      .collect().map(_.getLong(2)).toSet === Set(0L, 1L))
    // compaction folds the whole state physically; answers unchanged
    val pre = rows(TextSearchIndex.search(spark, idx, Seq("grape", "banana", "date"), 10))
    TextSearchIndex.compact(spark, idx)
    assert(rows(TextSearchIndex.search(spark, idx, Seq("grape", "banana", "date"), 10))
      === pre)
    assert(hitDocs(Seq("elderberry")).isEmpty)
  }

  test("TextSearchIndex takedown survives an unrelated upsert: delete(X) then " +
    "upsert(Y) then append(X) keeps X hidden; only upsert(X) re-adds it") {
    val idx = java.nio.file.Files.createTempDirectory("graft-textidx-takedown").toString
    TextSearchIndex.build(docs, idx)
    def hitDocs(terms: Seq[String]): Set[Long] =
      TextSearchIndex.search(spark, idx, terms, 100).collect().map(_.getLong(1)).toSet
    TextSearchIndex.delete(Seq(2L).toDF("doc_id"), idx)
    assert(!hitDocs(Seq("elderberry")).contains(2L))
    // an unrelated upsert bumps the generation — the resurrection window
    TextSearchIndex.upsert(
      Seq((1L, "banana fig", "src0")).toDF("doc_id", "text", "source"), idx)
    assert(hitDocs(Seq("elderberry")).isEmpty, "takedown survives the unrelated upsert")
    // a plain re-append of the taken-down id lands ABOVE the old live
    // generation — it must still be hidden (the round-9 contract fix)
    TextSearchIndex.append(
      Seq((2L, "elderberry elderberry", "src1")).toDF("doc_id", "text", "source"), idx)
    assert(hitDocs(Seq("elderberry")).isEmpty,
      "append of a taken-down id after an unrelated upsert must not serve")
    // the one sanctioned re-add: upsert of the id itself
    TextSearchIndex.upsert(
      Seq((2L, "elderberry fig", "src1")).toDF("doc_id", "text", "source"), idx)
    assert(hitDocs(Seq("elderberry")) === Set(2L), "upsert of X itself re-adds it")
    // bystanders intact; compaction preserves the live view
    assert(hitDocs(Seq("fig")) === Set(1L, 2L))
    val pre = hitDocs(Seq("banana", "fig", "elderberry"))
    TextSearchIndex.compact(spark, idx)
    assert(hitDocs(Seq("banana", "fig", "elderberry")) === pre)
  }

  test("TextSearchIndex.upsert: crash-atomicity (orphan next-gen dirs are " +
    "invisible and recovered) and legacy unscoped tombstones still bite") {
    val idx = java.nio.file.Files.createTempDirectory("graft-textidx-upcrash").toString
    TextSearchIndex.build(docs, idx)
    def hitDocs(terms: Seq[String]): Set[Long] =
      TextSearchIndex.search(spark, idx, terms, 100).collect().map(_.getLong(1)).toSet
    val st = IndexManifest.resolve(spark, idx, IndexManifest.Layouts.text)
    // simulate a crash mid-upsert: next-generation stream + tombstone dirs
    // fully written, manifest never committed
    val g = st.generation + 1
    Seq((0L, 99L)).toDF("ts_id", "ts_gen").write
      .parquet(s"$idx/${IndexManifest.genName("tombstones", g)}")
    Seq(("zzz", 0L, 1L, 1L, Seq(0L))).toDF("tok", "doc_id", "tf", "dl", "positions")
      .write.parquet(s"$idx/${IndexManifest.genName("postings-stream", g)}")
    assert(hitDocs(Seq("apple")) === Set(0L, 2L),
      "uncommitted upsert segments must be invisible to readers")
    assert(hitDocs(Seq("zzz")).isEmpty)
    // the real upsert overwrites the orphans and commits
    TextSearchIndex.upsert(
      Seq((0L, "grape grape", "src0")).toDF("doc_id", "text", "source"), idx)
    assert(hitDocs(Seq("apple")) === Set(2L))
    assert(hitDocs(Seq("grape")) === Set(0L))
    assert(hitDocs(Seq("zzz")).isEmpty, "orphan rows never serve")
    // legacy compat: a ts_id-only tombstone row (pre-scope on-disk format)
    // reads as unscoped — hides the id in EVERY live segment...
    val live = IndexManifest.resolve(spark, idx, IndexManifest.Layouts.text)
    Seq(1L).toDF("ts_id").write.mode("append")
      .parquet(s"$idx/${live.tombstones}")
    assert(!hitDocs(Seq("banana")).contains(1L))
    // ...and an upsert of that id drops its pending tombstone, so the
    // re-added copy serves
    TextSearchIndex.upsert(
      Seq((1L, "banana banana", "src0")).toDF("doc_id", "text", "source"), idx)
    assert(hitDocs(Seq("banana")).contains(1L))
    assert(hitDocs(Seq("grape")) === Set(0L), "prior upsert's copy carried intact")
  }

  test("TextSearchIndex streaming append: streamed postings equal the batch " +
    "append; checkpoint resume skips processed files; compaction folds") {
    val base = java.nio.file.Files.createTempDirectory("graft-textidx-stream").toString
    val (idxA, idxB, arrivals, ckpt) = (s"$base/a", s"$base/b", s"$base/in", s"$base/ckpt")
    val docs5 = docs
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .select("doc_id", "text", "lang", "source", "n_chars")
    TextSearchIndex.build(docs5.filter(col("doc_id") <= 1), idxA)
    TextSearchIndex.build(docs5.filter(col("doc_id") <= 1), idxB)
    TextSearchIndex.append(docs5.filter(col("doc_id") >= 2), idxA)
    docs5.filter(col("doc_id") >= 2).coalesce(1).write.mode("append").parquet(arrivals)
    TextSearchIndex.appendStream(spark, idxB, arrivals, ckpt)
    def res(idx: String): Seq[(Long, Long, Double, Long)] =
      TextSearchIndex.search(spark, idx, Seq("apple", "banana"), 10).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    assert(res(idxB) === res(idxA))
    assert(res(idxB).exists(_._2 == 2L))
    // the stream path builds postings with the row-local HOF form, the
    // batch path with the posexplode+aggregate form — positions must be
    // bit-equal too (phrase adjacency is the consumer that would notice)
    def ph(idx: String): Seq[(Long, Long)] =
      TextSearchIndex.phraseSearch(spark, idx, "apple elderberry").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)
    assert(ph(idxB) === ph(idxA) && ph(idxA).nonEmpty)
    // same checkpoint, no new files → nothing ingested twice
    val n = res(idxB)
    TextSearchIndex.appendStream(spark, idxB, arrivals, ckpt)
    assert(res(idxB) === n)
    TextSearchIndex.compact(spark, idxB)
    assert(res(idxB) === n)
  }

  test("tfIdfTopK: rare terms outrank common ones, k respected, empty doc absent") {
    val out = TextIndex.tfIdfTopK(docs, 2).collect()
    // doc 3 has no tokens -> contributes no rows
    assert(!out.exists(_.getLong(0) == 3L))
    assert(out.groupBy(_.getLong(0)).forall(_._2.length <= 2))
    val d0 = out.filter(_.getLong(0) == 0L).sortBy(_.getAs[Long]("rk"))
    // apple: tf=2, df=2 -> 2*4/2 = 4.0; cherry: tf=1, df=1 -> 4.0; banana: tf=1, df=2 -> 2.0
    // tie at 4.0 broken by token: apple before cherry
    assert(d0.map(_.getAs[String]("tok")).toSeq === Seq("apple", "cherry"))
    assert(d0.head.getAs[Double]("tfidf") === 4.0)
  }

  test("vocabulary: ids contiguous from 1 in (count desc, token) order") {
    val v = TextIndex.vocabulary(docs, 3).collect()
    assert(v.map(_.getAs[Long]("vid")).toSeq === Seq(1L, 2L, 3L))
    // apple x3, banana x3 (tie -> alphabetical), cherry/date/elderberry x1
    assert(v.map(_.getAs[String]("tok")).toSeq === Seq("apple", "banana", "cherry"))
    assert(v.map(_.getAs[Long]("n")).toSeq === Seq(3L, 3L, 1L))
  }

  test("distinctiveTerms: a source-exclusive term outranks shared vocabulary") {
    // 'quantum' appears only in srcA, 'the' everywhere — c-TF-IDF must put
    // the exclusive term first for srcA despite equal in-source counts.
    val d = Seq(
      (0L, "the quantum the quantum", "srcA"),
      (1L, "the common the common", "srcB"),
      (2L, "the common the common", "srcC")
    ).toDF("doc_id", "text", "source")
    val top = TextIndex.distinctiveTerms(d, 2).collect()
      .map(r => (r.getString(0), r.getAs[Long]("rk")) -> r.getAs[String]("tok")).toMap
    assert(top(("srcA", 1L)) === "quantum", top.toString)
    assert(top(("srcB", 1L)) === "common")
  }

  test("zipfFit: an exact power-law corpus recovers slope -1 with r2 ~ 1") {
    // term r appears ceil(1024/r) times for r in 1..32 — counts follow
    // 1/rank exactly (up to ceil), so the log-log fit must sit near
    // slope −1 with high r².
    val zipfDocs = (1 to 32).map { r =>
      val reps = math.ceil(1024.0 / r).toInt
      (r.toLong, Array.fill(reps)(f"term$r%02d").mkString(" "), "s")
    }.toDF("doc_id", "text", "source")
    val fit = TextIndex.zipfFit(zipfDocs, 32).collect().head
    assert(fit.getAs[Long]("n_terms") === 32L)
    assert(math.abs(fit.getAs[Double]("slope") + 1.0) < 0.02, fit.toString)
    assert(fit.getAs[Double]("r2") > 0.999, fit.toString)
  }

  test("zipfFit: a uniform corpus is flat (slope 0) and degenerate fits don't blow up") {
    val flat = Seq((0L, (1 to 20).map(i => f"w$i%02d").mkString(" "), "s"))
      .toDF("doc_id", "text", "source")
    val fit = TextIndex.zipfFit(flat, 20).collect().head
    // every count is 1 → y is constant 0 → slope exactly 0
    assert(fit.getAs[Double]("slope") === 0.0, fit.toString)
  }

  test("qualityPercentile: per-source median gate, tokenless doc scores 0") {
    val scored = Seq(
      (0L, "the of and to in", "s0"), // all stopwords -> score 1.0
      (1L, "alpha beta gamma delta", "s0"), // no stopwords -> score 0
      (2L, "the alpha", "s0"), // score 0.5
      (3L, "", "s1") // tokenless -> score 0, sole row -> pr 0, kept at floor 0
    ).toDF("doc_id", "text", "source")
    val kept = Curation.qualityPercentile(scored, 0.5).collect()
    val ids = kept.map(_.getLong(0)).toSet
    // s0 ordering by score: 1 (0.0), 2 (0.5), 0 (1.0) -> pr 0, 0.5, 1.0
    assert(ids === Set(0L, 2L))
    val all = Curation.qualityPercentile(scored, 0.0).collect()
    assert(all.map(_.getLong(0)).toSet === Set(0L, 1L, 2L, 3L))
    assert(all.find(_.getLong(0) == 3L).get.getAs[Double]("score") === 0.0)
  }

  test("quantizeInt8: max saturates to 127, zero vector to zeros, rounding is floor(x+0.5)") {
    val df = Seq(
      (0L, Array(0.5f, -1.0f, 0.25f)),
      (1L, Array(0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val q = df
      .select(col("vec_id"), VectorFunctions.quantizeInt8(col("embedding")).as("q"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1))
      .toMap
    // scale = 127/1.0: 0.5 -> floor(63.5+0.5)=64; -1.0 -> floor(-127+0.5)=-127; 0.25 -> 32
    assert(q(0L) === Seq(64L, -127L, 32L))
    assert(q(1L) === Seq(0L, 0L, 0L))
  }

  test("embeddingContaminationPairs: broadcast side drives pairs, threshold respected") {
    val corpus = Seq(
      (10L, Array(1.0f, 0.0f)),
      (11L, Array(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val bench = Seq((0L, Array(1.0f, 0.1f))).toDF("vec_id", "embedding")
    val pairs = Dedup
      .embeddingContaminationPairs(corpus, bench, 0.5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // bench vector is nearly parallel to corpus 10, orthogonal-ish to 11
    assert(pairs.toSeq === Seq((0L, 10L)))
  }

  test("oovRate: occurrences counted with multiplicity, tokenless docs rate 0.0") {
    // corpus counts: bb=5, aa=4, zz=4 -> top-2 vocab {bb, aa}
    // (aa beats the zz tie on the token tie-break); "zz" is OOV
    val docs = Seq(
      (0L, "aa aa bb zz"), // 4 tokens, 1 oov
      (1L, "zz zz zz aa"), // 4 tokens, 3 oov (multiplicity)
      (2L, "aa bb bb bb bb"), // fully covered
      (3L, " ") // tokenless
    ).toDF("doc_id", "text")
    val out = TextIndex
      .oovRate(docs, 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out(0L) === ((4L, 1L, 0.25)))
    assert(out(1L) === ((4L, 3L, 0.75)))
    assert(out(2L) === ((5L, 0L, 0.0)))
    assert(out(3L) === ((0L, 0L, 0.0)))
  }

  test("bm25TopK: tf and idf both lift rank; no-hit and tokenless docs absent") {
    // N=4, sum_dl=9, avgdl=2.25; df(filter)=2 -> idf 1.0; df(stream)=1 -> idf 7/3
    val docs = Seq(
      (0L, "filter stream filter"), // 2 hits on filter + the rarer stream
      (1L, "filter alpha beta gamma"), // 1 hit, longer doc -> penalized
      (2L, "delta epsilon"),
      (3L, "")
    ).toDF("doc_id", "text")
    val out = TextIndex
      .bm25TopK(docs, Seq("filter", "stream"), 10)
      .collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq === Seq(0L, 1L))
    assert(out.map(_.getAs[Long]("rk")).toSeq === Seq(1L, 2L))
    assert(out.map(_.getAs[Long]("n_hit")).toSeq === Seq(2L, 1L))
    val s = out.map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    // doc0: 1.0*(2*2.2/(2+0.3+0.9*(3/2.25))) + (7/3)*(2.2/(1+0.3+0.9*(3/2.25)))
    assert(math.abs(s(0L) - 3.3105) < 1e-3)
    // doc1: 1.0*(2.2/(1+0.3+0.9*(4/2.25)))
    assert(math.abs(s(1L) - 0.7586) < 1e-3)
  }

  test("bm25TopKFromTerms: terms-as-data reproduces the literal-isin ranking exactly") {
    val docs = Seq(
      (0L, "filter stream filter"),
      (1L, "filter alpha beta gamma"),
      (2L, "delta epsilon")
    ).toDF("doc_id", "text")
    val lit = TextIndex.bm25TopK(docs, Seq("filter", "stream"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val asData = TextIndex
      .bm25TopKFromTerms(docs, Seq("filter", "stream", "stream").toDF("tok"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(asData === lit) // duplicate term rows must not double-count
  }

  test("PRF: expansion term mined from the feedback docs retrieves a doc the seed misses") {
    // Seed = "query". Feedback docs (0, 1) both talk about "expansion";
    // doc 2 contains ONLY "expansion" — invisible to the seed query,
    // retrievable after PRF. Stopword "the" and the seed itself must never
    // be picked as expansion terms despite being frequent in feedback docs.
    val docs = Seq(
      (0L, "query the expansion expansion"),
      (1L, "query the expansion notes"),
      (2L, "expansion expansion expansion"),
      // "notes" recurs here so its rarity (ln idf) cannot outweigh the
      // feedback-frequency of "expansion": w(expansion)=3·ln(4/3)≈0.86 >
      // w(notes)=1·ln(4/2)≈0.69
      (3L, "unrelated notes entirely")
    ).toDF("doc_id", "text")
    val terms = TextIndex
      .prfExpansionTerms(docs, Seq("query"), fbDocs = 2, expTerms = 1)
      .collect()
    assert(terms.map(_.getAs[String]("tok")).toSeq === Seq("expansion"))
    // fb_tf=3 across the 2 feedback docs; df(expansion)=3 of 4 docs → w = 3·ln(4/3)
    assert(math.abs(terms.head.getAs[Double]("w") - 3 * math.log(4.0 / 3.0)) < 1e-6)
    val seedOnly = TextIndex.bm25TopK(docs, Seq("query"), 10)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(!seedOnly.contains(2L))
    val prf = TextIndex.prfBm25TopK(docs, Seq("query"), 10, fbDocs = 2, expTerms = 1)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(prf.contains(2L) && !prf.contains(3L))
  }

  test("linearClassifier: exact decimal score, bias on signal-free docs, sign label") {
    val docs = Seq(
      (0L, "good good good"),
      (1L, "good bad"),
      (2L, "neutral words"),
      (3L, "")
    ).toDF("doc_id", "text")
    val out = TextIndex
      .linearClassifier(
        docs,
        Seq("good" -> BigDecimal("0.500"), "bad" -> BigDecimal("-0.750")),
        BigDecimal("-1.000"))
      .collect()
      .map(r =>
        r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_signal"), r.getAs[Double]("score"), r.getAs[Boolean]("label"))))
      .toMap
    assert(out(0L) === ((3L, 0.5, true)))
    assert(out(1L) === ((2L, -1.25, false)))
    assert(out(2L) === ((0L, -1.0, false)))
    assert(out(3L) === ((0L, -1.0, false)))
  }

  test("substringSearch: trigram candidates verified exactly; scattered grams rejected") {
    val docs = Seq(
      (0L, "the quick brown fox", "s0", 19L),
      // contains every trigram of "brown" but not the substring itself
      (1L, "bro row own nothing here", "s0", 24L),
      (2L, "dark brown shoes", "s1", 16L),
      (3L, "", "s1", 0L),
      (4L, "br", "s1", 2L) // sub-trigram doc: no postings at all
    ).toDF("doc_id", "text", "source", "n_chars")
    val hits = TextIndex
      .substringSearch(docs, "brown")
      .collect()
      .map(_.getLong(0))
      .toSet
    assert(hits === Set(0L, 2L))
  }

  test("substringSearch: multi-word pattern spans token boundaries") {
    val docs = Seq(
      (0L, "vector table scan", "s0", 17L),
      (1L, "vector index table", "s0", 18L) // both words, wrong adjacency
    ).toDF("doc_id", "text", "source", "n_chars")
    val hits = TextIndex.substringSearch(docs, "vector table").collect().map(_.getLong(0))
    assert(hits.toSeq === Seq(0L))
  }

  test("phraseSearch: positional adjacency with multiplicity; non-adjacent terms rejected") {
    val docs = Seq(
      (0L, "vector table scan vector table", "s0", 30L), // phrase twice
      (1L, "vector index table", "s0", 18L), // both terms, not adjacent
      (2L, "table vector", "s0", 12L), // reversed order
      (3L, "x vector table y", "s0", 16L) // once, mid-document
    ).toDF("doc_id", "text", "source", "n_chars")
    val out = TextIndex.phraseSearch(docs, "vector table")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(0L -> 2L, 3L -> 1L))
  }

  test("phraseSearch: single-term phrase degenerates to term counting") {
    val docs = Seq(
      (0L, "table table table", "s0", 17L),
      (1L, "no match here", "s0", 13L)
    ).toDF("doc_id", "text", "source", "n_chars")
    val out = TextIndex.phraseSearch(docs, "table")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(0L -> 3L))
  }

  test("searchSnippets: fixed window around the first hit; near-start clamps to 1") {
    val pad = "z" * 40
    val docs = Seq(
      (0L, s"$pad vector table $pad", "s0", 95L), // mid-document match
      (1L, "vector table tail", "s0", 17L), // match at position 1: clamp
      (2L, "no hits here at all", "s0", 19L)
    ).toDF("doc_id", "text", "source", "n_chars")
    val out = TextIndex
      .searchSnippets(docs, "vector table", ctx = 5)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2))))
      .toMap
    assert(out.keySet === Set(0L, 1L))
    // window = 2·5 + 12 = 22 chars starting 5 before the match
    assert(out(0L) === ((42L, "zzzz vector table zzzz")))
    // pos 1: start clamps to 1, still a 22-char slice from the doc head
    assert(out(1L) === ((1L, "vector table tail")))
  }

  test("bpeTrain: greedy weighted merges, overlap handled left-to-right, early stop") {
    // words: aaab×2, ab×1. Round 1: (a,a) weight 4 beats (a,b) weight 3;
    // the merge inside "a a a b" is greedy-left → "aa a b" (NOT "a aa b").
    // Round 2: (a,b) weight 3 beats (aa,a) weight 2. Round 3: (aa,ab)
    // weight 2 is the only pair left. Round 4: no pairs → early stop, so
    // rounds=6 still yields exactly 3 merges.
    val d = Seq((0L, "aaab aaab ab", "s0")).toDF("doc_id", "text", "source")
    val out = TextIndex.bpeTrain(d, 6)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .sortBy(_._1)
    assert(out === Seq(
      (1, "a", "a", "aa", 4L),
      (2, "a", "b", "ab", 3L),
      (3, "aa", "ab", "aaab", 2L)))
    // empty corpus → zero merges, schema intact
    val empty = TextIndex.bpeTrain(Seq.empty[(Long, String, String)]
      .toDF("doc_id", "text", "source"), 6)
    assert(empty.columns.toSeq === Seq("round", "l", "r", "merged", "n"))
    assert(empty.count() === 0)
  }

  test("bpe: back-to-back pair occurrences merge canonically (aaaa → [aa,aa])") {
    // The replace(" a a ", " aa ") spelling could not see the second
    // occurrence (adjacent matches share one delimiter space) and left
    // [aa,a,a]. The fold form merges scan-left like reference BPE.
    val d = Seq((0L, "aaaa", "s0")).toDF("doc_id", "text", "source")
    val seg = TextIndex.bpeSegment(d, 1).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(seg("aaaa") === 2L)
    val out = TextIndex.bpeTrain(d, 2).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(4)))
      .sortBy(_._1)
    assert(out === Seq((1, "a", "a", 3L), (2, "aa", "aa", 1L)))
  }

  test("sparseTfidfPairs: hand-computed quantized weights; capped/singleton terms never join") {
    // N=4. df: x=2, y=2, z=2 kept; q (df=1) dropped. wq = (tf·4·10) div df:
    // x@d0=40, x@d1=20, y@d0=20, y@d2=20, z@d1=20, z@d2=20.
    // dots: (0,1)=40·20=800 via x; (0,2)=400 via y; (1,2)=400 via z.
    val d = Seq(
      (0L, "x x y", "s"), (1L, "x z", "s"), (2L, "y z", "s"), (3L, "q", "s")
    ).toDF("doc_id", "text", "source")
    val out = TextIndex.sparseTfidfPairs(d, 100L, 30)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq((0L, 1L, 1L, 800L), (0L, 2L, 1L, 400L), (1L, 2L, 1L, 400L)))
    // a df-cap of 1 excludes every shared term -> no pairs at all
    assert(TextIndex.sparseTfidfPairs(d, 1L, 30).count() === 0L)
    val p = TextIndex.sparseTfidfPairs(d, 100L, 30)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"plan:\n$p") // term-keyed join, never all-pairs
  }

  test("bpeEncode: per-doc token counts under the trained vocab; 1-char words; empty docs") {
    // training on THIS corpus runs 4 merges then exhausts: (a,a) n=6,
    // (a,b) n=4, (aa,ab) n=3, (b,a) n=1 — so "aaab"/"ab"/"ba" each
    // collapse to 1 symbol; "x" (single char, excluded from training)
    // counts 1 via the encode-side fallback; rounds=6 > 4 exercises the
    // early-stop path end to end.
    val d = Seq(
      (0L, "aaab aaab ab", "s0"), // 3 words → 1+1+1 = 3 tokens
      (1L, "ba x aaab", "s0"), // 1+1+1 = 3 tokens
      (2L, "", "s0") // empty doc → (0, 0), not dropped
    ).toDF("doc_id", "text", "source")
    val out = TextIndex.bpeEncode(d, 6)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(out === Map(0L -> ((3L, 3L)), 1L -> ((3L, 3L)), 2L -> ((0L, 0L))))
  }
}
