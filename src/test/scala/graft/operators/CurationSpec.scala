package graft.operators

import graft.SparkSpec

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("curation: dedup keeps lowest id, quality and stopword gates drop the rest") {
    val docs = Seq(
      (10L, "the quick brown fox jumps over the lazy dog and more words here"),
      (3L, "THE quick brown fox jumps over the lazy dog and more words here"), // dup of 10 (normalized)… different case
      (4L, "too short"), // fails minTokens
      (5L, "alpha beta gamma delta epsilon zeta eta theta iota kappa") // no stopwords
    ).toDF("doc_id", "text")
    val kept = Curation.curate(docs).collect().map(_.getLong(0)).toSet
    assert(kept === Set(3L)) // 3 < 10 wins the fingerprint group; 4 and 5 gated out
  }

  test("sourceTemperatureShares: big sources damped below raw share, small boosted above") {
    // n = {a: 100, b: 1}: raw shares 100/101 vs 1/101; α=1/2 shares
    // 10/11 vs 1/11 — a damped (boost < 1), b boosted (> 1); temp shares
    // sum to 1.
    val docs = (Seq.fill(100)("a") ++ Seq("b")).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "source")
    val out = Curation.sourceTemperatureShares(docs)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(math.abs(out("a").getAs[Double]("share_temp") - 10.0 / 11) < 1e-5)
    assert(math.abs(out("b").getAs[Double]("share_temp") - 1.0 / 11) < 1e-5)
    assert(out("a").getAs[Double]("boost") < 1.0)
    assert(out("b").getAs[Double]("boost") > 1.0)
    val sumT = out.values.map(_.getAs[Double]("share_temp")).sum
    assert(math.abs(sumT - 1.0) < 1e-5)
  }

  test("ipfRake: column marginals hit target exactly after the column pass; weights positive") {
    // 2×2 skewed table: sources a (30+10) and b (10+10); uniform targets =
    // 30 mass per axis value. After row+column passes every LANG's weighted
    // mass equals 60/2 = 30 exactly (the column pass divides by its own
    // achieved sum); the row masses show the residual drift.
    val docs = (
      Seq.fill(30)(("a", "en")) ++ Seq.fill(10)(("a", "de")) ++
        Seq.fill(10)(("b", "en")) ++ Seq.fill(10)(("b", "de"))
    ).zipWithIndex.map { case ((s, l), i) => (i.toLong, s, l) }
      .toDF("doc_id", "source", "lang")
    val out = Curation.ipfRake(docs).collect()
    assert(out.length === 4)
    assert(out.forall(_.getAs[Double]("weight") > 0.0))
    val colMass = out
      .groupBy(_.getString(1))
      .view.mapValues(_.map(r => r.getAs[Double]("weight") * r.getAs[Long]("n_docs")).sum)
      .toMap
    for ((_, m) <- colMass) assert(math.abs(m - 30.0) < 1e-4, colMass.toString)
    // the skewed source a keeps more mass than b after the column pass
    val rowMass = out.map(r => r.getString(0) -> r.getAs[Double]("source_mass_after")).toMap
    assert(rowMass("a") !== rowMass("b"))
  }

  test("filterFunnel: each doc attributed to its FIRST failing stage, survivors to kept") {
    val good = "the view of and to in is on for it " +
      ("alpha beta gamma delta " * 5) // 30 words, sane lengths, stopwords
    val docs = Seq(
      // fails lang (would also fail word count — attribution must pick lang)
      (0L, "zh", "web", "short"),
      (1L, "en", "web", "too few words"), // word count
      (2L, "en", "web", ("supercalifragilisticexpialidocious " * 25).trim), // mean wlen
      (3L, "en", "web", ("the of and to " + "#### @@@@ $$$$ %%%% " * 5).trim), // symbol ratio
      (4L, "en", "books", ("alpha beta gamma delta " * 6).trim), // no stopwords
      (5L, "en", "books", good) // kept
    ).toDF("doc_id", "lang", "source", "text")
    val got = Curation.filterFunnel(docs)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === Map(
      ("web", "1_lang") -> 1L,
      ("web", "2_word_count") -> 1L,
      ("web", "3_mean_wlen") -> 1L,
      ("web", "4_symbol") -> 1L,
      ("books", "5_stopword") -> 1L,
      ("books", "kept") -> 1L), got.toString)
  }

  test("stratifiedSample: small strata pass whole, large strata shrink to ~target, rerun-stable") {
    val rows = (0L until 2000L).map(i => (i, "big")) ++ (10000L until 10020L).map(i => (i, "rare"))
    val df = rows.toDF("event_id", "event_type")
    val out = Curation.stratifiedSample(df, "event_type", "event_id", 100L)
    val byStratum = out.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStratum("rare") === 20L) // n_total <= target: kept whole
    // binomial around 100 at rate 100/2000; bound loosely but meaningfully
    assert(byStratum("big") > 60L && byStratum("big") < 140L)
    // deterministic: identical membership on rerun
    val a = out.select("event_id").collect().map(_.getLong(0)).toSet
    val b = Curation.stratifiedSample(df, "event_type", "event_id", 100L)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(a === b)
    // nested: shrinking target only removes rows, never adds
    val smaller = Curation.stratifiedSample(df, "event_type", "event_id", 50L)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(smaller.subsetOf(a))
  }

  test("shardManifest: covers every doc, shards in range, rerun-identical") {
    val docs = (0L until 100L).map(i => (i, s"word$i more text here")).toDF("doc_id", "text")
    val m = Curation.shardManifest(docs, 8).collect()
    assert(m.map(_.getLong(1)).sum === 100L) // every doc lands in exactly one shard
    assert(m.map(_.getLong(3)).sum === (0L until 100L).sum) // id checksum conserved
    assert(m.forall(r => r.getLong(0) >= 0L && r.getLong(0) < 8L))
    val again = Curation.shardManifest(docs, 8).collect()
    assert(
      m.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet ===
        again.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet)
  }

  test("sourceMix: budget caps each source, first doc always kept") {
    val docs = Seq(
      (1L, "five tokens in this doc", "s1"),
      (2L, "five tokens in this doc", "s1"),
      (3L, "five tokens in this doc", "s1"),
      (10L, "a very long single document that blows straight through the budget on its own easily", "solo")
    ).toDF("doc_id", "text", "source")
    val out = Curation
      .sourceMix(docs, 8L)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // 3 docs x 5 tokens, budget 8: kept while tokens-before < 8 -> exactly 2 kept
    assert(out("s1") === ((3L, 2L, 10L)))
    // a single over-budget doc is still kept (greedy fill keeps the first doc)
    assert(out("solo")._2 === 1L)
  }

  test("importanceResample: rates nest pointwise, weight-1 docs survive full rate, no shuffle") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    def ids(ppm: Long) =
      Curation.importanceResample(docs, ppm).collect().map(_.getLong(0)).toSet
    val (full, r80, r40) = (ids(1000000L), ids(800000L), ids(400000L))
    assert(full.nonEmpty && r80.nonEmpty)
    // monotone: lowering the rate only removes documents (ablation nesting)
    assert(r80.subsetOf(full) && r40.subsetOf(r80))
    // a doc at the probability-1 cap is kept at full rate regardless of its
    // hash: stop_ratio >= 8% => thr_full = 2^32 > any bucket
    import org.apache.spark.sql.functions._
    val capped = Curation
      .importanceResample(docs, 1000000L)
      .filter(col("thr") === 4294967296L).count()
    assert(capped > 0, "fixture has no probability-1 documents")
    // scan-speed contract: no exchange anywhere in the plan
    val plan = Curation.importanceResample(docs, 800000L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"resample must not shuffle:\n$plan")
  }

  test("sourceWeights: largest source gets 1.0, smaller sources get sqrt-scaled weights") {
    val docs = Seq(
      (1L, "a b c d", "big"), // 4 tokens
      (2L, "a b c d", "big"), // big: 8 total
      (3L, "a b", "small") // small: 2 total
    ).toDF("doc_id", "text", "source")
    val out = Curation
      .sourceWeights(docs)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(out("big") === ((8L, 1.0)))
    assert(out("small")._1 === 2L)
    assert(math.abs(out("small")._2 - 0.5) < 1e-15) // sqrt(2)/sqrt(8) = 1/2
  }

  test("gopherRules: each rule fails independently; the good doc passes all") {
    val good = (1 to 20).map(_ => "word").mkString(" ") + " the of and" // 23 words, 2+ stopwords
    val tooShort = "the of tiny words here" // 5 words < 20
    val symbols = (1 to 20).map(_ => "###").mkString(" ") + " the of" // symbol_ratio 20/22 > 0.1
    val noStop = (1 to 25).map(i => s"w$i").mkString(" ") // 0 distinct stopwords
    val longWords = (1 to 25).map(_ => "a" * 12).mkString(" ") + " the of" // mean_wlen > 10
    val docs = Seq(
      (1L, good, "s"), (2L, tooShort, "s"), (3L, symbols, "s"),
      (4L, noStop, "s"), (5L, longWords, "s"), (6L, "", "s")
    ).toDF("doc_id", "text", "source")
    val out = Curation
      .gopherRules(docs)
      .collect()
      .map(r => r.getLong(0) -> r.getBoolean(6))
      .toMap
    assert(out === Map(1L -> true, 2L -> false, 3L -> false, 4L -> false, 5L -> false, 6L -> false))
    val g = Curation.gopherRules(docs).filter($"doc_id" === 1L).collect().head
    assert(g.getLong(2) === 23L) // n_words
    assert(g.getLong(5) >= 2L) // distinct stopwords
  }
}
