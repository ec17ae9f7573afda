package graft

import org.apache.spark.sql.DataFrame

/** Regression guard for the scale-critical plan shapes the Scaladocs claim.
  * These assert against the physical plan text on sf0.001 — if an optimizer
  * change, a lost broadcast hint, or a careless refactor re-introduces a
  * shuffle (or a single-partition window), the claim breaks here and not at
  * 100 TB.
  */
class PlanShapeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString

  private def exchanges(p: String): Int =
    "(?<!Reused)Exchange".r.findAllIn(p).size

  test("q_asof_join: one pre-agg, one window shuffle, one output sort — no range join") {
    val p = plan("q_asof_join")
    assert(exchanges(p) === 3, s"expected 3 exchanges, plan:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("Window"))
  }

  test("dropNearDuplicates: drop list broadcasts; anti join never shuffles the corpus") {
    import graft.operators.Dedup
    import graft.sources.Tables
    val docs = Tables.documents(spark, dir)
    val out = Dedup.dropNearDuplicates(docs, Dedup.ngramJaccardPairs(docs, 0.3))
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"), s"plan:\n$p")
  }

  test("signature kernels participate in whole-stage codegen (span not split)") {
    import org.apache.spark.sql.functions.col
    // A CodegenFallback expression would exclude its ProjectExec from the
    // WholeStageCodegen wrapper (no '*' prefix), splitting the scan→project
    // span on every text path. The kernels codegen as compiled-kernel calls.
    val df = graft.sources.Tables
      .documents(spark, dir)
      .select(
        graft.functions.TextFunctions.tokenCount(col("text")).as("nt"),
        graft.functions.TextFunctions.normalizeUnicode(col("text")).as("norm"))
    val p = df.queryExecution.executedPlan.toString
    for (kernel <- Seq("graft_tokens", "graft_normalize_unicode")) {
      val projLine = p.linesIterator
        .find(_.contains(kernel))
        .getOrElse(fail(s"no $kernel in plan:\n$p"))
      assert(projLine.trim.startsWith("*"), s"$kernel Project not codegen'd:\n$p")
    }
  }

  test("q_ann_filtered: the metadata predicate reaches the embeddings scan as a pushed filter") {
    // The pre-filter strategy's whole point: the selective predicate shrinks
    // the corpus AT THE SCAN, before the quadratic re-rank stage sees it.
    val p = plan("q_ann_filtered")
    assert(p.contains("PushedFilters: [") && p.contains("In(label"),
      s"label predicate not pushed to the scan:\n$p")
  }

  test("pageRank round over the bucketed adjacency: strictly fewer exchanges " +
    "than over plain edges — the edge side joins bucket-aligned") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val plainDir = java.nio.file.Files.createTempDirectory("graft-psr-plain").toString
    val pairs = Seq(("a", "b"), ("b", "a"), ("a", "c"), ("c", "a"), ("b", "c"), ("c", "b"))
      .toDF("src", "dst")
    pairs.write.mode("overwrite").parquet(plainDir)
    // a prior JVM's warehouse dir survives while the in-memory catalog
    // does not — clear the stale location before the CREATE
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), "psr_bucketed_edges")
    val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
    if (!spark.catalog.tableExists("psr_bucketed_edges") && fs.exists(loc))
      fs.delete(loc, true)
    pairs.write.mode("overwrite").bucketBy(32, "src").sortBy("src")
      .saveAsTable("psr_bucketed_edges")
    def roundExchanges(e: DataFrame): Int = {
      val deg = e.groupBy(col("src").as("node")).agg(count(lit(1)).cast("long").as("deg"))
      val ranks = deg.select(col("node"), lit(1000000L).as("pr"), col("deg"))
      exchanges(graft.operators.Analytics.pageRankRound(e, deg, ranks)
        .queryExecution.executedPlan.toString)
    }
    val plain = roundExchanges(spark.read.parquet(plainDir))
    val bucketed = roundExchanges(spark.table("psr_bucketed_edges"))
    assert(bucketed < plain,
      s"bucketed round must shuffle strictly less (bucketed=$bucketed, plain=$plain)")
  }

  test("filteredTopKAuto: each auto-picked lane keeps its pruning — pushed " +
    "predicate on the pre lane, cell probe + broadcast hit list on the post lane") {
    import org.apache.spark.sql.functions.col
    val e = graft.sources.Tables.embeddings(spark, dir)
    val q = e.filter(col("vec_id") < 8)
    // selective predicate → exact pre-filter lane: the predicate must reach
    // the scan, and no IVF cell-probe explode may appear
    val pre = graft.operators.SimilaritySearch
      .filteredTopKAuto(q, e, col("label").isin(3, 9), 10)
      .queryExecution.executedPlan.toString
    assert(pre.contains("PushedFilters: [") && pre.contains("In(label"),
      s"pre lane lost its scan pushdown:\n$pre")
    assert(!pre.contains("Generate"), s"selective predicate picked the index lane:\n$pre")
    // loose predicate → post-filter lane over the index plan: the cell
    // explode proves the IVF lane ran, the hit list joins by broadcast
    val post = graft.operators.SimilaritySearch
      .filteredTopKAuto(q, e, col("label") =!= 3, 10)
      .queryExecution.executedPlan.toString
    assert(post.contains("Generate"), s"loose predicate picked the scan lane:\n$post")
    assert(post.contains("BroadcastHashJoin"), s"hit list not broadcast:\n$post")
  }

  test("q_text_index_search: the query terms reach the postings scan as a " +
    "pushed filter — a search reads posting slices, never the corpus — and " +
    "the positional column is pruned from the scoring scan") {
    val p = plan("q_text_index_search")
    assert(p.contains("PushedFilters: [") && p.contains("In(tok"),
      s"term predicate not pushed to the postings scan:\n$p")
    assert(!p.contains("documents.parquet"),
      s"persisted search must not re-tokenize the corpus:\n$p")
    assert(!p.contains("positions"),
      s"BM25 scoring must not read the positional column:\n$p")
  }

  test("AsOf lanes keep the live lanes' pruning: pinned text search pushes " +
    "its term filter; pinned minhash candidates keep the bucket semi-join") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // text: searchAsOf shares searchState with the live lane — assert the
    // pinned plan still reads posting slices via a pushed tok filter
    val txt = java.nio.file.Files.createTempDirectory("graft-plan-asof-txt").toString
    graft.operators.TextSearchIndex.build(
      Seq((0L, "vector stream", "s"), (1L, "table scan", "s"))
        .toDF("doc_id", "text", "source"), txt)
    val g = graft.operators.IndexManifest.read(spark, txt).get.generation
    val tp = graft.operators.TextSearchIndex
      .searchAsOf(spark, txt, Seq("vector", "stream"), 10, g)
      .queryExecution.executedPlan.toString
    assert(tp.contains("PushedFilters: [") && tp.contains("In(tok"),
      s"pinned search lost the pushed term filter:\n$tp")
    // minhash: candidatesAsOf shares candidatesState — assert the pinned
    // plan still prunes index rows to the probe's buckets (a semi join,
    // never a full index scan feeding the estimate join)
    val mh = java.nio.file.Files.createTempDirectory("graft-plan-asof-mh").toString
    graft.operators.Dedup.minhashIndexBuild(
      Seq((0L, "the quick brown fox jumps high"), (1L, "pack my box with jugs"))
        .toDF("doc_id", "text"), mh)
    val mg = graft.operators.IndexManifest.read(spark, mh).get.generation
    val mp = graft.operators.Dedup
      .minhashIndexCandidatesAsOf(
        Seq((9L, "the quick brown fox jumps high")).toDF("doc_id", "text"), mh, mg)
      .queryExecution.executedPlan.toString
    assert(mp.contains("LeftSemi"), s"pinned candidates lost the bucket prune:\n$mp")
  }

  test("q_text_index_phrase: each term's posting slice arrives via a pushed " +
    "equality filter; no corpus scan, no cartesian") {
    val p = plan("q_text_index_phrase")
    assert(p.contains("EqualTo(tok,vector") || p.contains("EqualTo(tok, vector"),
      s"term equality not pushed to the postings scan:\n$p")
    assert(!p.contains("documents.parquet"), s"phrase must serve from the index:\n$p")
    assert(!p.contains("CartesianProduct"), s"plan:\n$p")
  }

  test("q_hybrid_rrf: lanes fuse head-sized — text lane broadcast, no cartesian") {
    val p = plan("q_hybrid_rrf")
    assert(!p.contains("CartesianProduct"), s"plan:\n$p")
    // the shared text hit list replicates via broadcast, never a shuffle
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"text lane not broadcast:\n$p")
  }

  test("q_prf_expansion: expansion terms ride as a broadcast table in the pre-shuffle cut") {
    // The terms-as-data re-query must keep bm25's shape: the exploded token
    // stream is cut to query-term hits by a BROADCAST (semi) join before
    // any exchange — a shuffled term join or a cartesian would scale with
    // the corpus token stream instead of the term table.
    val p = plan("q_prf_expansion")
    assert(p.contains("BroadcastHashJoin"), s"term table not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"plan:\n$p")
  }

  test("q5_local_volume: dims broadcast, facts hash-join, no cartesian/nested-loop") {
    val p = plan("q5_local_volume")
    assert(p.contains("BroadcastHashJoin"), s"dim chain not broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), s"plan:\n$p")
  }

  test("q10_returned: R-flag filter pushed to the lineitem scan; dims broadcast") {
    val p = plan("q10_returned")
    assert(p.contains("BroadcastHashJoin"), s"dims not broadcast:\n$p")
    // the return-flag equality must reach the parquet scan as a pushed filter
    assert(p.contains("PushedFilters: [") && p.contains("EqualTo(l_returnflag,R)"),
      s"l_returnflag not pushed:\n$p")
  }

  test("stats family: value-grid aggregate feeds the bounded window; scalars broadcast; no cartesian") {
    for (q <- Seq("q_drift_ks", "q_effect_size", "q_chi2_independence", "q_ipf_rake",
        "q_source_temperature")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q plan:\n$p")
      // the only nested-loop joins allowed are the 1-row scalar broadcasts
      val hashAgg = p.contains("HashAggregate")
      assert(hashAgg, s"$q lost its map-side-combined grid aggregate:\n$p")
    }
    // the KS/U windows must consume the (value-grid) AGGREGATE, not raw
    // rows: a Window directly over a FileScan would be corpus-sized.
    for (q <- Seq("q_drift_ks", "q_effect_size")) {
      val p = plan(q)
      val winIdx = p.indexOf("Window")
      assert(winIdx >= 0, s"$q has no window:\n$p")
      assert(p.substring(winIdx).contains("HashAggregate"),
        s"$q window not fed by the grid aggregate:\n$p")
    }
  }

  test("q_dedup_semantic: the pairwise stage is cell-keyed, never a cartesian; anti join broadcast") {
    val p = plan("q_dedup_semantic")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"all-pairs leak outside the k-means cells:\n$p")
    assert(p.contains("LeftAnti"), s"survivor filter not an anti join:\n$p")
  }

  test("q4_order_priority: EXISTS spelled as a semi join, never a full join+distinct") {
    val p = plan("q4_order_priority")
    assert(p.contains("LeftSemi"), s"no semi join:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), s"plan:\n$p")
  }

  test("q6_forecast_revenue: no join, and the date window reaches the parquet scan") {
    val p = plan("q6_forecast_revenue")
    assert(!p.contains("Join"), s"scan-side aggregate grew a join:\n$p")
    // at least the shipdate bounds must be pushed (cents/quantity are exprs)
    assert(p.contains("PushedFilters: [") && p.contains("l_shipdate"),
      s"l_shipdate bounds not pushed:\n$p")
  }

  test("q7/q8: nation chains collapse to broadcasts; no cartesian anywhere") {
    for (q <- Seq("q7_volume_shipping", "q8_market_share")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q dims not broadcast:\n$p")
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q plan:\n$p")
    }
  }

  test("q18_large_orders: fact reduced before the dimension joins; top-k not a global sort") {
    val p = plan("q18_large_orders")
    // TakeOrderedAndProject = limit fused into the sort, never a full sort
    assert(p.contains("TakeOrderedAndProject"), s"LIMIT not fused:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"customer not broadcast:\n$p")
  }

  test("q19_disjunctive: part hull broadcast; the OR block stays a hash-join residual") {
    val p = plan("q19_disjunctive")
    assert(p.contains("BroadcastHashJoin"), s"part not broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), s"plan:\n$p")
  }

  test("q21_waiting_supplier: the EXISTS/NOT-EXISTS pair is a semi+anti join pair") {
    val p = plan("q21_waiting_supplier")
    assert(p.contains("LeftSemi"), s"no semi join:\n$p")
    assert(p.contains("LeftAnti"), s"no anti join:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), s"plan:\n$p")
  }

  test("q22_dormant_customers: 1-row scalar broadcast + anti join, no nested loop over pool") {
    val p = plan("q22_dormant_customers")
    assert(p.contains("LeftAnti"), s"no anti join:\n$p")
    // the scalar (s_sum, n_pos) rides a broadcast — the only nested-loop
    // allowed is that 1-row cross join
    val bnl = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(bnl <= 1, s"unexpected nested-loop joins:\n$p")
    assert(!p.contains("CartesianProduct"), s"plan:\n$p")
  }

  test("bpe: per-round state is the checkpointed vocab table, not a corpus re-derivation") {
    import graft.operators.TextIndex
    import graft.sources.Tables
    // After training, the segmentation frame must read the (vocab-sized)
    // localCheckpoint — a FileScan here would mean every round re-reads
    // and re-tokenizes the corpus, turning R rounds into R corpus scans.
    val p = TextIndex.bpeSegment(Tables.documents(spark, dir), 3)
      .queryExecution.executedPlan.toString
    assert(p.contains("ExistingRDD") || p.contains("Scan ExistingRDD"), s"plan:\n$p")
    assert(!p.contains("FileScan"), s"corpus re-scan in post-training plan:\n$p")
  }

  test("q_bpe_encode: corpus joins the vocab segmentation table by broadcast") {
    val p = plan("q_bpe_encode")
    assert(p.contains("BroadcastHashJoin"), s"vocab join not broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), s"plan:\n$p")
  }

  test("q_dedup_incremental: bloom probe guards the exact stage; drop sets broadcast") {
    val p = plan("q_dedup_incremental")
    assert(p.contains("graft_bloom_might_contain"), s"bloom prune missing:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"status-assembly joins not broadcast:\n$p")
  }

  test("q_train_order: permutation windows per shard — never a single-partition sort") {
    val p = plan("q_train_order")
    assert(p.contains("Window") && p.contains("hashpartitioning(shard"), s"plan:\n$p")
    assert(exchanges(p) === 2, s"expected shard shuffle + output sort only, plan:\n$p")
  }

  test("q_length_buckets: text-only scan, map-side combine, one O(buckets) shuffle") {
    val p = plan("q_length_buckets")
    assert(p.contains("partial_count"), s"no map-side combine:\n$p")
    assert(p.contains("ReadSchema: struct<text:string>"), s"scan not pruned to text:\n$p")
    assert(exchanges(p) === 2, s"expected agg shuffle + output sort only, plan:\n$p")
  }

  test("q_dedup_paragraphs: min-owner combines map-side; chunk space never goes pairwise") {
    val p = plan("q_dedup_paragraphs")
    assert(p.contains("partial_min"), s"owner agg not map-side combined:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), s"plan:\n$p")
  }

  test("q_range_join: unkeyed interval predicate runs as an equi-join on bins") {
    val p = plan("q_range_join")
    assert(
      !p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join fell back to a nested-loop shape:\n$p")
  }

  test("q_pack_sequences: packing window is per-shard, not a global sort") {
    val p = plan("q_pack_sequences")
    assert(p.contains("hashpartitioning(shard"), s"plan:\n$p")
  }

  test("q_term_freq: top-k stays distributed (TakeOrderedAndProject, partial agg)") {
    val p = plan("q_term_freq")
    assert(p.contains("TakeOrderedAndProject"), s"plan:\n$p")
    assert(exchanges(p) === 1, s"expected exactly the one count shuffle, plan:\n$p")
  }

  test("fused pivot shuffles strictly less than the dense-grid pivot") {
    def planOf(df: DataFrame) = df.queryExecution.executedPlan.toString
    val fused = exchanges(planOf(SparkEntry.queries("q_pivot_fused")(spark, dir)))
    val dense = exchanges(planOf(SparkEntry.queries("q_pivot_export")(spark, dir)))
    assert(fused < dense, s"fused=$fused dense=$dense")
  }

  test("contaminationPairs: benchmark side broadcasts; no cartesian stage") {
    import org.apache.spark.sql.functions.col
    import graft.operators.Dedup
    import graft.sources.Tables
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val bench = docs
      .filter(col("doc_id") % 97 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val p = Dedup.contaminationPairs(docs, bench, 0.3).queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"plan:\n$p")
    assert(!p.contains("CartesianProduct"), s"plan:\n$p")
  }

  test("q_daily_energy: dense-grid shape — 5 bounded shuffles, explode for the day delta") {
    // Audited after the r2 bench flagged a 2.5× driver-box number: the plan
    // had not changed (contention, not a regression). Pin it so a real
    // change breaks here: first-wins dedup shuffles only WindowGroupLimit-
    // pruned rows; dim row_key + multiplier aggs each shuffle once and then
    // broadcast; wide-row assembly shuffles once; output sort ranges once.
    val p = plan("q_daily_energy")
    val shuffles = "Exchange (hash|range|Single)".r.findAllIn(p).size
    assert(shuffles === 5, s"expected 5 shuffles, plan:\n$p")
    // first-wins dedup is an argmin aggregate (map-side combine, no sort) —
    // a Window/WindowGroupLimit here means the sort-based form crept back
    assert(p.contains("min_by"), s"first-wins lost its partial argmin agg, plan:\n$p")
    assert(!p.contains("WindowGroupLimit"), s"first-wins regressed to a sorted window, plan:\n$p")
    assert(p.contains("Generate"), s"date spine should be an explode, plan:\n$p")
    assert(
      "BroadcastHashJoin".r.findAllIn(p).size === 2,
      s"dim + multiplier joins must broadcast, plan:\n$p")
  }

  test("q_dedup_embedding_lsh: bucketed candidates only — no cartesian stage") {
    val p = plan("q_dedup_embedding_lsh")
    assert(
      !p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"plan:\n$p")
  }

  test("q_broadcast_join: dimension stays broadcast under the hint") {
    val p = plan("q_broadcast_join")
    assert(p.contains("BroadcastHashJoin"), s"plan:\n$p")
  }

  test("stratifiedSample: threshold table broadcasts; the sampled corpus is never shuffled") {
    import graft.operators.Curation
    import graft.sources.Tables
    import org.apache.spark.sql.functions.col
    val ev = Tables.events(spark, dir).select(col("event_id"), col("event_type"))
    val p = Curation.stratifiedSample(ev, "event_type", "event_id", 500L)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"plan:\n$p")
    // exactly one SHUFFLE exchange — the tiny per-stratum count agg (the
    // threshold table's BroadcastExchange is expected); a second shuffle
    // would mean the corpus side started moving
    val shuffles = "Exchange (hash|range|Single)".r.findAllIn(p).size
    assert(shuffles === 1, s"expected only the count shuffle, plan:\n$p")
  }

  test("q_embed_contamination: benchmark broadcasts; the corpus side never shuffles") {
    val p = plan("q_embed_contamination")
    assert(p.contains("BroadcastNestedLoopJoin"), s"plan:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"), s"plan:\n$p")
    // only the verify-output sort moves rows; a hash shuffle would mean the
    // corpus stopped streaming through the broadcast join
    val shuffles = "Exchange (hash|Single)".r.findAllIn(p).size
    assert(shuffles === 0, s"expected no hash shuffle, plan:\n$p")
  }

  test("q_vocab: corpus-wide count is cut by TakeOrderedAndProject before the id window") {
    val p = plan("q_vocab")
    assert(p.contains("TakeOrderedAndProject"), s"plan:\n$p")
    // the id-assignment window must sit above the top-k cut (k rows), not
    // above the full vocabulary
    assert(
      p.indexOf("Window") < p.indexOf("TakeOrderedAndProject"),
      s"window should consume the top-k cut, plan:\n$p")
  }

  test("q_tfidf_topk: per-doc window; corpus count broadcasts as a single row") {
    val p = plan("q_tfidf_topk")
    assert(p.contains("hashpartitioning(doc_id"), s"plan:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"), s"plan:\n$p")
  }

  test("q_dedup_spans: windows shuffle as long hashes via the native kernel, no cartesian") {
    val p = plan("q_dedup_spans")
    // candidate generation must come from the hashed-window kernel, not a
    // string-materializing transform+concat_ws composition
    assert(p.contains("graft_ngram_hashes"), s"plan:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), s"plan:\n$p")
  }

  test("q_shard_manifest: one partial-aggregated shuffle, nothing else moves") {
    val p = plan("q_shard_manifest")
    // partial_count/partial_sum on the map side, then exactly the manifest
    // agg exchange + the verify-output sort
    assert(p.contains("partial_"), s"plan:\n$p")
    val shuffles = "Exchange (hash|Single)".r.findAllIn(p).size
    assert(shuffles === 1, s"expected only the manifest agg shuffle, plan:\n$p")
  }

  test("q_scd2: one full-outer shuffle join, explode stays row-local above it") {
    val p = plan("q_scd2")
    assert(p.contains("FullOuter"), s"plan:\n$p")
    assert(p.contains("Generate explode"), s"plan:\n$p")
    assert(!p.contains("CartesianProduct"), s"plan:\n$p")
  }

  test("q_length_deciles: only the value histogram funnels to one partition") {
    val p = plan("q_length_deciles")
    // exactly two SinglePartition exchanges, both over the O(distinct
    // values) histogram (cumulative-offset window + 1-row total) — the
    // corpus itself shuffles keyed by value
    assert("Exchange SinglePartition".r.findAllIn(p).size === 2, s"plan:\n$p")
    // the corpus-side rank window is partitioned (by n_chars), not global
    assert(p.contains("row_number() windowspecdefinition(n_chars"), s"plan:\n$p")
    // offsets and the 1-row total reach the corpus as broadcasts
    assert(p.contains("BroadcastHashJoin"), s"plan:\n$p")
  }

  test("q_top_dup_ngrams: 5-gram stream combines map-side, top-20 cut off-driver") {
    val p = plan("q_top_dup_ngrams")
    assert(p.contains("TakeOrderedAndProject(limit=20"), s"plan:\n$p")
    assert(p.contains("partial_count"), s"no map-side combine:\n$p")
  }

  test("q_doc_entropy: token stream collapses on (doc_id, tok) before shuffling") {
    val p = plan("q_doc_entropy")
    assert(p.contains("partial_count"), s"no map-side combine:\n$p")
    assert(exchanges(p) === 3, s"expected tok agg + doc agg + output sort, plan:\n$p")
  }

  test("q_embed_centroid_sim: corpus collapses map-side at (label, pos); pairwise stage is model-sized") {
    val p = plan("q_embed_centroid_sim")
    // the dim-multiplied stream combines before its one corpus shuffle
    assert(p.contains("partial_sum"), s"no map-side combine:\n$p")
    // label pairing is an equi-join on pos over the tiny centroid table
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), s"plan:\n$p")
  }

  test("q_histogram: value-only scan, row-local bucketing, O(buckets) shuffle") {
    val p = plan("q_histogram")
    assert(p.contains("ReadSchema: struct<value:double>"), s"scan not pruned:\n$p")
    assert(p.contains("partial_count"), s"no map-side combine:\n$p")
    assert(exchanges(p) === 2, s"expected agg shuffle + output sort only, plan:\n$p")
  }

  test("q_diverse_sample: per-cell cap prunes map-side (Partial WindowGroupLimit under the exchange)") {
    val p = plan("q_diverse_sample")
    // each task caps its own cell fragments BEFORE the shuffle, so a hot
    // cell never ships more than cap rows per input partition; the Final
    // pass re-caps after co-location — no full-cell sort-and-buffer
    assert(p.contains("WindowGroupLimit"), s"plan:\n$p")
    assert(
      "WindowGroupLimit .*Partial".r.findFirstIn(p).isDefined ||
        p.contains(", Partial"),
      s"no map-side (Partial) group limit, plan:\n$p")
    assert(exchanges(p) === 2, s"expected cell shuffle + output sort only, plan:\n$p")
    assert(!p.contains("CartesianProduct"), s"plan:\n$p")
  }

  test("q_bm25_topk: term filter precedes the tf shuffle; top-k cut stays distributed") {
    val p = plan("q_bm25_topk")
    // the exploded token stream is cut to the query terms row-locally, so
    // the tf exchange carries O(hits): the IN filter must sit below the
    // first aggregate, and the final cut must be TakeOrderedAndProject
    // (partial top-k per partition), never a global sort of scored docs
    assert(p.contains("TakeOrderedAndProject"), s"plan:\n$p")
    assert(
      p.indexOf("Filter") > p.indexOf("TakeOrderedAndProject"),
      s"term filter should be below (printed after) the top-k cut, plan:\n$p")
    assert(!p.contains("CartesianProduct"), s"plan:\n$p")
    // rank window consumes exactly k rows — above the cut, not the corpus
    assert(p.indexOf("Window") < p.indexOf("TakeOrderedAndProject"), s"plan:\n$p")
  }

  test("q_quality_classifier: weight table broadcasts; corpus shuffles only for the doc roll-up") {
    val p = plan("q_quality_classifier")
    assert(p.contains("BroadcastHashJoin"), s"weights not broadcast:\n$p")
    assert(p.contains("partial_sum"), s"no map-side combine:\n$p")
    // token-stream join + per-doc agg + doc_id outer join + output sort:
    // nothing else may move the corpus
    assert(exchanges(p) <= 4, s"unexpected extra exchange, plan:\n$p")
  }

  test("q_quality_lm: map-side token collapse; the only nested-loop join is the 1-row total") {
    val p = plan("q_quality_lm")
    // (doc_id, tok) counts combine before every exchange
    assert(p.contains("partial_count") || p.contains("partial_sum"), s"no map-side combine:\n$p")
    // the scalar corpus total broadcasts as one row; no other nested-loop
    // or cartesian anywhere (the lp join must be a hash join on tok)
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1, s"plan:\n$p")
    assert(!p.contains("CartesianProduct"), s"plan:\n$p")
    // no corpus-wide single-partition stage: every window/sort here is
    // absent — scoring is pure aggregation until the output orderBy
    assert(!p.contains("Window"), s"unexpected window, plan:\n$p")
  }

  test("q_kv_log_view: resolution window shuffles by cell key, never one partition") {
    val p = plan("q_kv_log_view")
    assert(p.contains("Window"), s"plan:\n$p")
    assert(
      p.contains("hashpartitioning(row_key"),
      s"resolution window must partition by cell key, plan:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), s"plan:\n$p")
  }

  test("corr/regr moments: one map-side-combined aggregate, no join, no window") {
    val p = graft.SparkEntry.queries("q_corr_regr")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(p.contains("partial_sum"), s"moment sums not map-side combined:\n$p")
    assert(!p.contains("Join") && !p.contains("Window"), s"plan:\n$p")
  }

  test("winsorize: band table broadcasts back; no shuffle join of the data") {
    val p = graft.SparkEntry.queries("q_winsorize")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"bands must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"data must not shuffle-join:\n$p")
  }

  test("PCA gram: one kernel generate, two-stage map-side-combined sum, joins only post-agg") {
    import spark.implicits._
    val g = graft.operators.Pca.gram(
      Seq((1L, Array(1.0f, 2.0f))).toDF("vec_id", "embedding"), 2)
    val p = g.queryExecution.executedPlan.toString
    assert(p.contains("partial_sum"), s"gram partials not map-side combined:\n$p")
    // the corpus touches exactly ONE Generate (the kernel's term array);
    // the only join is the broadcast O(d²)×O(d) position-decode after the
    // final aggregate — never a shuffle join, never corpus-sized
    assert(p.split("Generate").length == 2, s"corpus must explode exactly once:\n$p")
    assert(p.contains("graft_gram_terms"), s"kernel missing from plan:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no shuffle join allowed:\n$p")
  }

  test("argmax struct-max: map-side combined, no window over the table") {
    val p = graft.SparkEntry.queries("q_argmax")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(p.contains("partial_max"), s"struct-max not map-side combined:\n$p")
    assert(!p.contains("Window"), s"argmax must not window:\n$p")
  }

  test("attribution interval join: equi key carries the join; time bound is a residual, not a BNLJ") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val ev = Seq((1L, java.sql.Timestamp.valueOf("2024-03-01 10:00:00"), 7L, "click", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val p = graft.streaming.StreamJoin.attribution(ev)
      .queryExecution.executedPlan.toString
    // at 100 TB the user_id equi key must hash-partition the join; an
    // interval-only formulation would degenerate to all-pairs
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), s"plan:\n$p")
  }

  test("quantile rollup: histogram and merge aggs combine map-side; windows never touch events") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val ev = Seq((java.sql.Timestamp.valueOf("2024-01-05 01:00:00"), 3.7))
      .toDF("ts", "value")
    val hists = graft.operators.IncrementalRollup.dailyValueHistograms(ev)
    val ph = hists.queryExecution.executedPlan.toString
    // per-day histogram build: ONE map-side-combined shuffle keyed (day, bin)
    assert(ph.contains("partial_count"), s"histogram build not map-side combined:\n$ph")
    val probe = graft.operators.IncrementalRollup
      .quantileOverRange(hists, "2024-01-01", "2024-01-31", Seq("0.5"))
    val pp = probe.queryExecution.executedPlan.toString
    // range merge: map-side-combined sum over O(days × bins) rows; the only
    // windows and the probe cross join run over O(bins) rows — event rows
    // are never sorted globally and never joined
    assert(pp.contains("partial_sum"), s"range merge not map-side combined:\n$pp")
    assert(!pp.contains("SortMergeJoin"), s"probe must not shuffle-join:\n$pp")
  }

  test("pageRank round: contribution agg combines map-side; no cartesian, no window") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val e = Seq(("a", "b"), ("b", "a"), ("b", "c"), ("c", "b")).toDF("src", "dst")
    val deg = e.groupBy(col("src").as("node")).agg(count(lit(1)).cast("long").as("deg"))
    val ranks = deg.select(col("node"), lit(1000000L).as("pr"), col("deg"))
    val p = graft.operators.Analytics
      .pageRankRound(e, deg, ranks)
      .queryExecution.executedPlan.toString
    // per-round cost at 100 TB: edge-side joins + ONE map-side-combined
    // aggregate keyed by dst — never a global sort/window, never all-pairs
    assert(p.contains("partial_sum"), s"contribution agg not map-side combined:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), s"plan:\n$p")
    assert(!p.contains("Window"), s"unexpected window, plan:\n$p")
  }

  test("q_skipgram: pairs generated row-locally — no join anywhere in the plan") {
    val p = plan("q_skipgram")
    assert(!p.contains("Join"), s"skipgram formed pairs via a join:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-k cut not distributed:\n$p")
    assert(p.contains("partial_count"), s"pair count not map-side combined:\n$p")
  }

  test("q_bpe_pairs: bigrams expand from the vocab aggregate, not the corpus") {
    val p = plan("q_bpe_pairs")
    // Generate (the bigram explode) must sit ABOVE the word-frequency
    // aggregate: exactly one Generate after the first HashAggregate pair.
    val genIdx = p.indexOf("Generate explode")
    val aggIdx = p.indexOf("HashAggregate")
    assert(genIdx >= 0 && aggIdx >= 0, s"plan:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-k cut not distributed:\n$p")
  }

  test("q_fuzzy_match: deletion-neighborhood equi-join — never block-quadratic") {
    val p = plan("q_fuzzy_match")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), s"plan:\n$p")
    // the variant join keys on (blk, v); the old quadratic keyed on blk only
    assert(p.contains("levenshtein"), s"verify kernel missing:\n$p")
  }

  test("q_triangles: no nested-loop anywhere except the 1-row stat assembly") {
    val p = plan("q_triangles")
    assert(!p.contains("CartesianProduct"), s"plan:\n$p")
  }

  test("q_substring_search: candidate gram filter pushes below the postings distinct") {
    val p = plan("q_substring_search")
    assert(p.contains("LeftSemi"), s"verify stage not a semi-join:\n$p")
    // the isin(qGrams) filter must prune the exploded gram stream BEFORE the
    // distinct aggregate, or the full postings table shuffles per query
    assert(p.contains("HashAggregate(keys=[doc_id"), s"postings distinct missing:\n$p")
    assert(p.contains("INSET") || p.contains(" IN ("), s"gram filter missing:\n$p")
  }

  test("q_drift: one corpus-keyed cell aggregate; all marginals model-sized") {
    val p = plan("q_drift")
    assert(p.contains("partial_count"), s"cell count not map-side combined:\n$p")
    assert(!p.contains("CartesianProduct"), s"plan:\n$p")
  }

  test("q_user_anomaly: one user-partitioned window carries all three moments") {
    val p = plan("q_user_anomaly")
    assert("Window ".r.findAllIn(p).size <= 1, s"moments split across windows:\n$p")
    assert(p.contains("hashpartitioning(user_id"), s"window not user-partitioned:\n$p")
  }

  test("q_node_similarity: hub-capped equi-join pairing — no pairwise fallback") {
    val p = plan("q_node_similarity")
    assert(
      !p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"pairing fell back to a pairwise shape:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-20 not cut off-driver:\n$p")
  }

  test("q_boilerplate_chunks: chunk frequency combines map-side on the hash") {
    val p = plan("q_boilerplate_chunks")
    assert(p.contains("partial_count"), s"no map-side combine:\n$p")
    assert(!p.contains("CartesianProduct"), s"plan:\n$p")
  }

  test("q_weighted_sample: priority ranking windows per source, never one partition") {
    val p = plan("q_weighted_sample")
    assert(p.contains("hashpartitioning(source"), s"window not source-partitioned:\n$p")
    assert(!p.contains("SinglePartition"), s"a global window snuck in:\n$p")
  }

  test("q_gaps_islands: window and both aggregates share the user_id partitioning") {
    val p = plan("q_gaps_islands")
    assert(p.contains("hashpartitioning(user_id"), s"window not user-partitioned:\n$p")
    // distinct shuffle + user window shuffle + output sort; both post-window
    // aggregates must reuse the window's user_id exchange
    assert(exchanges(p) <= 3, s"expected <=3 exchanges, plan:\n$p")
  }

  test("q_ab_test: arm reduction is one map-side-combined global aggregate") {
    val p = plan("q_ab_test")
    assert(p.contains("partial_sum"), s"no map-side combine:\n$p")
    assert(exchanges(p) === 1, s"expected the single final-agg exchange, plan:\n$p")
  }

  test("q_interpolate: dense grid + both directional windows stay user-partitioned") {
    val p = plan("q_interpolate")
    assert(p.contains("hashpartitioning(user_id"), s"windows not user-partitioned:\n$p")
    assert(!p.contains("CartesianProduct"), s"plan:\n$p")
  }

  test("q_token_budget: running sum is over the source-level aggregate, not rows") {
    val p = plan("q_token_budget")
    assert(p.contains("partial_sum"), s"source agg not map-side combined:\n$p")
    // the only SinglePartition window input is the |sources|-row aggregate —
    // the corpus itself must never funnel to one partition before reducing
    assert(p.contains("SinglePartition"), s"model-sized window missing:\n$p")
  }

  test("q_benford: digit counts combine map-side; only 9 rows meet the total") {
    val p = plan("q_benford")
    assert(p.contains("partial_count"), s"no map-side combine:\n$p")
    assert(!p.contains("CartesianProduct"), s"plan:\n$p")
  }

  test("bfsRound: relaxation is an equi-join + map-side-combined min, never pairwise") {
    // the checkpointed loop's final plan is an RDD scan; guard the round shape
    import graft.operators.Analytics
    import graft.sources.Tables
    import org.apache.spark.sql.functions._
    val edges = Analytics.coOrderEdges(Tables.lineitem(spark, dir))
    val sym = edges.select(col("a").as("src"), col("b").as("dst"))
      .union(edges.select(col("b").as("src"), col("a").as("dst")))
    val seeds = edges.select(col("a").as("node")).distinct()
      .filter(col("node") % 97 === 0)
      .withColumn("dist", lit(0L))
    val p = Analytics.bfsRound(sym, seeds).queryExecution.executedPlan.toString
    assert(
      !p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"relaxation fell back to a pairwise shape:\n$p")
    assert(p.contains("partial_min"), s"min relaxation not map-side combined:\n$p")
  }

  test("q_degree_dist: both aggregates combine map-side; output is O(log maxdeg)") {
    val p = plan("q_degree_dist")
    assert(p.contains("partial_count"), s"no map-side combine:\n$p")
    assert(!p.contains("CartesianProduct"), s"plan:\n$p")
  }

  test("q_rfm: quintiles assign via broadcast offsets, customers never globally sort") {
    val p = plan("q_rfm")
    assert(p.contains("BroadcastHashJoin"), s"offset table not broadcast:\n$p")
    // per-metric windows partition by the metric value (distributedNtile);
    // a global row_number over customers would show a SinglePartition sort
    // of the full customer frame instead
    assert(p.contains("hashpartitioning(recency") || p.contains("hashpartitioning(freq"),
      s"ntile windows not value-partitioned:\n$p")
  }

  test("q_seasonality: cell and overall aggregates combine map-side; overall broadcasts") {
    val p = plan("q_seasonality")
    assert(p.contains("partial_count"), s"no map-side combine:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"O(types) overall table not broadcast:\n$p")
  }

  test("q_phrase_search: term filters prune postings below the adjacency join") {
    val p = plan("q_phrase_search")
    // each side of the adjacency join must carry a tok-equality filter so
    // the exchange ships O(term hits), not the whole positional index
    assert(p.contains("vector") && p.contains("table"), s"term filters missing:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"adjacency fell back to a pairwise shape:\n$p")
  }

  test("q_assortativity: moment sums combine map-side; one row leaves the graph") {
    val p = plan("q_assortativity")
    assert(p.contains("partial_sum"), s"moments not map-side combined:\n$p")
    assert(!p.contains("CartesianProduct"), s"plan:\n$p")
  }

  test("q_gini: global rank via broadcast offsets — the customer frame never globally sorts") {
    val p = plan("q_gini")
    assert(p.contains("BroadcastHashJoin"), s"offset table not broadcast:\n$p")
    assert(p.contains("hashpartitioning(cents"), s"rank window not value-partitioned:\n$p")
  }

  test("q_gap_histogram: one (type, user) window; bucket counts combine map-side") {
    val p = plan("q_gap_histogram")
    assert(p.contains("hashpartitioning(event_type"), s"window not keyed:\n$p")
    assert(p.contains("partial_count"), s"no map-side combine:\n$p")
  }

  test("q_sample_size: one global aggregate feeds a scalar expression tree") {
    val p = plan("q_sample_size")
    assert(p.contains("partial_count") || p.contains("partial_sum"), s"no map-side combine:\n$p")
    assert(exchanges(p) === 1, s"expected the single final-agg exchange, plan:\n$p")
  }

  test("q_lcc: corner attribution shuffles O(triangles) cells — never wedges, never pairwise") {
    val p = plan("q_lcc")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"plan:\n$p")
    // corner cells combine map-side before the per-node credit exchange
    // (partial_sum of t_add — the deg/oriented/adj subtrees sit behind
    // checkpoints since r11-opt, so theirs are no longer in this plan)
    assert(p.contains("partial_sum"), s"corner credits not map-side combined:\n$p")
    // the credit generator must stay inside whole-stage codegen: a plain
    // posexplode over a long array, never an interpreted higher-order
    // function (ArrayTransform is CodegenFallback — the r11-opt fix)
    assert(p.contains("posexplode"), s"corner generator shape changed:\n$p")
    assert(!p.contains("transform("), s"interpreted HOF back in the hot path:\n$p")
  }

  test("q_k_anonymity: classes collapse map-side; one O(classes) exchange") {
    val p = plan("q_k_anonymity")
    assert(p.contains("partial_count"), s"class sizes not map-side combined:\n$p")
    assert(exchanges(p) === 2, s"expected class agg + 1-row summary only, plan:\n$p")
  }

  test("q_pseudonymize: one distinct exchange; surrogate is a codegen'd projection") {
    val p = plan("q_pseudonymize")
    // distinct agg + output sort — the md5 never forces extra exchanges
    // (the surrogate projection fuses into the final distinct aggregate)
    assert(exchanges(p) === 2, s"expected distinct + output sort only, plan:\n$p")
    assert(p.contains("pseudonym"), s"surrogate not in plan:\n$p")
    assert(p.contains("ReadSchema: struct<user_id:bigint>"), s"scan not pruned:\n$p")
  }

  test("q_readability: projection-only — regex counts never shuffle") {
    val p = plan("q_readability")
    // one output sort (orderBy doc_id); no aggregate/join exchange
    assert(exchanges(p) === 1, s"expected the output-sort exchange only, plan:\n$p")
  }

  test("q_autocorr: daily counts combine map-side; windows stay type-partitioned") {
    val p = plan("q_autocorr")
    assert(p.contains("partial_count"), s"daily counts not map-side combined:\n$p")
    assert(p.contains("hashpartitioning(event_type"), s"lag window not keyed:\n$p")
  }

  test("q_cusum: per-type windows keyed; argmax is one struct-max aggregate") {
    val p = plan("q_cusum")
    assert(p.contains("hashpartitioning(event_type"), s"CUSUM window not keyed:\n$p")
    assert(p.contains("partial_max") || p.contains("max(m"), s"argmax not aggregated:\n$p")
  }

  test("q_interval_coverage: one user-keyed window pass; no interval self-join") {
    val p = plan("q_interval_coverage")
    assert(p.contains("hashpartitioning(user_id"), s"window not user-keyed:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin")
      && !p.contains("SortMergeJoin"), s"interval self-join crept in:\n$p")
  }

  test("q_first_seen: one corpus distinct; day-table window only after O(days) collapse") {
    val p = plan("q_first_seen")
    assert(p.contains("partial_count") || p.contains("partial_min"),
      s"aggregates not map-side combined:\n$p")
    assert(!p.contains("CartesianProduct"), s"plan:\n$p")
  }

  test("q_search_snippets: snippet projection sits above the trigram-index semi-join") {
    val p = plan("q_search_snippets")
    assert(p.contains("LeftSemi"), s"candidate semi-join missing:\n$p")
    assert(p.contains("Contains(text"), s"exact verify filter missing:\n$p")
  }

  test("q_crosscorr: both series from ONE conditional day aggregate; type filter pushed") {
    val p = plan("q_crosscorr")
    assert(p.contains("partial_sum"), s"day counts not map-side combined:\n$p")
    assert(p.contains("PushedFilters: [In(event_type"), s"type filter not pushed:\n$p")
  }

  test("q_neyman_alloc: one moment aggregate; O(strata) rows past the exchange") {
    val p = plan("q_neyman_alloc")
    assert(p.contains("partial_sum") && p.contains("partial_count"),
      s"moments not map-side combined:\n$p")
    // the 1-row weight total joins via broadcast (BNLJ over one row is
    // fine); a CartesianProduct would mean the broadcast hint was lost
    assert(!p.contains("CartesianProduct"), s"plan:\n$p")
  }

  test("q_label_noise: query side broadcasts; the candidate corpus never shuffles for pairing") {
    val p = plan("q_label_noise")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"query side not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"plan:\n$p")
  }

  test("q_split_balance: one cell aggregate; marginals broadcast back onto the cells") {
    val p = plan("q_split_balance")
    assert(p.contains("partial_count"), s"cells not map-side combined:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"marginals not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"plan:\n$p")
  }

  test("q_inverted_index: posting collect runs only below the df cap filter") {
    val p = plan("q_inverted_index")
    assert(!p.contains("CartesianProduct"), s"plan:\n$p")
    assert(p.contains("collect_list"), s"posting aggregate missing:\n$p")
    assert(p.contains("(df"), s"cap filter not present:\n$p")
  }

  test("q_topk_agg: bounded-heap aggregate combines map-side — no Window, no full-data rank") {
    val p = plan("q_topk_agg")
    assert(p.contains("ObjectHashAggregate"), s"typed-imperative agg missing:\n$p")
    assert(p.contains("partial_graft_top_k"), s"heap not map-side combined:\n$p")
    assert(!p.contains("Window"), s"window rank crept back in:\n$p")
  }

  test("q_heavy_hitters_gate: sketch combines map-side; totals broadcast; no cartesian blowup") {
    val p = plan("q_heavy_hitters_gate")
    assert(p.contains("partial_graft_heavy_hitters"), s"MG not map-side combined:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"1-row total not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"plan:\n$p")
  }

  test("partsupp TPC-H shapes: dims broadcast, no cartesian; Q2's per-part min joins by shuffle") {
    for (q <- Seq("q2_min_cost_supplier", "q11_important_stock",
        "q16_supplier_cnt", "q20_promotable_parts")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q dims not broadcast:\n$p")
      assert(!p.contains("CartesianProduct"), s"$q plan:\n$p")
      // q11's HAVING-fraction compare rides a 1-row broadcast total — the
      // suite's standard scalar crossJoin, which plans as a BNLJ; any
      // OTHER nested-loop join would be a lost equi-key.
      if (q != "q11_important_stock")
        assert(!p.contains("BroadcastNestedLoopJoin"), s"$q plan:\n$p")
    }
    // Q16's complaint exclusion must be an anti join, not a NOT IN subplan
    assert(plan("q16_supplier_cnt").contains("LeftAnti"),
      s"q16 exclusion not an anti join:\n${plan("q16_supplier_cnt")}")
  }

  test("q_quality_lm_bigram: row-local bigram generator; no corpus-wide window; V broadcasts") {
    val p = plan("q_quality_lm_bigram")
    // bigram expansion must be a Generate (explode of the row-local
    // transform), never a positions self-join
    assert(p.contains("Generate explode"), s"bigram generator missing:\n$p")
    assert(!p.contains("Window"), s"unexpected window:\n$p")
    assert(!p.contains("CartesianProduct"), s"plan:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"V scalar not broadcast:\n$p")
  }

  test("q_bootstrap_ci: replicate expansion is a row-local generator feeding a " +
    "map-side-combined sum; the tiny CI table broadcasts back") {
    val p = plan("q_bootstrap_ci")
    // the ×R expansion must be a Generate (explode) on the scan side, never
    // a join against a replicate table
    assert(p.contains("Generate explode"), s"replicate explode missing:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"plan:\n$p")
    // integer partial sums combine before the (g, j) exchange
    assert(p.contains("partial_sum"), s"replicate sums not map-side combined:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"CI table not broadcast:\n$p")
  }

  test("cluster-index resolve: the assignments scan reads only the three id " +
    "columns, and the last-writer-wins collapse is map-side combined") {
    import graft.operators.Dedup
    import org.apache.spark.sql.functions.col
    val idx = java.nio.file.Files.createTempDirectory("graft-plan-ci").toString
    Dedup.clusterIndexBuild(
      spark.range(100).select((col("id") * 2).as("a_id"), (col("id") * 2 + 1).as("b_id")),
      idx)
    Dedup.clusterIndexAppend(
      spark.range(5).select((col("id") + 1000L).as("a_id"), (col("id") * 2).as("b_id")), idx)
    val p = Dedup.clusterIndexAssignments(spark, idx)
      .queryExecution.executedPlan.toString
    // column pruning: at 100 TB the assignments table may carry bucketing
    // metadata or future columns — the resolve must stay a 3-column scan
    assert(p.contains("ReadSchema: struct<doc_id:bigint,cluster_id:bigint,seq:bigint>"),
      s"resolve reads more than (doc_id, cluster_id, seq):\n$p")
    // one exchange (the per-doc group-by); partial max_by combines map-side
    assert(exchanges(p) === 1, s"expected exactly 1 exchange, plan:\n$p")
    assert(p.contains("partial_max_by"), s"LWW collapse not map-side combined:\n$p")
  }

  test("graph queries read the persisted edge artifact, never a fresh base-table projection") {
    // q_pagerank's trade graph derives from orders×lineitem and
    // q_communities' co-order graph from lineitem — after the artifact
    // change, neither base table may appear in the executed plan: the one
    // materialization per (graph, SF) is the point, and a regression here
    // means every graph query pays the projection again.
    val pr = plan("q_pagerank")
    assert(!pr.contains("orders.parquet") && !pr.contains("lineitem.parquet"),
      s"q_pagerank re-projects the trade graph from base tables:\n$pr")
    val lpa = plan("q_communities")
    assert(!lpa.contains("lineitem.parquet"),
      s"q_communities re-projects the co-order graph from lineitem:\n$lpa")
  }
}
