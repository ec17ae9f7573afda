package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Composed corpus-curation flow — the top-level shape of a training-data
  * pipeline: exact dedup → quality gate → language gate, emitting one row per
  * *kept* document with the features that justified keeping it. Each stage is
  * the already-verified operator; composition stays a single declarative plan
  * (one window shuffle for dedup, narrow filters after), so Catalyst fuses
  * the gates into the scan.
  */
object Curation {

  /** Fibonacci hash of a non-negative integer id into [0, 2^32) buckets.
    * `pmod`, not `%`: the Long product wraps negative for ids ≥ ~3.49e9, and
    * Spark's `%` is sign-preserving, so the remainder would go negative and
    * pass any `< threshold` test unconditionally. 2^64 wraparound is
    * congruent mod 2^32, so `pmod` alone restores the intended unsigned
    * hash; for negative ids the hash is still well-defined (non-negative)
    * but callers should treat ids as unsigned row numbers. */
  def hashBucket(id: Column): Column =
    pmod(id * lit(2654435761L), lit(4294967296L))

  /** Keep the lowest-doc_id representative of each normalized fingerprint,
    * then require token-count and stopword-ratio quality and a (heuristic)
    * English prediction. Returns (doc_id, fp, n_tokens, stop_ratio). */
  def curate(
      documents: DataFrame,
      minTokens: Int = 5,
      maxTokens: Int = 2000,
      minStopRatio: Double = 0.02): DataFrame = {
    val byFp = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
    // `toks` in its own projection, referenced twice below: CollapseProject
    // keeps non-cheap multi-referenced producers separate, so the tokenizer
    // kernel runs once per row.
    documents
      .select(col("doc_id"), col("text"), tokens(col("text")).as("toks"))
      .select(
        col("doc_id"),
        fingerprint(col("text")).as("fp"),
        size(col("toks")).cast("long").as("n_tokens"),
        stopwordHits(col("toks")).cast("long").as("n_stop"))
      .withColumn("rn", row_number().over(byFp))
      .filter(col("rn") === 1) // exact-dedup keeper (first-wins by id)
      .withColumn(
        "stop_ratio",
        when(col("n_tokens") > 0, col("n_stop").cast("double") / col("n_tokens")))
      .filter(col("n_tokens") >= minTokens && col("n_tokens") <= maxTokens)
      .filter(col("stop_ratio") >= minStopRatio) // null ratio fails the gate
      .select("doc_id", "fp", "n_tokens", "stop_ratio")
  }

  /** Deterministic stratified downsample: keep each stratum at an expected
    * `target` rows by hash-thresholding row ids — the balanced-mixture step
    * of a training-data pipeline (cap the dominant web crawl, keep the rare
    * strata whole) done without `sample()`'s seed/partitioning
    * nondeterminism.
    *
    * A row is kept iff `fibhash(id) < floor(target·2^32 / n_stratum)`
    * (capped at 2^32 — small strata pass through untouched). Pure integer
    * arithmetic end to end, so membership is a function of the row alone:
    * stable across engines, partitionings, retries, and reruns, and the kept
    * set only shrinks pointwise as `target` decreases (nested samples for
    * ablations). Counts are binomial around `target`, not an exact cap —
    * the price of per-row independence, which is what lets this scale.
    *
    * Scale shape: one map-side-combined count over stratum (bytes per
    * stratum), broadcast of the tiny threshold table back, then a narrow
    * codegen'd filter — the corpus itself is never shuffled, so this runs at
    * scan speed on 100 TB. */
  def stratifiedSample(
      df: DataFrame,
      stratumCol: String,
      idCol: String,
      target: Long): DataFrame = {
    // target·2^32 in DECIMAL(38,0): the Scala-Long product would silently
    // wrap for target ≥ 2^31 and corrupt every threshold.
    val scaled = s"CAST($target AS DECIMAL(38,0)) * 4294967296"
    val thresholds = df
      .groupBy(stratumCol)
      .agg(count(lit(1)).as("n_total"))
      .select(
        col(stratumCol),
        least(
          lit(4294967296L),
          expr(s"CAST(floor(($scaled) / n_total) AS BIGINT)")).as("thr"))
    df.join(broadcast(thresholds), Seq(stratumCol))
      .filter(hashBucket(col(idCol)) < col("thr"))
      .drop("thr")
  }

  /** EXACT-`k`-per-group deterministic reservoir: keep precisely `k` rows
    * per stratum (or all, if the stratum is smaller), chosen by the
    * fibonacci-hash lottery order — the guaranteed-count sibling of
    * [[stratifiedSample]]'s expected-count threshold. Use it where the
    * downstream contract is a hard quota (eval sets, per-source caps with
    * billing implications), and the threshold variant where a ±√k wobble
    * is fine and the window shuffle isn't.
    *
    * Determinism: the reservoir is the k smallest (fibhash(id), id) pairs
    * per stratum — a pure function of ids, so rerun-/partitioning-/
    * engine-stable, and adding rows to OTHER strata never changes this
    * stratum's pick.
    *
    * Scale shape: one window shuffle partitioned by stratum. Per-stratum
    * groups are the skew risk at 100 TB (a dominant web crawl is one
    * window group → one task); for that regime, pre-thin with
    * [[stratifiedSample]] at ~4k expected rows first — the lottery order
    * is the same hash, so thinning by a hash threshold keeps a superset
    * of the k smallest and the exact window then runs on k·4 rows per
    * group, not the raw stratum. That two-phase composition is what
    * `q_reservoir_group` registers.
    */
  def reservoirPerGroup(
      df: DataFrame,
      stratumCol: String,
      idCol: String,
      k: Int): DataFrame = {
    val byStratum = Window
      .partitionBy(col(stratumCol))
      .orderBy(hashBucket(col(idCol)), col(idCol))
    df.withColumn("rn", row_number().over(byStratum))
      .filter(col("rn") <= k)
      .drop("rn")
  }

  /** Quality-proportional importance resampling — the continuous-weight
    * cousin of [[stratifiedSample]]'s per-stratum uniform cap, and the
    * deterministic version of the importance-sampling step a data-mixing
    * pipeline runs before training: each document is kept with probability
    * `min(1, 12.5 · stop_ratio) · rate`, so high-quality prose is kept
    * (ratio ≥ 8% ⇒ probability 1·rate) and junk decays linearly, instead
    * of a hard gate that drops everything below a cutoff.
    *
    * The lottery is `fibhash(doc_id) < thr` with `thr` derived in pure
    * integer arithmetic (`2^32·25/2 = 53687091200` exactly):
    * membership is a function of the row alone — stable across engines,
    * partitionings, and reruns — and MONOTONE in `ratePpm`: lowering the
    * rate only shrinks the kept set pointwise (floor division is monotone,
    * the hash is fixed), so ablation subsets nest. Tokenless documents
    * have weight 0 and are dropped before the division can see nt = 0.
    *
    * Scale shape: row-local projections and one codegen'd filter — no
    * shuffle at all; runs at scan speed on 100 TB.
    *
    * Returns kept `(doc_id, source, nt, thr)`.
    */
  def importanceResample(documents: DataFrame, ratePpm: Long = 1000000L): DataFrame = {
    require(ratePpm >= 0 && ratePpm <= 1000000L, s"ratePpm out of [0, 1e6]: $ratePpm")
    documents
      .select(col("doc_id"), col("source"), tokens(col("text")).as("toks"))
      .select(
        col("doc_id"),
        col("source"),
        size(col("toks")).cast("long").as("nt"),
        stopwordHits(col("toks")).cast("long").as("n_stop"))
      .filter(col("nt") > 0)
      .withColumn(
        "thr_full",
        least(
          lit(4294967296L),
          expr("(CAST(n_stop AS DECIMAL(38,0)) * 53687091200) div nt")))
      .withColumn("thr", expr(s"(CAST(thr_full AS DECIMAL(38,0)) * $ratePpm) div 1000000"))
      .filter(hashBucket(col("doc_id")) < col("thr"))
      .select("doc_id", "source", "nt", "thr")
  }

  /** Relative quality gate: keep each document whose quality score sits at or
    * above the `floor` percentile *within its own source* — the
    * distribution-aware alternative to a fixed threshold (a cutoff tuned for
    * a clean corpus would keep all of a junk crawl, and vice versa). Returns
    * (doc_id, source, score, pr) for kept documents.
    *
    * Score = stopword-hit ratio (row-local; a single IEEE division, so
    * cross-engine deterministic), tokenless documents scoring 0 rather than
    * NULL — engines disagree on NULL placement in window ORDER BY, and a
    * junk document should rank at the bottom, not fall out of the
    * percentile frame. `percent_rank` is (rank−1)/(n−1) in every engine;
    * doc_id tie-breaks make the ordering total, so ranks are reproducible.
    *
    * Scale shape: one window shuffle partitioned by source — bounded
    * per-partition state, no global sort. A pathologically dominant source
    * is the same skew class as any hot key; pre-split it with a salt column
    * and re-merge percentiles if one source exceeds a partition. */
  def qualityPercentile(documents: DataFrame, floor: Double = 0.5): DataFrame = {
    val bySource = Window.partitionBy(col("source")).orderBy(col("score"), col("doc_id"))
    documents
      .select(col("doc_id"), col("source"), tokens(col("text")).as("toks"))
      .select(
        col("doc_id"),
        col("source"),
        size(col("toks")).as("nt"),
        stopwordHits(col("toks")).as("n_stop"))
      .withColumn(
        "score",
        when(col("nt") > 0, col("n_stop").cast("double") / col("nt")).otherwise(lit(0.0)))
      .withColumn("pr", percent_rank().over(bySource))
      .filter(col("pr") >= floor)
      .select("doc_id", "source", "score", "pr")
  }

  /** Gopher-style quality rule suite (the classic LLM-corpus filter
    * family): per document, word count bounds, mean word length bounds,
    * symbol-word ratio cap, and a distinct-stopword floor, plus the
    * conjunction `keep`. Every rule value is emitted, not just the
    * verdict — the tuning surface a curation run inspects before picking
    * thresholds. (Line-level rules — bullet/ellipsis line fractions —
    * need a multi-line text layout this corpus does not have, and are
    * deliberately not faked.)
    *
    * Scale shape: one row-local projection off a (doc_id, source, text)
    * scan — no shuffle at all besides the caller's ordering. Numeric
    * contract: character sums and counts are exact integers; each ratio
    * is ONE IEEE division, bit-identical cross-engine.
    */
  def gopherRules(
      documents: DataFrame,
      minWords: Long = 20L,
      maxWords: Long = 80L,
      minMeanLen: Double = 3.0,
      maxMeanLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1,
      minStopDistinct: Long = 2L): DataFrame = {
    val stopArr = graft.functions.TextFunctions.Stopwords
      .map(s => s"'$s'")
      .mkString("array(", ", ", ")")
    documents
      .select(col("doc_id"), col("source"), tokens(col("text")).as("ts"))
      .select(
        col("doc_id"),
        col("source"),
        size(col("ts")).cast("long").as("n_words"),
        expr("aggregate(ts, 0L, (acc, w) -> acc + length(w))").as("char_sum"),
        expr(s"size(array_intersect(ts, $stopArr))").cast("long").as("n_stop_distinct"),
        expr("size(filter(ts, w -> w rlike '^[^a-zA-Z0-9]+$'))").cast("long")
          .as("n_symbol_words"))
      .withColumn(
        "mean_wlen",
        when(col("n_words") > 0, col("char_sum").cast("double") / col("n_words"))
          .otherwise(lit(0.0)))
      .withColumn(
        "symbol_ratio",
        when(col("n_words") > 0, col("n_symbol_words").cast("double") / col("n_words"))
          .otherwise(lit(0.0)))
      .withColumn(
        "keep",
        col("n_words").between(minWords, maxWords) &&
          col("mean_wlen").between(minMeanLen, maxMeanLen) &&
          col("symbol_ratio") < maxSymbolRatio &&
          col("n_stop_distinct") >= minStopDistinct)
      .select(
        "doc_id", "source", "n_words", "mean_wlen", "symbol_ratio",
        "n_stop_distinct", "keep")
  }

  /** Filter-cascade funnel report: the quality cascade applied in one
    * row-local projection, every dropped document attributed to its FIRST
    * failing stage — the report a curation run reads before touching any
    * threshold (drop counts by rule AND source, so a rule that guts one
    * crawl is visible immediately). Stages in cascade order: language
    * allow-list, Gopher word-count bounds, mean-word-length bounds,
    * symbol-word-ratio cap, distinct-stopword floor; survivors land in
    * stage `kept`. Returns `(source, stage, n_docs)`.
    *
    * Scale shape: one tokenizing projection + ONE map-side-combined
    * aggregate of O(sources × stages) rows — attribution is a when-chain,
    * never a per-rule pass. */
  def filterFunnel(
      documents: DataFrame,
      allowedLangs: Seq[String] = Seq("en", "de", "fr", "es"),
      minWords: Long = 20L,
      maxWords: Long = 80L,
      minMeanLen: Double = 3.0,
      maxMeanLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1,
      minStopDistinct: Long = 2L): DataFrame = {
    val stopArr = graft.functions.TextFunctions.Stopwords
      .map(s => s"'$s'")
      .mkString("array(", ", ", ")")
    documents
      .select(col("doc_id"), col("source"), col("lang"), tokens(col("text")).as("ts"))
      .select(
        col("source"),
        col("lang"),
        size(col("ts")).cast("long").as("n_words"),
        expr("aggregate(ts, 0L, (acc, w) -> acc + length(w))").as("char_sum"),
        expr(s"size(array_intersect(ts, $stopArr))").cast("long").as("n_stop_distinct"),
        expr("size(filter(ts, w -> w rlike '^[^a-zA-Z0-9]+$'))").cast("long")
          .as("n_symbol_words"))
      .withColumn(
        "mean_wlen",
        when(col("n_words") > 0, col("char_sum").cast("double") / col("n_words"))
          .otherwise(lit(0.0)))
      .withColumn(
        "symbol_ratio",
        when(col("n_words") > 0, col("n_symbol_words").cast("double") / col("n_words"))
          .otherwise(lit(0.0)))
      .withColumn(
        "stage",
        // coalesce: a NULL lang must attribute to 1_lang, not NULL-skip
        // past the stage and report as kept (same coalesce in the oracle)
        when(!coalesce(col("lang"), lit("")).isin(allowedLangs: _*), lit("1_lang"))
          .when(!col("n_words").between(minWords, maxWords), lit("2_word_count"))
          .when(!col("mean_wlen").between(minMeanLen, maxMeanLen), lit("3_mean_wlen"))
          .when(col("symbol_ratio") >= maxSymbolRatio, lit("4_symbol"))
          .when(col("n_stop_distinct") < minStopDistinct, lit("5_stopword"))
          .otherwise(lit("kept")))
      .groupBy("source", "stage")
      .agg(count(lit(1)).as("n_docs"))
  }

  /** Temperature-scaled source mixing (the multilingual/multi-source
    * α-sampling rule, α = 1/2): target share of source s is
    * `√n_s / Σ √n_s` — big sources are damped, small ones boosted, the
    * standard compromise between proportional (α=1) and uniform (α=0)
    * mixing. Returns per source `(n_docs, share_raw, share_temp, boost)`.
    *
    * Determinism: √n is IEEE-correctly-rounded (no libm variance), then
    * quantized `⌊√n·10⁹ + ½⌋` into BIGINT so the denominator is an exact
    * order-free integer sum; the shares are one double division each. */
  def sourceTemperatureShares(df: DataFrame, sourceCol: String = "source"): DataFrame = {
    val n = df.groupBy(col(sourceCol)).agg(count(lit(1)).cast("long").as("n_docs"))
      .withColumn("x", floor(sqrt(col("n_docs")) * 1e9 + 0.5).cast("long"))
    val tot = n.agg(sum("n_docs").cast("long").as("nn"), sum("x").cast("long").as("sx"))
    n.crossJoin(broadcast(tot))
      .select(
        col(sourceCol),
        col("n_docs"),
        round(col("n_docs").cast("double") / col("nn").cast("double"), 6).as("share_raw"),
        round(col("x").cast("double") / col("sx").cast("double"), 6).as("share_temp"),
        round((col("x").cast("double") / col("sx").cast("double")) /
          (col("n_docs").cast("double") / col("nn").cast("double")), 6).as("boost"))
  }

  /** IPF raking (iterative proportional fitting, Deming & Stephan 1940):
    * per-cell sampling weights that pull the corpus's `rowCol`×`colCol`
    * contingency table toward UNIFORM target marginals on both axes — the
    * classic mixture-rebalancing step before sampling a training corpus
    * (one round of row scaling + one of column scaling; the reported
    * `source_mass_after` shows the residual row-marginal perturbation the
    * column pass reintroduced — the quantity further rounds would shrink).
    * Returns `(rowCol, colCol, n_docs, weight, source_mass_after)`.
    *
    * Determinism: the row pass divides by EXACT integer row sums; the
    * column pass needs sums of double weights, so each column's terms are
    * packed row-ordered and folded left-to-right
    * ([[graft.functions.VectorFunctions.dot]] ↔ `list_inner_product`) —
    * no unordered double aggregation anywhere.
    *
    * Scale shape: one corpus-scan count into the (rows × cols) grid;
    * everything after is grid-sized and broadcast. */
  def ipfRake(df: DataFrame, rowCol: String = "source", colCol: String = "lang"): DataFrame = {
    import graft.functions.VectorFunctions.dot
    def ones(xs: org.apache.spark.sql.Column) = transform(xs, _ => lit(1.0))
    val n = df.groupBy(col(rowCol), col(colCol)).agg(count(lit(1)).cast("long").as("c"))
    val tot = n.agg(
      sum("c").cast("long").as("nn"),
      countDistinct(col(rowCol)).cast("long").as("ns"),
      countDistinct(col(colCol)).cast("long").as("nl"))
    val rowSums = n.groupBy(col(rowCol)).agg(sum("c").cast("long").as("rs"))
    val w1 = n
      .join(broadcast(rowSums), Seq(rowCol))
      .crossJoin(broadcast(tot))
      .withColumn("w", (col("nn").cast("double") / col("ns")) / col("rs"))
    val colScale = w1
      .groupBy(col(colCol))
      .agg(sort_array(collect_list(struct(col(rowCol).as("r"), (col("w") * col("c")).as("x"))))
        .as("a"))
      .select(col(colCol), transform(col("a"), s => s.getField("x")).as("xs"))
      .crossJoin(broadcast(tot))
      .select(col(colCol),
        ((col("nn").cast("double") / col("nl")) / dot(col("xs"), ones(col("xs")))).as("cs"))
    val w2 = w1
      .join(broadcast(colScale), Seq(colCol))
      .withColumn("w2", col("w") * col("cs"))
    val rowMass = w2
      .groupBy(col(rowCol))
      .agg(sort_array(collect_list(struct(col(colCol).as("l"), (col("w2") * col("c")).as("x"))))
        .as("a"))
      .select(col(rowCol), transform(col("a"), s => s.getField("x")).as("xs"))
      .select(col(rowCol), dot(col("xs"), ones(col("xs"))).as("row_mass"))
    w2.join(broadcast(rowMass), Seq(rowCol))
      .select(
        col(rowCol), col(colCol), col("c").as("n_docs"),
        round(col("w2"), 6).as("weight"),
        round(col("row_mass"), 4).as("source_mass_after"))
  }

  /** Deterministic corpus shuffle + shard manifest: every document gets a
    * pseudo-random but rerun-stable shard via [[hashBucket]] (the training-
    * order shuffle a dataloader needs — adjacent source documents land in
    * different shards, and re-running the pipeline reproduces the exact
    * layout, which `repartition`-by-`rand()` cannot promise under task
    * retries). Returns one manifest row per shard: `(shard, n_docs,
    * tok_total, id_sum)` — the counts a loader checks before training.
    *
    * Scale shape: shard assignment and token count are row-local projections;
    * the manifest is ONE map-side-combined shuffle of `nShards` rows. The
    * actual shard write is `df.write.partitionBy("shard")` on the same
    * column — no extra shuffle beyond the write's own file split. */
  def shardManifest(documents: DataFrame, nShards: Int = 32): DataFrame =
    documents
      .select(
        pmod(hashBucket(col("doc_id")), lit(nShards.toLong)).as("shard"),
        col("doc_id"),
        tokenCount(col("text")).cast("long").as("nt"))
      .groupBy("shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("nt")).as("tok_total"),
        sum(col("doc_id")).as("id_sum"))

  /** Token-budget source mixing: cap each source's contribution to the
    * training mix at `budgetTokens`, keeping a deterministic pseudo-random
    * subset (ordered by [[hashBucket]], so the kept set is unbiased w.r.t.
    * document order and stable across reruns). A document is kept while the
    * tokens accumulated BEFORE it are inside the budget — the first document
    * of a source is always kept, and the last kept document may straddle the
    * boundary (standard greedy fill, same rule as sequence packing).
    *
    * Returns `(source, n_docs, n_kept, tok_kept)` per source.
    *
    * Scale shape: one window shuffle partitioned by source (running token
    * sum), then a partial-aggregated roll-up of O(sources) rows. Per-source
    * state in the window is a single running long. A source so large its
    * partition cannot hold even the (doc_id, nt) pairs is pre-split by a
    * salt column, budgets divided per split, and re-merged — the documented
    * hot-key escape hatch. */
  def sourceMix(documents: DataFrame, budgetTokens: Long = 20000L): DataFrame = {
    val bySource = Window
      .partitionBy(col("source"))
      .orderBy(hashBucket(col("doc_id")), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    documents
      .select(
        col("source"),
        col("doc_id"),
        tokenCount(col("text")).cast("long").as("nt"))
      .withColumn("cum", sum(col("nt")).over(bySource))
      .withColumn("kept", col("cum") - col("nt") < budgetTokens)
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        count(when(col("kept"), 1)).as("n_kept"),
        sum(when(col("kept"), col("nt")).otherwise(lit(0L))).as("tok_kept"))
  }

  /** Temperature-scaled source sampling weights — the mix-rebalancing pass
    * that upsamples small sources relative to their raw share (√tokens =
    * temperature-2 scaling, the standard multilingual/source-mix family).
    * Returns `(source, tok_total, weight)` with weights normalized to the
    * LARGEST source (= weight 1.0), not to the sum: a double sum's value
    * depends on accumulation order (last-ulp nondeterminism across
    * partitionings and engines), while max is exact and one IEEE
    * sqrt + division is bit-identical everywhere. Downstream samplers only
    * need relative rates, so the normalization choice is free.
    *
    * Scale shape: one partial-agg shuffle of O(sources) rows, then a 1-row
    * max broadcast — the corpus itself never reshuffles. */
  def sourceWeights(documents: DataFrame): DataFrame = {
    val tot = documents
      .select(col("source"), tokenCount(col("text")).cast("long").as("nt"))
      .groupBy("source")
      .agg(sum(col("nt")).as("tok_total"))
    val mx = tot.agg(max(col("tok_total")).as("max_tok"))
    tot
      .join(broadcast(mx))
      .withColumn(
        "weight",
        sqrt(col("tok_total").cast("double")) / sqrt(col("max_tok").cast("double")))
      .select("source", "tok_total", "weight")
  }
}
