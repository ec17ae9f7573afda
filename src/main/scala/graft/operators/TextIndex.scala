package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** Corpus indexing statistics for a training-data pipeline: per-document
  * salient terms (TF-IDF) and a frequency-ranked vocabulary. Both are
  * corpus-wide token statistics, so one shuffle of the exploded token stream
  * is inherent; everything after that shuffle is bounded by vocabulary size
  * or per-document top-k, never by corpus size.
  *
  * Numeric contract (cross-engine determinism): the classic `ln(N/df)` idf
  * is replaced by linear idf `N/df`, so the score is one exact integer
  * product (`tf·N`) followed by ONE IEEE double division — bit-identical in
  * any IEEE-754 engine, where `ln` is only correctly-rounded-ish and may
  * differ in the last ulp between libm implementations, flipping near-tie
  * rankings. Linear idf is order-equivalent to log idf for a fixed tf, and
  * the per-document ranking it induces is the same family of "rare term
  * wins" orderings; swap in `log` for presentation if exact classic scores
  * are wanted and cross-engine hashing is not.
  */
object TextIndex {

  /** Per-(doc, token) term frequency over the whitespace tokenizer — the
    * shared first stage. One map-side-combined shuffle of hashed-key rows;
    * duplicate tokens within a document collapse before the exchange. */
  private def termFrequency(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok")
      .agg(count(lit(1)).as("tf"))

  /** Top-`k` TF-IDF terms per document:
    * `tfidf = (tf · n_docs) / df`, rank by (tfidf desc, tok) within each
    * document. Returns (doc_id, rk, tok, tf, df, tfidf).
    *
    * Plan shape at scale: tf agg (one exploded-token shuffle) → df agg
    * (O(vocab) rows, broadcast back under the default threshold; AQE
    * demotes to a token-keyed hash join for corpus-scale vocabularies) →
    * broadcast 1-row corpus count → per-doc window. The window partitions
    * by doc_id, so no global sort.
    *
    * Known 2× on the tokenize stage: df's subtree is tf's with the count
    * pruned away (keys-only distinct), so the two exchanges canonicalize
    * differently and neither exchange reuse nor AQE stage reuse applies —
    * the scan+tokenize+explode pass runs twice (verified in the final
    * adaptive plan). Deliberate trade: a window-by-token df
    * (`count().over(partitionBy(tok))`) would run one pass but buffers each
    * token's group in WindowExec — the hot-token group is O(corpus) rows on
    * one partition, a guaranteed spill at scale, strictly worse than 2× of
    * a linear map-side-combined stage. Production callers doing repeated
    * TF-IDF over one corpus should `persist()` the tf frame and pass it
    * through both aggregates; a query registry that reconstructs plans per
    * run (Verify/Bench here) cannot, or every construction leaks a cached
    * copy into the block manager. */
  def tfIdfTopK(documents: DataFrame, k: Int): DataFrame = {
    val tf = termFrequency(documents)
    val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val n = documents.agg(count(lit(1)).as("n_docs"))
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("tok"))
    tf.join(df, "tok")
      .join(broadcast(n)) // 1 row; BroadcastNestedLoopJoin, no shuffle
      .withColumn("tfidf", (col("tf") * col("n_docs")).cast("double") / col("df"))
      .withColumn("rk", row_number().over(byDoc).cast("long"))
      .filter(col("rk") <= k)
      .select("doc_id", "rk", "tok", "tf", "df", "tfidf")
  }

  /** Frequency-ranked vocabulary: the `k` most frequent tokens with
    * contiguous ids assigned by (count desc, token). Returns
    * (vid, tok, n).
    *
    * The corpus-wide count is the one real shuffle; the top-k cut compiles
    * to TakeOrderedAndProject (partial top-k per partition, k rows to one
    * reducer), so the final id-assignment window sees exactly `k` rows —
    * the single-partition window is bounded by the requested vocabulary
    * size, never by the corpus. */
  def vocabulary(documents: DataFrame, k: Int): DataFrame = {
    val counts = documents
      .select(explode(tokens(col("text"))).as("tok"))
      .groupBy("tok")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok"))
      .limit(k)
    counts
      .withColumn(
        "vid",
        row_number().over(Window.orderBy(col("n").desc, col("tok"))).cast("long"))
      .select("vid", "tok", "n")
  }

  /** Distinctive terms per source — class-based TF-IDF (the c-TF-IDF of
    * Grootendorst's BERTopic, arXiv:2203.05794): treat each SOURCE as one
    * meta-document, score term t in source s as
    * `(tf_{t,s}/n_s) · ln(1 + A/f_t)` with `f_t` the corpus frequency and
    * `A` the mean tokens per source, and keep the top-`k` per source —
    * "what does this crawl talk about that the others don't", the
    * first corpus-composition question a curation run asks.
    *
    * Determinism: every input to the ln is a ratio of exact integers, and
    * the ln itself is rounded 9dp before entering the score product, so
    * rankings replay bit-identically cross-engine; ties break on the term.
    * Scale shape: one exploded-token shuffle into the (source × term)
    * grid; marginals roll up FROM the grid (no second corpus pass); the
    * rank window partitions by source over vocabulary-sized rows. */
  def distinctiveTerms(documents: DataFrame, k: Int = 5): DataFrame =
    distinctiveTermsBy(documents, "source", k)

  /** [[distinctiveTerms]] generalized to any class column — the c-TF-IDF
    * core parameterized by what a "class" is (source, semantic cell, split,
    * …). Same plan shape and numeric contract for any class cardinality. */
  def distinctiveTermsBy(documents: DataFrame, classCol: String, k: Int): DataFrame = {
    val tf = documents
      .select(col(classCol), explode(tokens(col("text"))).as("tok"))
      .groupBy(classCol, "tok")
      .agg(count(lit(1)).cast("long").as("tf"))
    val perClass = tf.groupBy(classCol).agg(sum("tf").cast("long").as("n_s"))
    val perTerm = tf.groupBy("tok").agg(sum("tf").cast("long").as("f_t"))
    val avg = perClass.agg(
      (sum("n_s").cast("double") / countDistinct(col(classCol))).as("a_tok"))
    val byClass = Window.partitionBy(col(classCol))
      .orderBy(col("score").desc, col("tok"))
    tf.join(broadcast(perClass), Seq(classCol))
      .join(perTerm, Seq("tok"))
      .crossJoin(broadcast(avg))
      .withColumn("score",
        (col("tf").cast("double") / col("n_s")) *
          round(log(lit(1.0) + col("a_tok") / col("f_t")), 9))
      .withColumn("rk", row_number().over(byClass).cast("long"))
      .filter(col("rk") <= k)
      .select(col(classCol), col("rk"), col("tok"), col("tf"),
        round(col("score"), 9).as("score"))
  }

  /** Zipf power-law fit of the term-frequency distribution: least-squares
    * regression of `ln(count)` on `ln(rank)` over the top-`k` vocabulary —
    * the corpus-health fingerprint (natural text sits near slope −1;
    * boilerplate-heavy or template-generated corpora flatten or steepen
    * it). Returns one row `(n_terms, slope, intercept, r2)`.
    *
    * Determinism: the regression moments are double sums of logarithms —
    * unordered SQL aggregation could never replay across engines, so the
    * top-k rows (bounded by construction) are packed into RANK-ORDERED
    * arrays and every moment is a left-to-right
    * [[graft.functions.VectorFunctions.dot]] fold, the same contract the
    * embedding operators share with DuckDB's `list_inner_product`. The
    * ln inputs are rounded to 9dp first so a libm ULP difference between
    * engines cannot leak into the folds. */
  def zipfFit(documents: DataFrame, k: Int = 100): DataFrame = {
    import graft.functions.VectorFunctions.dot
    val ranked = vocabulary(documents, k)
      .select(
        col("vid"),
        round(log(col("vid").cast("double")), 9).as("x"),
        round(log(col("n").cast("double")), 9).as("y"))
    ranked
      .agg(sort_array(collect_list(struct(col("vid"), col("x"), col("y")))).as("a"))
      .select(
        size(col("a")).cast("double").as("n"),
        transform(col("a"), s => s.getField("x")).as("xs"),
        transform(col("a"), s => s.getField("y")).as("ys"),
        transform(col("a"), _ => lit(1.0)).as("ones"))
      .select(
        col("n"),
        dot(col("xs"), col("ones")).as("sx"),
        dot(col("ys"), col("ones")).as("sy"),
        dot(col("xs"), col("xs")).as("sxx"),
        dot(col("xs"), col("ys")).as("sxy"),
        dot(col("ys"), col("ys")).as("syy"))
      .withColumn("cov", col("n") * col("sxy") - col("sx") * col("sy"))
      .withColumn("varx", col("n") * col("sxx") - col("sx") * col("sx"))
      .withColumn("vary", col("n") * col("syy") - col("sy") * col("sy"))
      // degenerate guards (constant x or y — e.g. every count 1): slope 0,
      // r² 0, never a divide-by-zero (ANSI) or NaN (DuckDB)
      .withColumn("slope0",
        when(col("varx") =!= 0.0, col("cov") / col("varx")).otherwise(lit(0.0)))
      .select(
        col("n").cast("long").as("n_terms"),
        round(col("slope0"), 6).as("slope"),
        round((col("sy") - col("slope0") * col("sx")) / col("n"), 6).as("intercept"),
        round(
          when(col("varx") =!= 0.0 && col("vary") =!= 0.0,
            col("cov") * col("cov") / (col("varx") * col("vary"))).otherwise(lit(0.0)),
          6).as("r2"))
  }

  /** Inverted index over the whitespace tokenizer: one row per term with
    * its document frequency and — for terms rare enough to materialize —
    * the full sorted posting list (comma-joined, so the row stays a flat
    * scalar for export/oracle hashing). Returns the `k` highest-df terms
    * as `(tok, df, posting)`, deterministic under (df desc, tok).
    *
    * Scale shape: df is exact for EVERY term (one map-side-combined
    * count over the distinct (doc, tok) table), but posting lists are
    * only collected where `df ≤ postingCap` — a stopword's posting is
    * O(corpus) by definition and would otherwise sit in one aggregation
    * buffer; the cap bounds every `collect_list` buffer by construction,
    * which is the honest distributed contract for index building (real
    * engines shard exactly these hot postings). High-df terms carry a
    * NULL posting: the df survives as the ranking/statistics signal.
    * The cap filter runs BEFORE the collect (semi-bounded second
    * aggregate over the qualifying subset), so the hot keys never reach
    * the buffering exchange. Same deliberate 2× on the tokenize stage as
    * [[tfIdfTopK]] — the df and posting subtrees canonicalize
    * differently; see that scaladoc for why the window alternative is
    * worse. */
  def invertedIndex(documents: DataFrame, postingCap: Int, k: Int): DataFrame = {
    val docTok = documents
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .distinct()
    val df = docTok.groupBy("tok").agg(count(lit(1)).cast("long").as("df"))
    val rare = df.filter(col("df") <= postingCap)
    val postings = docTok
      .join(rare.select("tok"), Seq("tok")) // O(vocab) build side; AQE broadcasts
      .groupBy("tok")
      .agg(array_join(sort_array(collect_list(col("doc_id"))), ",").as("posting"))
    df.join(postings, Seq("tok"), "left_outer")
      .select(col("tok"), col("df"), col("posting"))
      .orderBy(col("df").desc, col("tok"))
      .limit(k)
  }

  /** BM25 top-`k` retrieval for a literal query-term set — the classic
    * corpus ranking function, shaped for scale: the exploded token stream
    * is filtered to the query terms BEFORE the tf aggregate, so the only
    * corpus-keyed exchange carries query-term hits (O(hits), not O(tokens));
    * df over those terms is O(|terms|) rows; the corpus length stats are a
    * 1-row broadcast; the top-k cut compiles to TakeOrderedAndProject so
    * the rank window sees exactly `k` rows, never the corpus.
    *
    * Numeric contract (cross-engine hashing, cf. the object scaladoc):
    * linear idf `(N − df + 0.5)/(df + 0.5)` — same Robertson shape, `ln`
    * dropped — and the per-document sum over terms goes through
    * round-12 → DECIMAL(30,12) so it is order-insensitive; one final
    * round(·, 4) double. k1 = 1.2, b = 0.75 are inlined as the folded
    * literals 2.2 / 0.3 / 0.9 so both engines evaluate the identical
    * IEEE expression tree. Returns (rk, doc_id, score, n_hit).
    *
    * Known 3× on the tokenize stage (same non-reuse as [[tfIdfTopK]]'s
    * 2×, documented there): tf, dl, and the 1-row corpus stats are three
    * uncached branches over the token projection, so one query costs
    * three scan+tokenize passes. dl cannot be derived from tf (tf sees
    * only query-term hits; dl counts ALL tokens), so the pass count is
    * inherent to a plan-per-run registry; repeated-retrieval callers
    * should `persist()` the token projection and pass it through. */
  def bm25TopK(documents: DataFrame, terms: Seq[String], k: Int): DataFrame =
    bm25Rank(documents, _.filter(col("tok").isin(terms: _*)), k)

  /** [[bm25TopK]] with the query terms as DATA instead of literals — the
    * form a data-driven querier (e.g. [[prfBm25TopK]]'s expanded term set)
    * needs. The literal `isin` pre-shuffle cut becomes a broadcast semi
    * join in the same pre-shuffle position: the exploded token stream is
    * still reduced to query-term hits before anything exchanges. */
  def bm25TopKFromTerms(documents: DataFrame, termsDf: DataFrame, k: Int): DataFrame =
    bm25Rank(
      documents,
      _.join(broadcast(termsDf.select("tok").distinct()), Seq("tok"), "left_semi"),
      k)

  private def bm25Rank(
      documents: DataFrame,
      termFilter: DataFrame => DataFrame,
      k: Int): DataFrame = {
    val toks = documents.select(col("doc_id"), tokens(col("text")).as("toks"))
    val dl = toks.select(col("doc_id"), size(col("toks")).cast("long").as("dl"))
    val g = dl.agg(
      count(lit(1)).cast("long").as("n_docs"),
      sum(col("dl")).as("sum_dl"))
    val tf = termFilter(toks.select(col("doc_id"), explode(col("toks")).as("tok")))
      .groupBy("doc_id", "tok")
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val scored = tf
      .join(broadcast(df), "tok")
      .join(dl, "doc_id")
      .join(broadcast(g)) // 1 row
      .withColumn(
        "sc",
        ((col("n_docs").cast("double") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          (col("tf").cast("double") * lit(2.2) /
            (col("tf") + lit(0.3) +
              lit(0.9) * (col("dl") / (col("sum_dl").cast("double") / col("n_docs"))))))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).cast("long").as("n_hit"),
        round(sum(round(col("sc"), 12).cast("decimal(30,12)")).cast("double"), 4)
          .as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
    scored
      .withColumn(
        "rk",
        row_number()
          .over(Window.orderBy(col("score").desc, col("doc_id")))
          .cast("long"))
      .select("rk", "doc_id", "score", "n_hit")
  }

  /** Pseudo-relevance-feedback expansion terms (RM1-lite): run BM25 for the
    * seed terms, take the top `fbDocs` documents as pseudo-relevant, and
    * score every candidate token in them by
    * `fb_tf × ln(n_docs/df)` — feedback-set frequency weighted by corpus
    * rarity — excluding the seed terms and stopwords. Returns the top
    * `expTerms` as `(tok, w)`, ties on the token.
    *
    * Numeric contract: the ln is quantized to integer NANO-units via
    * `floor(x·10⁹ + ½)` (the LM-scorer output-edge pattern — plain
    * `round(·,9)` diverges cross-engine on shortest-repr-vs-binary
    * boundary values, observed on 1-of-3 rows at every SF) and multiplied
    * into the exact BIGINT feedback frequency, so the term ranking and the
    * weight replay bit-identically; one double division at the edge.
    * Scale shape: the feedback set is `fbDocs` rows (head-sized), so its
    * token stream and vocabulary are bounded by feedback-doc length; the
    * corpus-wide df is the one vocabulary-sized aggregate (the q_vocab
    * class), joined with the tiny feedback vocabulary broadcast. */
  def prfExpansionTerms(
      documents: DataFrame,
      seed: Seq[String],
      fbDocs: Int = 5,
      expTerms: Int = 3,
      stop: Seq[String] = graft.functions.TextFunctions.Stopwords): DataFrame = {
    val fb = bm25TopK(documents, seed, fbDocs).select("doc_id")
    val fbTf = documents
      .join(broadcast(fb), Seq("doc_id"), "left_semi")
      .select(explode(tokens(col("text"))).as("tok"))
      .filter(!col("tok").isin(seed ++ stop: _*))
      .groupBy("tok")
      .agg(count(lit(1)).cast("long").as("fb_tf"))
    val dfAll = documents
      .select(col("doc_id"), explode(array_distinct(tokens(col("text")))).as("tok"))
      .groupBy("tok")
      .agg(count(lit(1)).cast("long").as("df"))
    val n = documents.agg(count(lit(1)).cast("long").as("n_docs"))
    dfAll
      .join(broadcast(fbTf), "tok")
      .crossJoin(broadcast(n)) // 1 row
      .withColumn(
        "w_nano",
        col("fb_tf") *
          floor(log(col("n_docs").cast("double") / col("df")) * lit(1e9) + lit(0.5))
            .cast("long"))
      .orderBy(col("w_nano").desc, col("tok"))
      .limit(expTerms)
      .select(col("tok"), (col("w_nano").cast("double") / lit(1e9)).as("w"))
  }

  /** BM25 retrieval with pseudo-relevance-feedback query expansion — the
    * classic two-pass IR recipe: seed query → top-`fbDocs` feedback set →
    * [[prfExpansionTerms]] picks `expTerms` enrichment terms → one re-query
    * over seed ∪ expansion via [[bm25TopKFromTerms]]. Recall widens to
    * documents sharing the feedback set's vocabulary even when they miss
    * the literal seed terms. Both passes keep bm25's pre-shuffle term cut;
    * the expansion set rides as a broadcast term table. */
  def prfBm25TopK(
      documents: DataFrame,
      seed: Seq[String],
      k: Int,
      fbDocs: Int = 5,
      expTerms: Int = 3): DataFrame = {
    val s = documents.sparkSession
    import s.implicits._
    val terms = seed.toDF("tok").union(prfExpansionTerms(documents, seed, fbDocs, expTerms)
      .select("tok"))
    bm25TopKFromTerms(documents, terms, k)
  }

  /** Linear text-classifier inference — the fasttext-style quality-filter
    * shape: a broadcast weight table joined against the exploded token
    * stream, one weighted sum per document, sign test against a bias. The
    * model (the weight table) is the only broadcast state; the corpus
    * never shuffles except for the per-doc roll-up, so the plan is the
    * same O(model)-broadcast class as the OOV check above.
    *
    * All arithmetic is exact DECIMAL (weights DECIMAL(6,3) × integer
    * counts, summed), so the score is order-insensitive and bit-identical
    * cross-engine with no rounding discipline needed; the double cast
    * happens once, on the already-exact final value. Tokenless or
    * signal-free docs score exactly `bias` (label false for bias < 0).
    * Returns (doc_id, n_signal, score, label). */
  def linearClassifier(
      documents: DataFrame,
      weights: Seq[(String, BigDecimal)],
      bias: BigDecimal): DataFrame = {
    val s = documents.sparkSession
    import s.implicits._
    val w = broadcast(
      weights.toDF("tok", "wt").select(col("tok"), col("wt").cast("decimal(6,3)").as("wt")))
    val sums = documents
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .join(w, "tok")
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_signal"), sum(col("wt")).as("sw"))
    documents
      .select("doc_id")
      .join(sums, Seq("doc_id"), "left_outer")
      .withColumn(
        "score_dec",
        lit(bias.bigDecimal).cast("decimal(6,3)") +
          coalesce(col("sw"), lit(BigDecimal(0).bigDecimal).cast("decimal(16,3)")))
      .select(
        col("doc_id"),
        coalesce(col("n_signal"), lit(0L)).as("n_signal"),
        col("score_dec").cast("double").as("score"),
        (col("score_dec") > 0).as("label"))
  }

  /** Per-document out-of-vocabulary rate against the size-`k`
    * [[vocabulary]]: `(doc_id, n_tokens, n_oov, oov_rate)` counting token
    * OCCURRENCES (multiplicity matters — a doc spamming one OOV token is
    * mostly OOV). The standard coverage check before committing to a
    * tokenizer vocabulary size.
    *
    * Plan shape: the vocabulary is top-k (bounded, broadcast — the same
    * O(model) broadcast class as the IVF centroids), so the exploded token
    * stream never shuffles for membership; the only corpus-keyed exchange
    * is the per-doc roll-up. Tokenless docs rate 0.0, not NULL (total
    * column — engines would disagree on NULL ordering downstream). */
  def oovRate(documents: DataFrame, k: Int): DataFrame = {
    val vocab = vocabulary(documents, k).select(col("tok"), lit(1).as("in_vocab"))
    val hits = documents
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .join(broadcast(vocab), Seq("tok"), "left_outer")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_toks"),
        count(when(col("in_vocab").isNull, 1)).as("n_oov"))
    documents
      .select("doc_id")
      .join(hits, Seq("doc_id"), "left_outer")
      .select(
        col("doc_id"),
        coalesce(col("n_toks"), lit(0L)).as("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        when(coalesce(col("n_toks"), lit(0L)) > 0,
          coalesce(col("n_oov"), lit(0L)).cast("double") / col("n_toks"))
          .otherwise(lit(0.0))
          .as("oov_rate"))
  }

  /** Pairwise vocabulary overlap between corpus sources: for every source
    * pair, the distinct-token counts, the intersection size, and the
    * Jaccard similarity of the two vocabularies. The corpus-mixing
    * diagnostic that flags two crawls as near-identical (merge them) or a
    * source as lexically disjoint (its tokens are OOV for the rest).
    *
    * Scale shape: the corpus collapses FIRST to distinct (source, token)
    * pairs — one map-side-combined distinct, output bounded by
    * |sources| · |vocab|, never by corpus rows. The pair join is keyed on
    * token over that collapsed set, so a hot token costs
    * O(|sources|²) intermediate rows, not O(docs²). Per-source vocabulary
    * sizes are a tiny aggregate broadcast back onto the O(|sources|²)
    * result. `jaccard = inter / (n1 + n2 − inter)` is one IEEE division
    * of exact longs — engine-portable.
    */
  def sourceOverlap(documents: DataFrame): DataFrame = {
    val st = documents
      .select(col("source"), explode(tokens(col("text"))).as("tok"))
      .distinct()
    val sizes = st.groupBy("source").agg(count(lit(1)).cast("long").as("nv"))
    val inter = st
      .toDF("s1", "tok")
      .join(st.toDF("s2", "tok"), Seq("tok"))
      .filter(col("s1") < col("s2"))
      .groupBy("s1", "s2")
      .agg(count(lit(1)).cast("long").as("inter"))
    inter
      .join(broadcast(sizes.toDF("s1", "n1")), Seq("s1"))
      .join(broadcast(sizes.toDF("s2", "n2")), Seq("s2"))
      .select(
        col("s1"),
        col("s2"),
        col("n1"),
        col("n2"),
        col("inter"),
        (col("inter").cast("double") / (col("n1") + col("n2") - col("inter")))
          .as("jaccard"))
  }

  /** Top-`k` PMI-salient terms per source: which tokens are
    * over-represented in a source relative to the corpus — the
    * source-characterization diagnostic (what *is* this crawl?) and the
    * feature extractor behind source-classifier quality filters.
    *
    * Linear PMI, same numeric contract as this file's linear idf:
    * `pmi = (n_st · N) / (n_s · n_t)` — the exponential of classic PMI, so
    * rank-equivalent per fixed source — computed as exact integer products
    * in DECIMAL(38,0) (a 100 TB corpus holds ~10¹⁴ tokens; the cross
    * product n_st·N overflows BIGINT long before that) and ONE IEEE
    * division of the two exactly-represented products. `ln`'s last-ulp
    * libm drift never enters.
    *
    * Scale shape: ONE corpus-keyed shuffle (the (source, token) cell
    * aggregate, map-side combined). Every marginal — per-source totals,
    * per-token totals, the corpus total — is rolled up FROM THE CELLS
    * (O(sources·vocab) rows), never by re-scanning the corpus; token
    * marginals join back on the token key (AQE broadcasts the
    * source-marginal and corpus-total sides). The `minCount` floor cuts
    * the hapax tail before the join and the per-source window ranks
    * O(cells) rows partitioned by source. */
  def pmiTerms(documents: DataFrame, k: Int, minCount: Long = 5L): DataFrame = {
    val cells = documents
      .select(col("source"), explode(tokens(col("text"))).as("tok"))
      .groupBy("source", "tok")
      .agg(count(lit(1)).as("n_st"))
    val bySource = cells.groupBy("source").agg(sum(col("n_st")).as("n_s"))
    val byTok = cells.groupBy("tok").agg(sum(col("n_st")).as("n_t"))
    val total = cells.agg(sum(col("n_st")).as("n_corpus"))
    val byRank = Window.partitionBy(col("source")).orderBy(col("pmi").desc, col("tok"))
    cells
      .filter(col("n_st") >= minCount)
      .join(byTok, Seq("tok"))
      .join(broadcast(bySource), Seq("source"))
      .crossJoin(broadcast(total))
      .withColumn(
        "pmi",
        (col("n_st").cast("decimal(38,0)") * col("n_corpus")).cast("double") /
          (col("n_s").cast("decimal(38,0)") * col("n_t")).cast("double"))
      .withColumn("rk", row_number().over(byRank))
      .filter(col("rk") <= k)
      .select(
        col("source"),
        col("rk").cast("long").as("rk"),
        col("tok"),
        col("n_st").cast("long").as("n_st"),
        col("pmi"))
  }

  /** Top-`k` skip-gram co-occurrence pairs within a ±`window` token
    * distance — the corpus statistic behind word-vector training
    * (word2vec/GloVe build exactly this table) and collocation mining.
    * Ordered pairs (left token, right token) with their distance-summed
    * count.
    *
    * Scale shape: pairs are generated ROW-LOCALLY inside one projection —
    * a nested `transform` over the token array emits (t[i], t[i+d]) for
    * d ∈ [1, window] — then one map-side-combined count. The textbook
    * formulation (posexplode + self-join on doc_id with a position-band
    * predicate) shuffles the exploded token table TWICE and re-buffers
    * every document's tokens through a join; this shape never shuffles
    * anything wider than the final (w1, w2, n) cells. The top-k cut is
    * TakeOrderedAndProject (per-partition top-k, k rows to the driver)
    * with a deterministic total order.
    */
  def skipgramPairs(documents: DataFrame, window: Int, k: Int): DataFrame = {
    val w = window
    documents
      .select(tokens(col("text")).as("ts"))
      .select(explode(expr(
        s"""flatten(transform(ts, (t, i) ->
           |  transform(slice(ts, i + 2, $w), u -> struct(t AS w1, u AS w2))))"""
          .stripMargin)).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy("w1", "w2")
      .agg(count(lit(1)).cast("long").as("n"))
      .orderBy(col("n").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** Substring search through an inverted character-trigram index — the
    * grep-over-the-corpus primitive (code search, contamination probes for
    * a literal string) without a full-text scan per query.
    *
    * Index side: distinct (doc_id, trigram) postings, generated row-locally
    * from each document (|text| rows per doc, built once and amortized over
    * queries in production; this operator composes build + one query so the
    * whole path is checkable). Query side: a document can contain `pattern`
    * only if it contains ALL of the pattern's distinct trigrams, so the
    * postings are semi-joined to the pattern's trigram set (a tiny literal
    * list, broadcast), counted per doc, and only docs matching every
    * trigram reach the verify stage — one exact `contains` over the
    * candidate documents, reached by an id-keyed semi-join, never a corpus
    * scan. False candidates (trigrams present but scattered) die there.
    *
    * At 100 TB the postings table is the thing you'd materialize (bucketed
    * by trigram); the per-query cost is then |postings(pattern grams)| +
    * |candidates|, independent of corpus size.
    */
  /** Exact consecutive-token phrase search over a word-positional inverted
    * index — the operator a character-trigram index cannot express
    * boundary-safely (its candidates still need a substring verify; this
    * matches on token positions directly). Postings are `(doc_id, pos,
    * tok)`; each query term filters the postings FIRST, so every exchange
    * carries O(term hits), never O(corpus tokens), then adjacency
    * equi-joins align `pos_i = pos_0 + i`. Returns `(doc_id, n_matches)`
    * for documents containing the phrase at least once.
    *
    * At 100 TB the postings table is the materialized piece (bucketed by
    * token); per-query cost is then Σ|postings(term_i)| — corpus-size-
    * independent, and the rarest term bounds the join's output.
    */
  def phraseSearch(documents: DataFrame, phrase: String): DataFrame = {
    val terms = phrase.trim.split("\\s+").toSeq
    require(terms.nonEmpty, "phrase must contain at least one token")
    val postings = documents
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
    def hits(t: String) = postings.filter(col("tok") === t)
    val aligned = terms.zipWithIndex.tail.foldLeft(
      hits(terms.head).select(col("doc_id"), col("pos"))) { case (acc, (t, i)) =>
      acc.join(
        hits(t).select(col("doc_id"), (col("pos") - i).as("pos")),
        Seq("doc_id", "pos"))
    }
    aligned.groupBy("doc_id").agg(count(lit(1)).cast("long").as("n_matches"))
  }

  def substringSearch(documents: DataFrame, pattern: String): DataFrame = {
    require(pattern.length >= 3, "pattern must be at least one trigram long")
    val qGrams = pattern.sliding(3).toSeq.distinct
    val postings = documents
      .select(
        col("doc_id"),
        // CASE guard, not greatest(len-2, 0): sequence(1, 0) is DESCENDING
        // [1, 0] in Spark, which would emit junk grams for sub-trigram docs.
        explode(expr(
          """CASE WHEN length(text) >= 3
            |     THEN transform(sequence(1, length(text) - 2), i -> substring(text, i, 3))
            |     ELSE CAST(array() AS ARRAY<STRING>) END""".stripMargin))
          .as("gram"))
      .distinct()
    val candidates = postings
      .filter(col("gram").isin(qGrams: _*))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hit"))
      .filter(col("n_hit") === qGrams.size)
      .select("doc_id")
    documents
      .join(candidates, Seq("doc_id"), "left_semi")
      .filter(col("text").contains(pattern))
      .select(col("doc_id"), col("source"), col("n_chars"))
  }

  /** KWIC (keyword-in-context) snippets for a literal search: the matching
    * documents with a fixed-width window around the FIRST occurrence —
    * the result-presentation step on top of [[substringSearch]]. Returns
    * `(doc_id, pos, snippet)` (pos 1-based, like both engines' `instr`).
    *
    * Plan shape: candidate doc ids come from the trigram index
    * (corpus-LIKE-scan-free, same contract as [[substringSearch]]); only
    * the verified hits' text rows feed the snippet projection, which is
    * row-local (`instr` + dynamic `substring` — identical 1-based,
    * clamped-start semantics in Spark and DuckDB; the window length is a
    * folded literal so a near-start match yields the same fixed-width
    * slice in both). */
  def searchSnippets(documents: DataFrame, pattern: String, ctx: Int = 30): DataFrame = {
    val hits = substringSearch(documents, pattern).select("doc_id")
    val win = 2 * ctx + pattern.length
    documents
      .join(hits, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("text"), instr(col("text"), pattern).cast("long").as("pos"))
      .select(
        col("doc_id"),
        col("pos"),
        expr(s"substring(text, CAST(greatest(1, pos - $ctx) AS INT), $win)").as("snippet"))
      .orderBy("doc_id")
  }

  /** Top-`k` BPE merge candidates — the first step of byte-pair-encoding
    * tokenizer training: over the word-frequency table, count every
    * adjacent symbol pair (character bigram) weighted by word frequency;
    * the argmax is the pair a BPE trainer would merge first.
    *
    * Scale shape: the corpus collapses to the DISTINCT word-frequency
    * table first (one map-side-combined shuffle, output bounded by
    * vocabulary, never corpus size — the Zipf head absorbs almost all
    * occurrences into a few thousand rows); bigrams expand row-locally
    * from each distinct word (a ≤ |word| multiply of a vocab-sized
    * table), and the weighted count is a second vocab-bounded aggregate.
    * A real BPE trainer iterates merge → re-segment; one round is the
    * distributed-side primitive (the merge loop is model-sized driver
    * work on the top table).
    */
  def bpeMergeCandidates(documents: DataFrame, k: Int): DataFrame = {
    val words = documents
      .select(explode(tokens(col("text"))).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).cast("long").as("wf"))
      .filter(length(col("word")) >= 2)
    words
      .select(
        col("wf"),
        explode(expr("transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))"))
          .as("pair"))
      .groupBy("pair")
      .agg(sum(col("wf")).cast("long").as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(k)
  }

  /** Sparse TF-IDF document-pair similarity — the SPARSE complement to the
    * dense embedding ANN family: top-`k` document pairs by TF-IDF-weighted
    * shared-term score, computed through the inverted term index (a join
    * keyed on token), never an all-pairs product.
    *
    * Cost bound: only terms with `2 ≤ df ≤ dfCap` generate pairs — a
    * stopword's posting is O(corpus) by definition and its idf ≈ 0, so the
    * cap drops exactly the terms that would explode the join while
    * contributing least; each surviving term fans out ≤ dfCap²/2 pairs.
    *
    * Numeric contract (cross-engine exact): per-posting weight is the
    * INTEGER-quantized linear-idf `wq = (tf · N · 10) div df` and the pair
    * score is `Σ wq_a·wq_b` summed as BIGINT — pure integer arithmetic,
    * bit-identical in any engine (headroom: wq ≤ 10·tf·N, products ≤
    * ~10¹⁴ at the test scales; a 10⁹-doc corpus needs the internal sum
    * widened to DECIMAL and re-quantized at the edge). Ties break
    * (a_id, b_id) ascending. Returns `(a_id, b_id, n_shared, dot)`. */
  def sparseTfidfPairs(documents: DataFrame, dfCap: Long, k: Int): DataFrame = {
    val tf = termFrequency(documents)
    val dfT = tf
      .groupBy("tok")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= dfCap && col("df") >= 2)
    val n = documents.agg(count(lit(1)).cast("long").as("n_docs"))
    val w = tf
      .join(dfT, "tok")
      .join(broadcast(n)) // 1 row
      .select(col("tok"), col("doc_id"), expr("(tf * n_docs * 10) div df").as("wq"))
      // Headroom guard, enforced in-plan rather than only documented: the
      // BIGINT pair sum Σ wq_a·wq_b stays exact while every wq ≤ 3e6
      // (products ≤ 9e12; even 10⁵ shared terms keep the sum < 10¹⁸).
      // Corpus growth that silently busts the quantization (n_docs ~1e5 ×
      // tf ~1e3 → wq ~1e9) must fail loudly, not wrap — re-quantize
      // (smaller scale factor, or DECIMAL pair sums) when this fires.
      .withColumn(
        "wq",
        when(col("wq") <= lit(3000000L), col("wq"))
          .otherwise(raise_error(concat(
            lit("sparseTfidfPairs: quantized weight exceeds int64 pair-sum headroom (wq="),
            col("wq").cast("string"),
            lit(", bound=3000000) — re-quantize for this corpus scale")))))
    val a = w.toDF("tok", "a_id", "a_w")
    val b = w.toDF("tok", "b_id", "b_w")
    a.join(b, Seq("tok"))
      .filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id")
      .agg(
        count(lit(1)).cast("long").as("n_shared"),
        sum(col("a_w") * col("b_w")).cast("long").as("dot"))
      .orderBy(col("dot").desc, col("a_id"), col("b_id"))
      .limit(k)
  }

  /** Full BPE tokenizer training, `rounds` greedy merges — the iterative
    * completion of [[bpeMergeCandidates]]. Per round: count every adjacent
    * symbol pair weighted by word frequency (a vocab-bounded map-side-
    * combined aggregate — the corpus collapsed to the distinct
    * word-frequency table ONCE, up front), pick the argmax pair (ties:
    * smallest left then right symbol — engine-replayable binary string
    * order), and re-segment every word by merging that pair's
    * non-overlapping occurrences left-to-right — a row-local fold over the
    * symbol array ("merge with the previous symbol when it is l and the
    * incoming one is r", the standard scan-left BPE merge), expressed as
    * the same sequential string-accumulator `aggregate`/`list_reduce`
    * lambda in Spark and the DuckDB oracle. The earlier
    * `replace(" l r ", " lr ")` spelling could not merge back-to-back
    * occurrences (adjacent matches share one delimiter space: 'aaaa' with
    * merge (a,a) yielded [aa,a,a] instead of canonical [aa,aa]), which
    * overstated symbol counts for repeated-symbol words. Stops early when
    * no pairs remain.
    *
    * Scale shape (the PageRank/LPA iterative contract): per-round state is
    * the vocab-sized segmentation table, re-localCheckpointed with
    * measured stats each round so lineage and driver plan state stay
    * O(1); only the 1-row argmax ever reaches the driver. Returns the
    * merge table `(round, l, r, merged, n)` — the trained tokenizer model,
    * model-sized by construction.
    */
  def bpeTrain(documents: DataFrame, rounds: Int): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    bpeCore(documents, rounds)._1.toDF("round", "l", "r", "merged", "n")
  }

  /** The trained segmentation itself: every distinct (multi-char) corpus
    * word with its symbol count AFTER the `rounds` greedy merges — the
    * vocab-sized lookup table [[bpeEncode]] joins against. */
  def bpeSegment(documents: DataFrame, rounds: Int): DataFrame =
    bpeCore(documents, rounds)._2
      .select(col("word"), size(split(trim(col("seg")), " ")).cast("long").as("n_sym"))

  /** Tokens-per-document under the trained BPE vocabulary — the "apply the
    * tokenizer" half of the training story (token-budget accounting for a
    * packed training corpus uses exactly this number). Per doc:
    * whitespace words joined against the vocab-sized [[bpeSegment]] table
    * (broadcast under AQE — the corpus never reshuffles), single-char
    * words (excluded from training by construction) count 1 symbol.
    * Returns `(doc_id, n_words, n_bpe_tokens)`, empty docs included with
    * zero counts. */
  def bpeEncode(documents: DataFrame, rounds: Int): DataFrame = {
    val segTable = bpeSegment(documents, rounds)
    val words = documents.select(col("doc_id"), explode(tokens(col("text"))).as("word"))
    val perDoc = words
      .join(segTable, Seq("word"), "left_outer")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).cast("long").as("n_words"),
        sum(coalesce(col("n_sym"), lit(1L))).cast("long").as("n_bpe_tokens"))
    documents
      .select("doc_id")
      .join(perDoc, Seq("doc_id"), "left_outer")
      .select(
        col("doc_id"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_bpe_tokens"), lit(0L)).as("n_bpe_tokens"))
  }

  /** Shared BPE driver loop: returns (merge table rows, final segmentation
    * frame `(word, wf, seg)`). See [[bpeTrain]] for the contract. */
  private def bpeCore(
      documents: DataFrame,
      rounds: Int): (Seq[(Int, String, String, String, Long)], DataFrame) = {
    import org.apache.spark.sql.graft.Bridge
    var seg = documents
      .select(explode(tokens(col("text"))).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).cast("long").as("wf"))
      .filter(length(col("word")) >= 2)
      // " a b c " — every symbol space-delimited with sentinel spaces at
      // both edges, so a merge pattern " l r " can only match at symbol
      // boundaries.
      .select(
        col("word"),
        col("wf"),
        concat(lit(" "), regexp_replace(col("word"), "(.)", "$1 ")).as("seg"))
      .transform(Bridge.localCheckpointFreshStats)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var round = 1
    var done = false
    while (round <= rounds && !done) {
      val top = seg
        .select(col("wf"), split(trim(col("seg")), " ").as("t"))
        .filter(size(col("t")) >= 2)
        .select(
          col("wf"),
          explode(expr(
            "transform(sequence(1, size(t) - 1), i -> struct(element_at(t, i) AS l, element_at(t, i + 1) AS r))"))
            .as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("wf").cast("long").as("n"))
        .orderBy(col("n").desc, col("l"), col("r"))
        .limit(1)
        .collect()
      if (top.isEmpty) done = true
      else {
        val (l, r, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((round, l, r, l + r, n))
        // Canonical scan-left merge as a sequential fold: the accumulator is
        // the rebuilt " t1 t2 ... " string (sentinel spaces preserved); an
        // incoming r merges with a trailing UNMERGED l — a just-merged "lr"
        // can never equal l, so overlap skipping is implicit. Bit-identical
        // to the oracle's list_reduce lambda.
        val lPat = " " + l + " "
        val next = seg
          .withColumn(
            "seg",
            aggregate(
              split(trim(col("seg")), " "),
              lit(" "),
              (acc, x) =>
                when(
                  x === lit(r) && acc.endsWith(lit(lPat)),
                  concat(
                    acc.substr(lit(1), length(acc) - lit(l.length + 1)),
                    lit(l + r + " ")))
                  .otherwise(concat(acc, x, lit(" ")))))
          .transform(Bridge.localCheckpointFreshStats)
        Bridge.freeLocalCheckpoint(seg) // superseded round state (PPR pattern)
        seg = next
        round += 1
      }
    }
    (merges.toSeq, seg)
  }
}
