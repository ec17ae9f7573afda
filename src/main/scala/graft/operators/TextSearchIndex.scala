package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** Persisted inverted text index — the fifth index family under the
  * [[IndexManifest]] lifecycle (build / append / appendStream /
  * delete(tombstone) / upsert(atomic replace) / compact / maybeCompact),
  * serving the BM25 lane the
  * way the ANN families serve the vector lane: the corpus is tokenized
  * ONCE into a postings table and every query scans only its own terms'
  * postings, instead of re-tokenizing the corpus per query the way the
  * in-memory [[TextIndex.bm25TopK]] does.
  *
  * Logical tables (physical dirs generation-suffixed by the manifest):
  *  - `stats`: one row `(n_docs, sum_dl)` — the length-normalization
  *    constants, FROZEN at build exactly like the ANN families' centroid
  *    models: appends score under the build-time normalization (drift in
  *    average document length degrades scores gracefully; rebuild when it
  *    warrants). Term rarity is NOT frozen — `df` is computed at query
  *    time from the live postings of just the query's terms, so appends
  *    and deletes move idf immediately and exactly.
  *  - `postings`: `(tok, doc_id, tf, dl, positions)` — one row per
  *    (document, term), document length denormalized so scoring never
  *    joins a lengths table, word positions stored so phrase queries
  *    serve from the index too. Written repartitioned + sorted by `tok`,
  *    so a
  *    `tok IN (query terms)` scan prunes at parquet row-group granularity
  *    (min/max stats) — the 100 TB shape: a query reads its terms'
  *    posting slices, never the corpus.
  *
  * Parity contract: on a freshly-built index, [[search]] reproduces
  * [[TextIndex.bm25TopK]] bit-for-bit — same tf/df/dl values, the same
  * linear-idf scoring expression tree, the same round-12 →
  * DECIMAL(30,12) → round-4 summation (spec-pinned). Deletes retract
  * immediately: a tombstoned document leaves both the hit list and the
  * df counts at the next query. */
object TextSearchIndex {

  private val layout = IndexManifest.Layouts.text

  /** Postings are RANGE-partitioned by term into this many buckets (an
    * EXPLICIT count: AQE would otherwise coalesce the range shuffle into
    * a few wide files whose min/max term stats prune nothing —
    * measured in TextIndexScaleBench). Range, not hash: a hash layout
    * scatters the term space so every file's [min,max] spans the whole
    * alphabet and a `tok IN` scan reads ALL row groups; range buckets
    * keep each file's term interval disjoint, so the scan's row-group
    * stats skip every bucket holding none of the query's terms. At
    * corpus scale, size this so buckets are multi-row-group files —
    * within-file `sortWithinPartitions` then prunes at row-group
    * granularity too. */
  private val TermBuckets = 32

  private def state(spark: SparkSession, dir: String): IndexManifest.State =
    IndexManifest.resolve(spark, dir, layout)

  /** The postings rows of a document batch: `(tok, doc_id, tf, dl,
    * positions)` — positions are the 0-based token offsets of `tok` in
    * the document, making the table WORD-POSITIONAL: phrase queries align
    * adjacent terms from the index without re-tokenizing the corpus.
    * Parquet is columnar, so BM25 scans that never touch `positions`
    * don't pay for it (ReadSchema plan-guarded).
    *
    * Computed ROW-LOCALLY (per-token counts via higher-order functions,
    * not a groupBy) so the same projection runs inside an append-mode
    * stream; exactly equal to the explode+count form because every
    * document arrives whole in one row. `tf` stays a stored count rather
    * than `size(positions)` at read: the scoring scan must not need the
    * wide column to know the count.
    *
    * This is the STREAM form only: the per-distinct-token position
    * filter costs O(len × distinct) per document, which is real CPU at
    * corpus scale — batch paths use [[postingsOfBatch]] (identical rows,
    * spec-pinned) and keep this one exclusively where append-mode
    * streaming forbids aggregation. */
  private def postingsOf(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("dl"),
        explode(array_distinct(col("toks"))).as("tok"),
        col("toks"))
      .select(
        col("tok"),
        col("doc_id"),
        size(filter(col("toks"), t => t === col("tok"))).cast("long").as("tf"),
        col("dl"),
        filter(
          sequence(lit(0), size(col("toks")) - 1),
          i => element_at(col("toks"), i + 1) === col("tok"))
          .cast("array<long>")
          .as("positions"))

  /** Batch form of [[postingsOf]]: posexplode + one (tok, doc_id)
    * aggregation instead of the per-distinct-token position filter —
    * O(tokens) work and one combine-friendly shuffle, vs O(len ×
    * distinct) row-local CPU. Rows are identical (positions ascending
    * via sort_array == the HOF form's index-order scan; tf a count;
    * dl denormalized before the explode): spec-pinned bit-equal. Every
    * batch mutation (build / append / upsert) uses this; only the
    * append-mode stream, which cannot aggregate, pays the HOF price. */
  private def postingsOfBatch(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("dl"),
        posexplode(col("toks")).as(Seq("pos", "tok")))
      .groupBy("tok", "doc_id")
      .agg(
        count(lit(1)).cast("long").as("tf"),
        first(col("dl")).as("dl"),
        sort_array(collect_list(col("pos").cast("long"))).as("positions"))
      .select("tok", "doc_id", "tf", "dl", "positions")

  /** Build the index: freeze the normalization stats, write the postings
    * sorted by term, commit the next manifest generation (prior deletes
    * vanish with it). */
  def build(documents: DataFrame, dir: String): Unit = {
    val spark = documents.sparkSession
    import spark.implicits._
    val next = layout.advance(IndexManifest.resolve(spark, dir, layout))
    // one aggregate action feeds BOTH the stats table and the trained-on
    // prop — the old spelling wrote the aggregate then re-read it with a
    // second job just to extract n_docs (guide §1.2: don't compute — or
    // scan — things twice; builds run inside every text lifecycle gate)
    val statsRow = documents
      .select(col("doc_id"), size(tokens(col("text"))).cast("long").as("dl"))
      .agg(
        count(lit(1)).cast("long").as("n_docs"),
        coalesce(sum(col("dl")), lit(0L)).as("sum_dl"))
      .head()
    val nDocs = statsRow.getLong(0)
    Seq((nDocs, statsRow.getLong(1)))
      .toDF("n_docs", "sum_dl")
      .coalesce(1)
      .write.mode("overwrite").parquet(next.tableDir(dir, "stats"))
    postingsOfBatch(documents)
      .repartitionByRange(TermBuckets, col("tok")).sortWithinPartitions("tok")
      .write.mode("overwrite").parquet(next.tableDir(dir, "postings"))
    IndexManifest.commit(
      spark, dir, next.withProp(RebuildTrigger.TrainedOnProp, nDocs.toString), layout)
  }

  /** Append a document batch — the corpus-GROWTH path: its postings land
    * in the live base (term rarity shifts immediately — df is live); the
    * frozen stats are untouched. Replacing or re-adding an EXISTING id
    * goes through [[upsert]]; an id covered by an earlier upsert's
    * generation-scoped tombstone refuses loudly here
    * ([[Tombstones.requireAppendable]] — its appended copy would land
    * below the scope and silently not serve). */
  def append(batch: DataFrame, dir: String): Unit = {
    val spark = batch.sparkSession
    val st = state(spark, dir)
    Tombstones.requireAppendable(
      batch.select("doc_id"), dir, "doc_id", st.tombstones,
      IndexManifest.segGen(st.tables("postings")))
    postingsOfBatch(batch)
      .repartitionByRange(TermBuckets, col("tok")).sortWithinPartitions("tok")
      .write.mode("append").parquet(st.tableDir(dir, "postings"))
  }

  /** Continuous ingest (the [[graft.operators.Dedup
    * .minhashIndexAppendStream]] contract on the text family): drain a
    * documents parquet dir into the postings-stream segment —
    * [[postingsOf]] is a pure projection, so the whole build runs inside
    * the stream; no state store, no corpus rescan. [[compact]] folds the
    * segment back. */
  def appendStream(
      spark: SparkSession,
      indexDir: String,
      arrivalsDir: String,
      checkpoint: String): Unit = {
    import org.apache.spark.sql.streaming.Trigger
    val raw = spark.readStream
      .schema("doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT")
      .parquet(arrivalsDir)
    val q = postingsOf(raw).writeStream
      .format("parquet")
      .option("path", state(spark, indexDir).streamDir(indexDir))
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Logical delete of documents: O(ids) tombstone append, UNSCOPED
    * (`ts_gen = MaxValue`) — it hides every copy of the id in every
    * segment, present AND future (later appends of the same id included),
    * until a compaction applies it physically or an [[upsert]] of that
    * very id replaces it (the upsert drops the id's pending tombstones —
    * the one sanctioned re-add path). A scoped delete here would open a
    * takedown-resurrection window: an unrelated later upsert bumps the
    * generation, and a subsequent plain append of the deleted id would
    * land above the tombstone's scope and silently serve again. The doc
    * leaves hit lists AND df counts at the next query. */
  def delete(ids: DataFrame, dir: String): Unit = {
    val st = state(ids.sparkSession, dir)
    Tombstones.delete(ids, dir, st.tombstones)
  }

  /** Atomic replace — the mutation a re-crawl pipeline needs: for every
    * `doc_id` in `batch`, the document's old postings stop serving and
    * its new postings start serving in ONE [[IndexManifest]] commit (a
    * reader sees entirely the old corpus or entirely the new one, never
    * a missing or doubled document — the window a delete-then-append
    * composition leaves open). Also the sanctioned way to re-add a
    * previously deleted id. New ids insert.
    *
    * Mechanics: the base stays untouched (carried); the batch ids are
    * tombstoned scoped to the CURRENT generation (kills base copies; the
    * replacement segment commits at generation+1, out of scope), and the
    * streamed segment is rewritten without the batch ids and with the
    * new postings. Cost: O(stream + batch) — the stream is the
    * compaction-bounded L0, so this is an LSM L0 rewrite, never a base
    * or corpus rewrite; the frozen stats are untouched (appends/upserts
    * score under build-time normalization until a rebuild). Pending
    * tombstones are applied physically to the carried stream rows (their
    * new segment would otherwise outrank the old scoped deletes) and
    * carried forward UNCHANGED except for the batch ids, whose prior
    * tombstones are dropped (their replacement commits above the scoped
    * kill written here; clamping every carried row instead would shrink
    * an unscoped delete's scope and let a later plain append of that
    * deleted id serve again — the resurrection window this used to have). */
  def upsert(batch: DataFrame, dir: String): Unit = {
    val spark = batch.sparkSession
    val prev = state(spark, dir)
    val statsPath = new org.apache.hadoop.fs.Path(prev.tableDir(dir, "stats"))
    require(
      statsPath.getFileSystem(spark.sessionState.newHadoopConf()).exists(statsPath),
      s"text index at $dir has no frozen stats — build before upserting " +
        "(scores are normalized under build-time stats)")
    val next = layout.advance(prev, carry = Set("stats", "postings"))
    val ids = batch.select(col("doc_id").cast("long").as("doc_id")).distinct()
    // next stream := (carried stream rows, pending deletes applied, batch
    // ids removed) ∪ the batch's new postings
    val carried = Tombstones.dropScoped(
      taggedStream(spark, dir, prev), dir, "doc_id", "seg_gen", prev.tombstones)
      .drop("seg_gen")
      .join(ids, Seq("doc_id"), "left_anti")
      .select(postingCols.map(col): _*)
    carried.unionByName(postingsOfBatch(batch).select(postingCols.map(col): _*))
      .repartitionByRange(TermBuckets, col("tok")).sortWithinPartitions("tok")
      .write.mode("overwrite").parquet(next.streamDir(dir))
    // next tombstones := carried pending rows minus the batch ids (scope
    // preserved — an unscoped delete keeps killing future appends) ∪ the
    // batch ids scoped to the current generation
    val pending = Tombstones.read(spark, dir, prev.tombstones)
      .map(_.join(ids.select(col("doc_id").as("ts_id")), Seq("ts_id"), "left_anti"))
    val killed = ids.select(
      col("doc_id").as("ts_id"), lit(prev.generation).as("ts_gen"))
    pending.fold(killed)(_ unionByName killed)
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/${next.tombstones}")
    IndexManifest.commit(spark, dir, next, layout)
  }

  private val postingCols = Seq("tok", "doc_id", "tf", "dl", "positions")

  /** Live postings — base ∪ streamed segment, each row tagged with its
    * segment's creation generation (`seg_gen`, the scope key for
    * generation-scoped tombstones); pending deletes NOT yet applied
    * (consumers [[pruneDeleted]] AFTER term pruning). Full width
    * including `positions`; scoring consumers project it away and the
    * columnar scan never reads it. */
  private def livePostings(spark: SparkSession, dir: String): DataFrame =
    postingsAt(spark, dir, state(spark, dir))

  /** The postings a given manifest state names — [[livePostings]] is this
    * at the live state; [[searchAsOf]] passes a pinned snapshot state
    * instead (same plan, older files). */
  private def postingsAt(
      spark: SparkSession,
      dir: String,
      st: IndexManifest.State): DataFrame =
    (taggedRead(spark, st.tableDir(dir, "postings"),
      IndexManifest.segGen(st.tables("postings"))) ++
      taggedRead(spark, st.streamDir(dir), IndexManifest.segGen(st.stream)))
      .reduceLeftOption(_ unionByName _)
      .getOrElse(emptyTagged(spark))

  private def emptyTagged(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("tok", StringType),
        StructField("doc_id", LongType),
        StructField("tf", LongType),
        StructField("dl", LongType),
        StructField("positions", ArrayType(LongType)),
        StructField("seg_gen", LongType, nullable = false))))
  }

  private def taggedRead(spark: SparkSession, p: String, gen: Long): Option[DataFrame] = {
    val path = new org.apache.hadoop.fs.Path(p)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(path)) None
    else
      try Some(spark.read.parquet(p)
        .select(postingCols.map(col) :+ lit(gen).as("seg_gen"): _*))
      catch { case _: org.apache.spark.sql.AnalysisException => None }
  }

  /** The streamed segment's rows tagged with its creation generation —
    * empty-schema'd when absent (upsert rewrites it unconditionally). */
  private def taggedStream(
      spark: SparkSession,
      dir: String,
      st: IndexManifest.State): DataFrame =
    taggedRead(spark, st.streamDir(dir), IndexManifest.segGen(st.stream))
      .getOrElse(emptyTagged(spark))

  /** Generation-scoped tombstone application + scope-tag cleanup — every
    * read-side consumer's pruning step. */
  private def pruneDeleted(
      rows: DataFrame,
      dir: String,
      st: IndexManifest.State): DataFrame =
    Tombstones.dropScoped(rows, dir, "doc_id", "seg_gen", st.tombstones)
      .drop("seg_gen")

  /** Major compaction: fold the streamed segment into the term-sorted
    * base and apply tombstones physically — one [[IndexManifest]] commit
    * swaps postings + stream + tombstones (stats carried). */
  def compact(spark: SparkSession, dir: String): Unit = {
    val prev = IndexManifest.resolve(spark, dir, layout)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val hasStream = fs.exists(new org.apache.hadoop.fs.Path(prev.streamDir(dir)))
    if (!hasStream && Tombstones.read(spark, dir, prev.tombstones).isEmpty) return
    val next = layout.advance(prev, carry = Set("stats"))
    pruneDeleted(livePostings(spark, dir), dir, prev)
      .select(postingCols.map(col): _*)
      .repartitionByRange(TermBuckets, col("tok")).sortWithinPartitions("tok")
      .write.mode("overwrite").parquet(next.tableDir(dir, "postings"))
    IndexManifest.commit(spark, dir, next, layout)
  }

  /** Frozen-stats staleness of the live index: `(n_docs_live,
    * avgdl_live)` vs the build-time `(trained_on, avgdl_frozen)` as two
    * relative drifts. One two-column (doc_id, dl) aggregate over the
    * live postings — a maintenance probe, not a query cost; at corpus
    * scale you'd run it at the compaction cadence. */
  def staleness(spark: SparkSession, dir: String): (Double, Double) = {
    val st = state(spark, dir)
    val statsRow = spark.read.parquet(st.tableDir(dir, "stats")).head()
    val (nFrozen, sumFrozen) = (statsRow.getLong(0), statsRow.getLong(1))
    val live = pruneDeleted(
      livePostings(spark, dir).select("doc_id", "dl", "seg_gen"), dir, st)
      .groupBy("doc_id").agg(max("dl").as("dl"))
      .agg(count(lit(1)).cast("long"), coalesce(sum("dl"), lit(0L)))
      .head()
    val (nLive, sumLive) = (live.getLong(0), live.getLong(1))
    val growth =
      if (nFrozen == 0L) { if (nLive > 0L) 1.0 else 0.0 }
      else math.abs(nLive - nFrozen).toDouble / nFrozen
    val avgFrozen = if (nFrozen == 0L) 0.0 else sumFrozen.toDouble / nFrozen
    val avgLive = if (nLive == 0L) 0.0 else sumLive.toDouble / nLive
    val drift =
      if (avgFrozen == 0.0) { if (avgLive > 0.0) 1.0 else 0.0 }
      else math.abs(avgLive - avgFrozen) / avgFrozen
    (growth, drift)
  }

  /** [[RebuildTrigger]] applied to the text family: retrain (re-freeze
    * the normalization stats over `documents`, the caller's CURRENT
    * corpus) when the live corpus has grown/shrunk past `growthRatio` of
    * the build set or average document length has drifted past
    * `driftRatio` — the two ways frozen BM25 stats miscalibrate. The
    * rebuild is [[build]]: one generation commit, pending tombstones
    * retired with it (the new corpus is the caller's truth). */
  def maybeRebuild(
      documents: DataFrame,
      dir: String,
      growthRatio: Double = 0.5,
      driftRatio: Double = 0.2): Boolean = {
    val spark = documents.sparkSession
    val (growth, drift) = staleness(spark, dir)
    val due = growth > growthRatio || drift > driftRatio
    if (due) build(documents, dir)
    due
  }

  /** [[CompactionTrigger]] applied to the text family. */
  def maybeCompact(
      spark: SparkSession,
      dir: String,
      ratio: Double = 0.01,
      streamRatio: Double = 0.25): Boolean = {
    val st = state(spark, dir)
    val due = CompactionTrigger.due(
      CompactionTrigger.rowsIn(spark, st.tableDir(dir, "postings")),
      CompactionTrigger.rowsIn(spark, st.streamDir(dir)),
      Tombstones.read(spark, dir, st.tombstones).fold(0L)(_.count()),
      ratio,
      streamRatio)
    if (due) compact(spark, dir)
    due
  }

  /** Multi-query BM25 over the persisted index — the serving-batch form
    * of [[search]]: `queries` is `(q_id, toks ARRAY<STRING>)`, one row
    * per query, and every query in the batch is answered by ONE pass
    * over the union of their posting slices. The batch's term vocabulary
    * (head-sized for a serving micro-batch) is collected so the postings
    * scan keeps the literal `tok IN` pushdown; per-term df and the
    * frozen stats are shared across queries (df is a per-term global —
    * the same value every query would compute alone), and the per-query
    * fan-out is a broadcast join on the hit rows, never on the corpus.
    * For a single query this reproduces [[search]] bit-for-bit
    * (spec-pinned): identical scoring tree, per-query rank window in
    * place of the global sort+limit. Returns
    * `(q_id, rk, doc_id, score, n_hit)`. */
  def searchTerms(spark: SparkSession, dir: String, queries: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.types._
    def empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("q_id", LongType),
        StructField("rk", LongType),
        StructField("doc_id", LongType),
        StructField("score", DoubleType),
        StructField("n_hit", LongType))))
    val st = state(spark, dir)
    val statsRow = spark.read.parquet(st.tableDir(dir, "stats")).head()
    val nDocs = statsRow.getLong(0)
    val sumDl = statsRow.getLong(1)
    if (nDocs == 0L) return empty
    val qt = queries
      .select(col("q_id").cast("long").as("q_id"), explode(col("toks")).as("tok"))
      .distinct()
    val terms = qt.select("tok").distinct().collect().map(_.getString(0)).toSeq
    if (terms.isEmpty) return empty
    val hits = pruneDeleted(
      livePostings(spark, dir).filter(col("tok").isin(terms: _*)), dir, st)
    val df = hits.groupBy("tok").agg(count(lit(1)).as("df"))
    hits
      .join(broadcast(df), "tok")
      .join(broadcast(qt), Seq("tok"))
      .withColumn(
        "sc",
        ((lit(nDocs).cast("double") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          (col("tf").cast("double") * lit(2.2) /
            (col("tf") + lit(0.3) +
              lit(0.9) * (col("dl") / (lit(sumDl).cast("double") / lit(nDocs))))))
      .groupBy("q_id", "doc_id")
      .agg(
        count(lit(1)).cast("long").as("n_hit"),
        round(sum(round(col("sc"), 12).cast("decimal(30,12)")).cast("double"), 4)
          .as("score"))
      .withColumn(
        "rk",
        row_number()
          .over(Window.partitionBy("q_id").orderBy(col("score").desc, col("doc_id")))
          .cast("long"))
      .filter(col("rk") <= k)
      .select("q_id", "rk", "doc_id", "score", "n_hit")
  }

  /** Exact consecutive-token phrase search served from the persisted
    * positional postings — the materialized form of
    * [[TextIndex.phraseSearch]]'s own 100 TB prescription ("the postings
    * table is the thing you'd materialize"): per-query cost is
    * Σ|postings(term_i)|, corpus-size-independent. Each term's posting
    * slice (pushed `tok =` filter over the term-sorted table) explodes
    * its stored positions and adjacency equi-joins align
    * `pos_i = pos_0 + i`; tombstones anti-joined after the term pruning.
    * Same `(doc_id, n_matches)` contract as the in-memory operator. */
  def phraseSearch(spark: SparkSession, dir: String, phrase: String): DataFrame = {
    val terms = phrase.trim.split("\\s+").toSeq
    require(terms.nonEmpty, "phrase must contain at least one token")
    val st = state(spark, dir)
    val live = livePostings(spark, dir)
    def hits(t: String) = pruneDeleted(live.filter(col("tok") === t), dir, st)
      .select(col("doc_id"), explode(col("positions")).as("pos"))
    val aligned = terms.zipWithIndex.tail.foldLeft(hits(terms.head)) {
      case (acc, (t, i)) =>
        acc.join(
          hits(t).select(col("doc_id"), (col("pos") - i).as("pos")),
          Seq("doc_id", "pos"))
    }
    aligned.groupBy("doc_id").agg(count(lit(1)).cast("long").as("n_matches"))
  }

  /** BM25 top-k against the persisted index: the query terms' posting
    * slices are the ONLY rows scanned (pushed `tok IN` filter over the
    * term-sorted table; tombstones anti-joined AFTER that pruning), df
    * aggregates over those slices, and the frozen stats ride as two
    * literals. Identical scoring expression tree and summation contract
    * as [[TextIndex.bm25TopK]] — a freshly-built index reproduces it
    * bit-for-bit. */
  def search(spark: SparkSession, dir: String, terms: Seq[String], k: Int): DataFrame =
    searchState(spark, dir, state(spark, dir), terms, k)

  /** [[search]] pinned to a RETAINED manifest generation
    * ([[IndexManifest.readAt]]) — the time-travel read: reproduce the
    * ranking a past generation served (its frozen stats, its postings,
    * its pending tombstones) after a rebuild or compaction moved the
    * live index on. Fails loudly when the generation has left the
    * retention window: a snapshot query must never silently answer from
    * a different state. Later plain deletes reach retained snapshots
    * (the takedown carve-out documented on
    * [[graft.operators.Dedup.minhashIndexCandidatesAsOf]]). */
  def searchAsOf(
      spark: SparkSession,
      dir: String,
      terms: Seq[String],
      k: Int,
      generation: Long): DataFrame = {
    val st = IndexManifest.readAt(spark, dir, generation).getOrElse(
      sys.error(
        s"text index at $dir retains no generation-$generation manifest " +
          s"(snapshots: ${IndexManifest.snapshots(spark, dir).mkString(",")})"))
    searchState(spark, dir, st, terms, k)
  }

  private def searchState(
      spark: SparkSession,
      dir: String,
      st: IndexManifest.State,
      terms: Seq[String],
      k: Int): DataFrame = {
    import org.apache.spark.sql.types._
    val statsRow = spark.read.parquet(st.tableDir(dir, "stats")).head()
    val nDocs = statsRow.getLong(0)
    val sumDl = statsRow.getLong(1)
    // an empty-corpus index has no normalization constants to score
    // under (avgdl is 0/0) — and no possible hits
    if (nDocs == 0L)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(
          StructField("rk", LongType),
          StructField("doc_id", LongType),
          StructField("score", DoubleType),
          StructField("n_hit", LongType))))
    val hits = pruneDeleted(
      postingsAt(spark, dir, st).filter(col("tok").isin(terms: _*)), dir, st)
    val df = hits.groupBy("tok").agg(count(lit(1)).as("df"))
    hits
      .join(broadcast(df), "tok")
      .withColumn(
        "sc",
        ((lit(nDocs).cast("double") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          (col("tf").cast("double") * lit(2.2) /
            (col("tf") + lit(0.3) +
              lit(0.9) * (col("dl") / (lit(sumDl).cast("double") / lit(nDocs))))))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).cast("long").as("n_hit"),
        round(sum(round(col("sc"), 12).cast("decimal(30,12)")).cast("double"), 4)
          .as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
      .withColumn(
        "rk",
        row_number()
          .over(Window.orderBy(col("score").desc, col("doc_id")))
          .cast("long"))
      .select("rk", "doc_id", "score", "n_hit")
  }
}
